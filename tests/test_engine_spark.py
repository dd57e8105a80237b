"""Spark-level end-to-end tests: encode -> decode bit-identical on the
driver-provided tables (TESTDATA.md), plus lineage/resume and skew
layout checks. Mirrors the reference's harness-level round-trip
asserts (main.rs:102,136,239) at DataFrame granularity."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from chimp_spark import engine

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    s = engine.get_spark(cpus=4, app="chimp_spark_tests", chunk_rows=4096)
    yield s
    s.stop()


def _bit_identical_double(spark, df, encoded, column):
    dec = engine.decode_column(encoded, column, "double")
    orig = df.select(F.col(column).cast("long").alias("k")).groupBy().count()
    a = df.select(column).selectExpr(f"count(*) c", f"count({column}) cv")
    b = dec.select("value").selectExpr("count(*) c", "count(value) cv")
    assert a.collect() == b.collect()
    # multiset equality on bit patterns (exceptAll both ways)
    lhs = df.select(F.expr(f"cast({column} as double)").alias("v"))
    rhs = dec.select(F.col("value").alias("v"))
    assert lhs.exceptAll(rhs).isEmpty()
    assert rhs.exceptAll(lhs).isEmpty()


def test_encode_decode_lineitem_extendedprice(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    encoded = engine.encode_dataframe(
        df, ["l_extendedprice"], codec="chimp", chunk_rows=4096, table_name="lineitem"
    ).cache()
    assert encoded.filter(F.col("codec") != "chimp").count() == 0
    _bit_identical_double(spark, df, encoded, "l_extendedprice")
    encoded.unpersist()


def test_encode_decode_auto_multi_column(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"]
    encoded = engine.encode_dataframe(df, cols, codec="auto", chunk_rows=4096,
                                      table_name="lineitem").cache()
    # every column present, chunk accounting consistent
    per_col = {r["column"]: r for r in engine.compression_summary(encoded).collect()}
    assert set(per_col) == set(cols)
    n = df.count()
    for c in cols:
        assert per_col[c]["values"] == n, c

    dec = engine.decode_table(encoded, cols, (
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_returnflag string, l_shipdate timestamp"
    ))
    lhs = df.select(*cols)
    rhs = dec.select(*cols)
    assert lhs.exceptAll(rhs).isEmpty()
    assert rhs.exceptAll(lhs).isEmpty()
    encoded.unpersist()


def test_decode_column_positions_align(spark):
    """Two decoded columns of one run align on (part_id, row_id)."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    encoded = engine.encode_dataframe(
        df, ["o_orderkey", "o_totalprice"], chunk_rows=2048, table_name="orders"
    ).cache()
    k = engine.decode_column(encoded, "o_orderkey", "long").withColumnRenamed("value", "k")
    v = engine.decode_column(encoded, "o_totalprice", "double").withColumnRenamed("value", "v")
    joined = k.join(v, ["part_id", "row_id"])
    lhs = df.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v"))
    assert joined.select("k", "v").exceptAll(lhs).isEmpty()
    assert lhs.exceptAll(joined.select("k", "v")).isEmpty()
    encoded.unpersist()


def test_nulls_and_text_documents(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cols = ["doc_id", "text", "lang", "n_chars"]
    encoded = engine.encode_dataframe(df, cols, chunk_rows=2048, table_name="documents")
    dec = engine.decode_table(encoded, cols, "doc_id long, text string, lang string, n_chars long")
    # byte-identical text per doc_id (the per-url invariant of the
    # north rule, keyed by this table's key)
    j = dec.alias("d").join(df.alias("o"), "doc_id")
    bad = j.filter(
        (F.col("d.text") != F.col("o.text"))
        | (F.col("d.lang") != F.col("o.lang"))
        | (F.col("d.n_chars") != F.col("o.n_chars"))
    )
    assert bad.isEmpty()
    assert dec.count() == df.count()


def test_skew_layout_salted_range(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hot = engine.detect_hot_keys(df, "lang", threshold=0.2)
    laid = engine.repartition_salted(df, "lang", 8, hot_keys=hot, salt_buckets=4)
    # hot key spread over >1 partition, no data lost
    assert laid.count() == df.count()
    if hot:
        parts = (
            laid.withColumn("pid", F.spark_partition_id())
            .filter(F.col("lang") == hot[0])
            .select("pid").distinct().count()
        )
        assert parts > 1


def test_manifest_commit_read_resume(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/nation.parquet").repartition(4)
    root = str(tmp_path / "enc_nation")
    stats = engine.encode_and_commit(
        spark, df, root, "nation", chunk_rows=1024, resume=True
    )
    assert stats["partitions"] >= 1
    t = engine.EncodedTable(root)
    v1 = t.current_version()
    assert v1 == 1
    enc = t.read(spark)
    dec = engine.decode_table(enc, ["n_nationkey", "n_name"], "n_nationkey long, n_name string")
    lhs = df.select("n_nationkey", "n_name")
    assert lhs.exceptAll(dec.select("n_nationkey", "n_name")).isEmpty()

    # resume: second run encodes nothing new
    stats2 = engine.encode_and_commit(spark, df, root, "nation", chunk_rows=1024)
    assert stats2.get("resumed") or stats2["partitions"] == 0
    assert engine.EncodedTable(root).current_version() == v1


def test_compression_beats_raw_on_real_columns(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    encoded = engine.encode_dataframe(
        df, ["event_id", "ts", "event_type"], chunk_rows=4096, table_name="events"
    )
    rows = engine.compression_summary(encoded).collect()
    by_col = {r["column"]: r for r in rows}
    assert by_col["event_id"]["ratio"] > 3  # sorted ids -> delta
    assert by_col["ts"]["ratio"] > 1.5  # jittery timestamps -> delta_bp
    assert by_col["event_type"]["ratio"] > 3  # low-card dict


def test_checksum_verification(spark):
    df = spark.read.parquet(f"{SF_DIR}/part.parquet")
    enc = engine.encode_dataframe(
        df, ["p_partkey", "p_name"], chunk_rows=512, table_name="part"
    ).cache()
    ok = engine.decode_table(
        enc, ["p_partkey", "p_name"], "p_partkey long, p_name string",
        verify_checksums=True,
    )
    assert ok.count() == df.count()
    # corrupt one checksum -> decode must fail loudly
    bad = enc.withColumn(
        "checksum", F.when(F.col("chunk_id") == 0, F.col("checksum") + 1).otherwise(F.col("checksum"))
    )
    broken = engine.decode_table(
        bad, ["p_partkey", "p_name"], "p_partkey long, p_name string",
        verify_checksums=True,
    )
    with pytest.raises(Exception, match="checksum mismatch"):
        broken.count()
    enc.unpersist()


def test_csv_source_roundtrip(spark, tmp_path):
    """SURVEY §2.6: the reference ingests CSV float columns
    (main.rs:62-72); the engine composes with spark.read.csv the same
    as any scan."""
    src = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id", "value")
    csv_dir = str(tmp_path / "events_csv")
    src.write.mode("overwrite").option("header", True).csv(csv_dir)
    df = spark.read.option("header", True).schema("event_id long, value double").csv(csv_dir)
    enc = engine.encode_dataframe(df, ["value"], codec="chimp", chunk_rows=2048,
                                  table_name="events_csv")
    dec = engine.decode_column(enc, "value", "double")
    lhs = df.select(F.col("value").alias("v"))
    rhs = dec.select(F.col("value").alias("v"))
    assert lhs.exceptAll(rhs).isEmpty() and rhs.exceptAll(lhs).isEmpty()


def test_resume_after_partial_failure(spark, tmp_path):
    """Crash-resume: a first run commits only some partitions (simulated
    by filtering); the rerun encodes exactly the remainder and the
    union decodes to the full table."""
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet").repartition(6).cache()
    df.count()
    root = str(tmp_path / "enc_cust")

    work = df.withColumn("__part_id", F.spark_partition_id())
    partial = work.filter(F.col("__part_id") < 3).drop("__part_id")
    enc = engine.encode_dataframe(partial, ["c_custkey", "c_name"], chunk_rows=512,
                                  table_name="customer")
    t = engine.EncodedTable(root)
    # stamp layout_parts exactly as a crashed encode_and_commit would
    # have (resume now REFUSES unstamped df entries — see
    # test_df_resume_refuses_pre_layout_parts_entries)
    t.commit(spark, enc, "customer", mode="df", layout_parts=6)
    assert t.completed_part_ids("customer", mode="df") == {0, 1, 2}

    stats = engine.encode_and_commit(
        spark, df, root, "customer", columns=["c_custkey", "c_name"],
        chunk_rows=512, resume=True,
    )
    assert stats["partitions"] == 3  # only the missing partitions ran

    enc_all = engine.EncodedTable(root).read(spark)
    dec = engine.decode_table(enc_all, ["c_custkey", "c_name"],
                              "c_custkey long, c_name string")
    lhs = df.select("c_custkey", "c_name")
    assert lhs.exceptAll(dec.select("c_custkey", "c_name")).isEmpty()
    assert dec.count() == df.count()


def test_batch_resume_ignores_streaming_epochs(spark, tmp_path):
    """Streaming commits restart part_id at 0 every micro-batch; batch
    resume must NOT treat those ids as completed source partitions
    (data loss on mixed streaming+batch tables)."""
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet").repartition(4).cache()
    df.count()
    root = str(tmp_path / "enc_mixed")
    t = engine.EncodedTable(root)

    # a streaming micro-batch commit covering part_ids 0..3 (epoch 0)
    enc_stream = engine.encode_dataframe(
        df, ["c_custkey"], chunk_rows=512, table_name="customer"
    )
    t.commit(spark, enc_stream, "customer", epoch=0)
    assert t.completed_part_ids("customer") == set()  # epoch rows excluded
    assert t.committed_epochs("customer") == {0}

    # batch encode with resume=True must still encode ALL 4 partitions
    stats = engine.encode_and_commit(
        spark, df, root, "customer", columns=["c_custkey"],
        chunk_rows=512, resume=True,
    )
    assert stats["partitions"] == 4


def test_zone_map_pruning(spark):
    """Range-partitioned encode -> decode_column(value_range=...) must
    skip non-overlapping chunks (zone maps) and return exact results."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    laid = df.repartitionByRange(8, F.col("l_extendedprice"))
    enc = engine.encode_dataframe(laid, ["l_extendedprice"], chunk_rows=512,
                                  table_name="li").cache()
    lo, hi = 5_000.0, 10_000.0
    pruned = enc.filter(
        F.col("stat_min").isNull()
        | ((F.col("stat_max") >= lo) & (F.col("stat_min") <= hi))
    ).count()
    total = enc.count()
    assert pruned < total / 2, f"zone maps should prune: {pruned}/{total}"

    dec = engine.decode_column(enc, "l_extendedprice", "double",
                               value_range=(lo, hi))
    got = dec.filter((F.col("value") >= lo) & (F.col("value") <= hi))
    expect = df.filter((F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") <= hi))
    assert got.count() == expect.count()
    lhs = expect.select(F.col("l_extendedprice").alias("v"))
    rhs = got.select(F.col("value").alias("v"))
    assert lhs.exceptAll(rhs).isEmpty() and rhs.exceptAll(lhs).isEmpty()
    enc.unpersist()


def test_encode_parquet_multifile_dir(spark, tmp_path):
    """Scan path over a directory of parquet files (the crawl-dump
    shape: many files x row groups = work units)."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    src = str(tmp_path / "many")
    df.repartition(5).write.mode("overwrite").parquet(src)
    enc = engine.encode_parquet(spark, src, table_name="orders", chunk_rows=1024)
    assert enc.select("part_id").distinct().count() == 5  # one unit per file
    dec = engine.decode_table(enc, ["o_orderkey", "o_totalprice"],
                              "o_orderkey long, o_totalprice double")
    lhs = df.select("o_orderkey", "o_totalprice")
    assert lhs.exceptAll(dec.select("o_orderkey", "o_totalprice")).isEmpty()
    assert dec.count() == df.count()


def test_encode_parquet_scan_resume(spark, tmp_path):
    """Scan-path resume: commit a subset of work units, then rerun with
    skip_part_ids — only the remaining units encode, and the union
    decodes to the full table."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    src = str(tmp_path / "many")
    df.repartition(4).write.mode("overwrite").parquet(src)
    root = str(tmp_path / "enc")
    t = engine.EncodedTable(root)

    part1 = engine.encode_parquet(spark, src, columns=["o_orderkey"],
                                  table_name="orders").filter(F.col("part_id") < 2)
    t.commit(spark, part1, "orders", mode="scan")
    done = t.completed_part_ids("orders", mode="scan")
    assert done == {0, 1}
    # the other namespace must see nothing (a DataFrame-path resume
    # against these scan unit ids would skip unrelated partitions)
    assert t.completed_part_ids("orders", mode="df") == set()

    part2 = engine.encode_parquet(spark, src, columns=["o_orderkey"],
                                  table_name="orders", skip_part_ids=done)
    assert set(r["part_id"] for r in part2.select("part_id").distinct().collect()) == {2, 3}
    t.commit(spark, part2, "orders", mode="scan")

    enc_all = t.read(spark)
    dec = engine.decode_column(enc_all, "o_orderkey", "long")
    assert dec.count() == df.count()
    lhs = df.select(F.col("o_orderkey").alias("value"))
    assert lhs.exceptAll(dec.select("value")).isEmpty()


def test_string_zone_map_pruning(spark):
    """Range-partition documents by source (string key) -> encode ->
    key_range decode must skip non-overlapping chunks and return
    exactly the matching rows (parquet row-group skipping, but on the
    ENCODED table's string zone maps)."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    laid = df.repartitionByRange(4, F.col("source")).sortWithinPartitions("source")
    enc = engine.encode_dataframe(laid, ["source"], chunk_rows=128,
                                  table_name="docs").cache()
    # 'src0'..'src12' selects a real subset lexicographically
    # (src0, src1, src10..src12) — chunks must BOTH survive and prune
    lo, hi = "src0", "src12"
    pruned = enc.filter(
        (F.col("stat_max_bin").isNull() | (F.col("stat_max_bin") >= F.lit(lo.encode())))
        & (F.col("stat_min_bin").isNull() | (F.col("stat_min_bin") <= F.lit(hi.encode())))
    )
    assert 0 < pruned.count() < enc.count(), "pruning must keep some and drop some"
    dec = engine.decode_column(enc, "source", "string", key_range=(lo, hi))
    got = dec.filter((F.col("value") >= lo) & (F.col("value") <= hi)).select(
        F.col("value").alias("v"))
    want = df.filter((F.col("source") >= lo) & (F.col("source") <= hi)).select(
        F.col("source").alias("v"))
    assert got.count() == want.count()
    assert want.exceptAll(got).isEmpty() and got.exceptAll(want).isEmpty()
    enc.unpersist()


def test_string_bounds_conservative():
    """Truncate-and-increment upper bounds stay conservative for long
    and all-0xFF keys."""
    import pyarrow as pa

    from chimp_spark.framing import _string_bounds

    arr = pa.array(["b" * 40, "a", "c" * 40])
    lo, hi = _string_bounds(arr)
    assert lo == b"a"
    assert hi is not None and hi >= ("c" * 40).encode()[:16]  # bound holds
    assert hi > ("c" * 40).encode()  # strictly above every member

    ff = pa.array([b"\xff" * 32, b"a"], type=pa.binary())
    lo, hi = _string_bounds(ff)
    assert lo == b"a" and hi is None  # unbounded, conservative


def test_verify_table_audit(spark, tmp_path):
    """verify_table: all-zero on a lossless table; catches injected
    value corruption; filters by table name on multi-table roots."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    enc = engine.encode_dataframe(
        df, ["o_orderkey", "o_totalprice"], chunk_rows=1024, table_name="orders"
    ).cache()
    res = engine.verify_table(df, enc, ["o_orderkey", "o_totalprice"],
                              "o_orderkey long, o_totalprice double")
    assert res == {"rows": df.count(), "missing": 0, "extra": 0}

    # corrupt the SOURCE side: audit must report mismatches
    bad_src = df.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == df.first()["o_orderkey"],
               F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")),
    )
    res2 = engine.verify_table(bad_src, enc, ["o_orderkey", "o_totalprice"],
                               "o_orderkey long, o_totalprice double")
    assert res2["missing"] > 0 and res2["extra"] > 0

    # multi-table root: the table filter keeps the audit scoped
    other = engine.encode_dataframe(
        spark.read.parquet(f"{SF_DIR}/nation.parquet").selectExpr(
            "n_nationkey as o_orderkey", "cast(n_regionkey as double) as o_totalprice"
        ),
        ["o_orderkey", "o_totalprice"], chunk_rows=1024, table_name="nation_alias",
    )
    both = enc.unionAll(other)
    res3 = engine.verify_table(df, both, ["o_orderkey", "o_totalprice"],
                               "o_orderkey long, o_totalprice double", table="orders")
    assert res3 == {"rows": df.count(), "missing": 0, "extra": 0}
    enc.unpersist()


def test_legacy_modeless_entries_never_satisfy_mode_queries(spark, tmp_path):
    """Entries committed before part-id namespaces existed (no mode)
    must count for NO mode-specific resume query: a scan resume that
    trusted a legacy DataFrame partition id would silently skip a
    never-encoded row group (advisor-found data-loss direction). The
    consequence — mixed legacy tables re-encode — is the documented
    lesser failure."""
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet").repartition(2)
    enc = engine.encode_dataframe(df, ["c_custkey"], chunk_rows=512,
                                  table_name="customer")
    t = engine.EncodedTable(str(tmp_path / "legacy"))
    t.commit(spark, enc, "customer", mode=None)  # legacy: no namespace
    assert t.completed_part_ids("customer", mode="df") == set()
    assert t.completed_part_ids("customer", mode="scan") == set()
    assert t.completed_part_ids("customer") == {0, 1}  # unfiltered view


def test_scan_resume_refuses_changed_file_set(spark, tmp_path):
    """Scan unit ids are positional over (sorted files, row-group
    counts); resume must refuse when the input file set changed since
    the committed entries (advisor-found silent skip/duplication)."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    src = str(tmp_path / "many")
    df.repartition(3).write.mode("overwrite").parquet(src)
    paths = engine.resolve_paths(src)
    units = engine.parquet_work_units(paths)
    fp = engine.units_fingerprint(units)

    root = str(tmp_path / "enc")
    t = engine.EncodedTable(root)
    part1 = engine.encode_parquet(spark, src, columns=["o_orderkey"],
                                  table_name="orders",
                                  units=units).filter(F.col("part_id") < 1)
    t.commit(spark, part1, "orders", mode="scan", fingerprint=fp)
    assert t.completed_scan_units("orders", fp) == {0}

    # same table, new crawl file added -> different fingerprint -> refuse
    df.limit(100).write.mode("append").parquet(src)
    units2 = engine.parquet_work_units(engine.resolve_paths(src))
    fp2 = engine.units_fingerprint(units2)
    assert fp2 != fp
    with pytest.raises(ValueError, match="scan resume refused"):
        t.completed_scan_units("orders", fp2)

    # entries missing a fingerprint (pre-upgrade scan commits) refuse too
    t2 = engine.EncodedTable(str(tmp_path / "enc2"))
    t2.commit(spark, part1, "orders", mode="scan")  # no fingerprint
    with pytest.raises(ValueError, match="scan resume refused"):
        t2.completed_scan_units("orders", fp)


def test_decode_to_parquet_sink_bit_identical(spark, tmp_path):
    """The task-side parquet sink must produce BYTE-identical data to
    decode_table (same rows, same value bits, same alignment ids) —
    it's the same kernel behind a different emitter. Also pins the
    commit protocol: manifest row counts match, staging dir swept,
    overwrite semantics, and checksum verification flows through."""
    import json

    import pyarrow.parquet as pq

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_orderkey", "l_extendedprice", "l_returnflag", "l_shipdate"]
    ddl = ("l_orderkey long, l_extendedprice double, "
           "l_returnflag string, l_shipdate timestamp")
    enc = engine.encode_dataframe(df, cols, codec="auto", chunk_rows=4096,
                                  table_name="lineitem").cache()
    out = str(tmp_path / "decoded")
    res = engine.decode_to_parquet(enc, cols, ddl, out, verify_checksums=True,
                                   row_group_rows=8192)
    n = df.count()
    assert res["rows"] == n and res["files"] >= 1

    man = json.load(open(os.path.join(out, "_decode_manifest.json")))
    assert man["rows"] == n
    assert sum(f["rows"] for f in man["files"]) == n
    assert not os.path.exists(os.path.join(out, "_staged"))

    written = spark.read.parquet(out)
    ref = engine.decode_table(enc, cols, ddl)
    # float bits: compare doubles through a string cast (Spark would
    # otherwise normalize -0.0/NaN)
    def canon(d):
        return d.select(
            "part_id", "row_id", "l_orderkey",
            F.col("l_extendedprice").cast("string").alias("p"),
            "l_returnflag", "l_shipdate",
        )
    assert canon(written).exceptAll(canon(ref)).isEmpty()
    assert canon(ref).exceptAll(canon(written)).isEmpty()

    # parquet metadata: row groups respect the requested bound
    f0 = pq.ParquetFile(os.path.join(out, man["files"][0]["file"]))
    assert f0.metadata.num_rows > 0

    # refuse to clobber silently; overwrite mode replaces
    with pytest.raises(FileExistsError):
        engine.decode_to_parquet(enc, cols, ddl, out)
    res2 = engine.decode_to_parquet(enc, ["l_orderkey"], "l_orderkey long", out,
                                    mode="overwrite", with_row_ids=False)
    assert res2["rows"] == n
    w2 = spark.read.parquet(out)
    assert w2.columns == ["l_orderkey"]
    assert w2.count() == n
    enc.unpersist()


def test_decode_table_to_parquet_no_shuffle_sink(spark, tmp_path):
    """The file-unit sink (committed EncodedTable -> decoded parquet,
    zero shuffle) must be bit-identical to decode_table over the same
    commit, across a multi-commit (resume-shaped) table history."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_orderkey", "l_extendedprice", "l_shipdate"]
    ddl = "l_orderkey long, l_extendedprice double, l_shipdate timestamp"
    root = str(tmp_path / "enc_table")
    t = engine.EncodedTable(root)
    # two commits (like a resumed job): decode must cover both
    half1 = df.filter(F.col("l_orderkey") % 2 == 0)
    half2 = df.filter(F.col("l_orderkey") % 2 == 1)
    for part in (half1, half2):
        enc = engine.encode_dataframe(part, cols, codec="auto", chunk_rows=4096,
                                      table_name="lineitem")
        t.commit(spark, enc, "lineitem", mode="df")

    out = str(tmp_path / "decoded_nsh")
    res = engine.decode_table_to_parquet(spark, root, cols, ddl, out,
                                         table="lineitem", verify_checksums=True)
    n = df.count()
    assert res["rows"] == n

    written = spark.read.parquet(out)
    ref = engine.decode_table(t.read(spark), cols, ddl)

    def canon(d):
        return d.select(
            "l_orderkey",
            F.col("l_extendedprice").cast("string").alias("p"),
            "l_shipdate",
        )
    assert canon(written).exceptAll(canon(ref)).isEmpty()
    assert canon(ref).exceptAll(canon(written)).isEmpty()
    # and against the source itself
    src = df.select("l_orderkey", F.col("l_extendedprice").cast("string").alias("p"),
                    "l_shipdate")
    assert canon(written).exceptAll(src).isEmpty()
    assert src.exceptAll(canon(written)).isEmpty()


def test_decode_to_parquet_colocated_fast_path(spark, tmp_path):
    """colocated=True skips the co-location shuffle for encode-direct
    DataFrames (frames of a chunk are emitted contiguously by the
    encode kernel): output must be bit-identical to the shuffled path,
    and a NON-colocated input must fail loudly, never write wrong data."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cols = ["l_orderkey", "l_extendedprice", "l_returnflag"]
    ddl = "l_orderkey long, l_extendedprice double, l_returnflag string"
    enc = engine.encode_dataframe(df, cols, codec="auto", chunk_rows=4096,
                                  table_name="lineitem").cache()
    out_a = str(tmp_path / "shuffled")
    out_b = str(tmp_path / "coloc")
    engine.decode_to_parquet(enc, cols, ddl, out_a, verify_checksums=True)
    res = engine.decode_to_parquet(enc, cols, ddl, out_b, verify_checksums=True,
                                   colocated=True)
    assert res["rows"] == df.count()

    def canon(d):
        return d.select(
            "part_id", "row_id", "l_orderkey",
            F.col("l_extendedprice").cast("string").alias("p"), "l_returnflag",
        )
    a = spark.read.parquet(out_a)
    b = spark.read.parquet(out_b)
    assert canon(a).exceptAll(canon(b)).isEmpty()
    assert canon(b).exceptAll(canon(a)).isEmpty()

    # a repartitioned (genuinely non-colocated) frame layout must raise
    scrambled = enc.repartition(7)
    with pytest.raises(Exception, match="lacks columns|needs all columns"):
        engine.decode_to_parquet(scrambled, cols, ddl, str(tmp_path / "bad"),
                                 colocated=True)
    enc.unpersist()


def test_predicate_pruned_decode_export(spark, tmp_path):
    """decode_table_to_parquet(predicate=...) must (1) produce output
    bit-identical to decode-everything-then-filter, (2) actually SKIP
    pruned chunks' payload bytes (audited against an independent
    zone-map computation over the committed metadata), and (3) stay
    exact on a hostile layout where nothing can be pruned."""
    from chimp_spark.engine import sink as S

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cols = ["doc_id", "lang", "text"]
    ddl = "doc_id long, lang string, text string"

    # lang-clustered layout: the shape prepare_corpus-style exports
    # (split/lang-sorted) materialize from
    root = str(tmp_path / "by_lang")
    t = engine.EncodedTable(root)
    enc = engine.encode_dataframe(
        docs.orderBy("lang", "doc_id"), cols, codec="auto", chunk_rows=64,
        table_name="documents",
    )
    t.commit(spark, enc, "documents", mode="df")

    out = str(tmp_path / "only_en")
    res = engine.decode_table_to_parquet(
        spark, root, cols, ddl, out, table="documents",
        verify_checksums=True, predicate=("lang", "==", "en"),
    )
    written = spark.read.parquet(out).select(*cols)
    ref = (
        engine.decode_table(t.read(spark), cols, ddl)
        .filter(F.col("lang") == "en").select(*cols)
    )
    assert written.exceptAll(ref).isEmpty() and ref.exceptAll(written).isEmpty()
    assert res["rows"] == ref.count()

    # audit vs an independent zone computation over the metadata
    meta = t.read(spark).filter(F.col("column") == "lang").select(
        "run_id", "part_id", "chunk_id",
        "stat_min", "stat_max", "stat_min_bin", "stat_max_bin",
    ).collect()
    keep = {
        (r["run_id"], r["part_id"], r["chunk_id"])
        for r in meta
        if S._zone_keep("==", "en", r["stat_min"], r["stat_max"],
                        r["stat_min_bin"], r["stat_max_bin"])
    }
    a = res["audit"]
    assert a["groups_decoded"] == len(keep)
    assert a["groups_total"] == len(meta)
    assert 0 < a["groups_decoded"] < a["groups_total"], a  # pruning bit
    assert a["frame_bytes_read"] < a["frame_bytes_total"]
    # frame_bytes_read counts EXACTLY the surviving groups' bytes
    by_group = (
        t.read(spark).filter(F.col("column").isin(cols))
        .select("run_id", "part_id", "chunk_id", "enc_bytes").collect()
    )
    expect_read = sum(
        r["enc_bytes"] for r in by_group
        if (r["run_id"], r["part_id"], r["chunk_id"]) in keep
    )
    assert a["frame_bytes_read"] == expect_read
    assert a["frame_bytes_total"] == sum(r["enc_bytes"] for r in by_group)

    # numeric range predicate on a doc_id-clustered layout
    root2 = str(tmp_path / "by_id")
    t2 = engine.EncodedTable(root2)
    enc2 = engine.encode_dataframe(
        docs.orderBy("doc_id"), cols, codec="auto", chunk_rows=64,
        table_name="documents",
    )
    t2.commit(spark, enc2, "documents", mode="df")
    out2 = str(tmp_path / "id_range")
    res2 = engine.decode_table_to_parquet(
        spark, root2, cols, ddl, out2, table="documents",
        predicate=("doc_id", "between", (100, 150)),
    )
    w2 = spark.read.parquet(out2).select(*cols)
    ref2 = docs.filter(F.col("doc_id").between(100, 150)).select(*cols)
    assert w2.exceptAll(ref2).isEmpty() and ref2.exceptAll(w2).isEmpty()
    a2 = res2["audit"]
    assert 0 < a2["groups_decoded"] < a2["groups_total"]

    # hostile layout (hash-scattered): zero pruning, still exact
    out3 = str(tmp_path / "en_hostile")
    root3 = str(tmp_path / "scattered")
    t3 = engine.EncodedTable(root3)
    enc3 = engine.encode_dataframe(
        docs.repartition(4, "doc_id"), cols, codec="auto", chunk_rows=64,
        table_name="documents",
    )
    t3.commit(spark, enc3, "documents", mode="df")
    res3 = engine.decode_table_to_parquet(
        spark, root3, cols, ddl, out3, table="documents",
        predicate=("lang", "==", "en"),
    )
    w3 = spark.read.parquet(out3).select(*cols)
    ref3 = docs.filter(F.col("lang") == "en").select(*cols)
    assert w3.exceptAll(ref3).isEmpty() and ref3.exceptAll(w3).isEmpty()

    # predicate column must be among the decoded columns
    with pytest.raises(ValueError, match="predicate column"):
        engine.decode_table_to_parquet(
            spark, root, ["doc_id", "text"], "doc_id long, text string",
            str(tmp_path / "bad"), table="documents",
            predicate=("lang", "==", "en"),
        )


def test_decode_to_parquet_auto_colocation(spark, tmp_path, monkeypatch):
    """With no colocated flag, an encode-direct input must take the
    no-shuffle path (proved by forbidding colocate_chunks), and a
    scrambled layout must transparently fall back to the shuffle and
    still round-trip bit-identically."""
    from chimp_spark.engine import sink as S

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cols = ["o_orderkey", "o_totalprice"]
    ddl = "o_orderkey long, o_totalprice double"
    enc = engine.encode_dataframe(df, cols, codec="auto", chunk_rows=4096,
                                  table_name="orders").cache()
    enc.count()

    def forbidden(*a, **k):
        raise AssertionError("auto-detect took the shuffle path on "
                             "an encode-direct input")

    monkeypatch.setattr(S, "colocate_chunks", forbidden)
    out = str(tmp_path / "auto_fast")
    res = engine.decode_to_parquet(enc, cols, ddl, out, verify_checksums=True)
    assert res["rows"] == df.count()
    monkeypatch.undo()

    # scrambled layout: auto must fall back to the shuffle, not fail
    out2 = str(tmp_path / "auto_fallback")
    res2 = engine.decode_to_parquet(enc.repartition(7), cols, ddl, out2,
                                    verify_checksums=True)
    assert res2["rows"] == df.count()

    def canon(d):
        return d.select("o_orderkey",
                        F.col("o_totalprice").cast("string").alias("p"))
    a = spark.read.parquet(out)
    b = spark.read.parquet(out2)
    src = canon(df)
    for got in (a, b):
        assert canon(got).exceptAll(src).isEmpty()
        assert src.exceptAll(canon(got)).isEmpty()
    enc.unpersist()


def test_predicate_on_missing_column_raises(spark, tmp_path):
    """A predicate naming a column the table was never encoded with
    must RAISE, not silently export zero rows (the prune pass sees no
    stats frames for it — indistinguishable from prune-everything
    without the explicit check)."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    root = str(tmp_path / "enc")
    t = engine.EncodedTable(root)
    enc = engine.encode_dataframe(df, ["doc_id", "text"], codec="auto",
                                  chunk_rows=256, table_name="documents")
    t.commit(spark, enc, "documents", mode="df")
    with pytest.raises(Exception, match="no frames for"):
        engine.decode_table_to_parquet(
            spark, root, ["doc_id", "text", "lang"],
            "doc_id long, text string, lang string",
            str(tmp_path / "out"), table="documents",
            predicate=("lang", "==", "en"),
        )


def test_decode_to_parquet_predicate_row_filter(spark, tmp_path):
    """The DF-input sink's predicate must equal filter-after-decode
    exactly (no zone pruning there by design — in-flight frames are
    already materialized; the committed-table path owns IO pruning)."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cols = ["doc_id", "lang", "text"]
    ddl = "doc_id long, lang string, text string"
    enc = engine.encode_dataframe(df, cols, codec="auto", chunk_rows=256,
                                  table_name="documents").cache()
    out = str(tmp_path / "en_only")
    res = engine.decode_to_parquet(enc, cols, ddl, out,
                                   predicate=("lang", "==", "en"))
    got = spark.read.parquet(out).select(*cols)
    ref = df.filter(F.col("lang") == "en").select(*cols)
    assert got.exceptAll(ref).isEmpty() and ref.exceptAll(got).isEmpty()
    assert res["rows"] == ref.count()
    with pytest.raises(ValueError, match="predicate column"):
        engine.decode_to_parquet(enc, ["doc_id"], "doc_id long",
                                 str(tmp_path / "bad"),
                                 predicate=("lang", "==", "en"))
    enc.unpersist()


def test_df_resume_refuses_changed_layout(spark, tmp_path):
    """df-mode resume must refuse when the input layout's partition
    count changed between runs — partition ids would no longer
    identify the same rows, and the old behavior silently dropped
    never-encoded data (review finding)."""
    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    root = str(tmp_path / "enc")
    engine.encode_and_commit(spark, df.repartition(4, "n_nationkey"), root,
                             "nation", chunk_rows=1024)
    with pytest.raises(ValueError, match="df resume refused"):
        engine.encode_and_commit(spark, df.repartition(8, "n_nationkey"),
                                 root, "nation", chunk_rows=1024)
    # same layout: clean resumed no-op
    stats = engine.encode_and_commit(spark, df.repartition(4, "n_nationkey"),
                                     root, "nation", chunk_rows=1024)
    assert stats["partitions"] == 0 and stats.get("resumed")


def test_shard_writer_flushes_on_bytes(tmp_path):
    """The sink's shard writer must flush on buffered BYTES, not only
    rows — wide text at the default 2^20-row threshold would hold tens
    of GB per task before the first write."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chimp_spark.engine import sink as S

    schema = pa.schema([("t", pa.string())])
    w = S._ShardWriter(str(tmp_path), 0, schema, "snappy",
                       row_group_rows=1 << 20)
    w.MAX_BUFFER_BYTES = 1 << 20  # 1 MB for the test
    big = pa.RecordBatch.from_arrays([pa.array(["x" * 1000] * 600)], ["t"])
    for _ in range(5):  # ~3 MB total
        w.add(big)
    path, rows, _size = w.close()
    assert rows == 3000
    assert pq.ParquetFile(path).metadata.num_row_groups >= 2


def test_df_resume_refuses_pre_layout_parts_entries(spark, tmp_path):
    """df-mode entries committed before layout_parts stamping carry no
    layout identity; resuming against them must refuse loudly instead
    of silently skipping the membership check (ADVICE r5, medium)."""
    import glob
    import json as _json

    import pytest

    from chimp_spark import engine

    root = str(tmp_path / "enc_pre_layout")
    df = spark.range(1000).withColumn("v", F.col("id") * 2).repartition(4, "id")
    engine.encode_and_commit(spark, df, root, "t")

    # simulate a pre-upgrade commit: strip layout_parts from every entry
    for mf in glob.glob(str(tmp_path / "enc_pre_layout" / "metadata" / "*.jsonl")):
        lines = [
            _json.loads(ln)
            for ln in open(mf)
            if ln.strip()
        ]
        for e in lines:
            e.pop("layout_parts", None)
        with open(mf, "w") as f:
            for e in lines:
                f.write(_json.dumps(e) + "\n")

    with pytest.raises(ValueError, match="predate layout_parts"):
        engine.encode_and_commit(spark, df, root, "t")
