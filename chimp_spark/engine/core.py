"""Spark orchestration: DataFrame -> encoded-chunk DataFrame -> back.

Architecture (SURVEY.md §3.2): the reference's rayon chunk model —
independent fixed-size chunks, fresh codec state per chunk, order
restored by chunk id (chimp.rs:154-165, 294-309) — maps to Spark as:

    scan (parquet/iceberg-style)            [Catalyst: pruning/pushdown]
      -> optional repartitionByRange/salt   [explicit skew control]
      -> mapInArrow(encode kernel)          [Arrow batches, zero pandas]
      -> encoded-chunk rows                 [one row per (column, chunk)]

``mapInArrow`` (not mapInPandas) is load-bearing: pandas coerces null
int64 to float64 and null doubles to NaN; Arrow record batches keep
exact types and validity bitmaps end to end, which the bit-identical
decode contract requires.

Every encoded row carries (table, column, part_id, chunk_id,
row_start, n, ...) so any subset of chunks decodes independently and
positions reconstruct without a global sort — the unit of parallelism
is also the unit of resume.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..framing import decode_chunk, encode_chunk

ENC_ARROW_SCHEMA = pa.schema(
    [
        ("table", pa.string()),
        ("run_id", pa.string()),
        ("column", pa.string()),
        ("part_id", pa.int32()),
        ("chunk_id", pa.int64()),
        ("row_start", pa.int64()),
        ("n", pa.int64()),
        ("n_valid", pa.int64()),
        ("codec", pa.string()),
        ("dtype", pa.string()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("checksum", pa.int64()),
        ("encode_ns", pa.int64()),
        ("stat_min", pa.float64()),
        ("stat_max", pa.float64()),
        ("stat_min_bin", pa.binary()),
        ("stat_max_bin", pa.binary()),
        ("reason", pa.string()),
        ("frame", pa.binary()),
    ]
)
ENC_DDL = (
    "table string, run_id string, column string, part_id int, chunk_id long, row_start long, "
    "n long, n_valid long, codec string, dtype string, raw_bytes long, "
    "enc_bytes long, checksum long, encode_ns long, stat_min double, "
    "stat_max double, stat_min_bin binary, stat_max_bin binary, "
    "reason string, frame binary"
)

DEFAULT_CHUNK_ROWS = 65_536


def get_spark(
    cpus: int | str = "*",
    shuffle_partitions: int | None = None,
    app: str = "chimp_spark",
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    driver_memory: str = "24g",
) -> SparkSession:
    """Session tuned for the encode pipeline at local[N]; the same
    configs are what a cluster submit would set per executor."""
    n = 32 if cpus == "*" else int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE targets max(total/parallelism, minPartitionSize) per
        # coalesced partition (parallelismFirst). The decode exchange
        # moves COMPRESSED frames that expand ~6x and pay heavy CPU per
        # byte, so the 1m default min under-parallelizes small inputs
        # (19 of 32 cores at sf0.1). 256k only affects jobs whose
        # per-core share is < 1m — at scale total/parallelism dominates
        # and behavior is identical.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_rows))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", arrow_max_bytes_per_batch())
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
    )
    return builder.getOrCreate()


def arrow_max_bytes_per_batch() -> str:
    """Spark 4's arrow.maxBytesPerBatch default (64m) makes
    BatchedPythonArrowInput call ArrowWriter.sizeInBytes() — a full
    struct-vector walk — after EVERY appended row; on a wide table
    that walk costs ~10x the row conversion itself (measured: a
    mapInArrow passthrough over cached lineitem dropped 2.05s -> 0.84s
    at local[32] when the walk is disabled). Int.MaxValue restores the
    Spark 3.x contract: batches bounded by maxRecordsPerBatch rows
    (our chunk protocol already slices to chunk_rows), batch bytes
    bounded by partition layout. Deployments with very large binary
    rows can re-cap via CHIMP_SPARK_ARROW_MAX_BYTES instead of paying
    the per-row walk by default."""
    import os

    return os.environ.get("CHIMP_SPARK_ARROW_MAX_BYTES", str(2**31 - 1))


def encode_chunk_into(out: dict, arr: pa.Array, col: str, codec: str,
                      cache: dict, table_name: str, run_id: str,
                      part_id: int, chunk_id: int, row_start: int) -> None:
    """Encode one column chunk and append its full lineage row to an
    ENC_ARROW_SCHEMA column dict. The ONE place the encoded-row shape
    lives: both ingest kernels (the DataFrame path below and the scan
    path in scan.py) call it, so a schema change cannot silently
    drift between the two paths."""
    import time as _time

    t0 = _time.perf_counter_ns()
    try:
        blob, meta = encode_chunk(arr, codec=codec, cache=cache)
    except TypeError as e:
        raise TypeError(f"column '{col}': {e}") from e
    out["encode_ns"].append(_time.perf_counter_ns() - t0)
    out["table"].append(table_name)
    out["run_id"].append(run_id)
    out["column"].append(col)
    out["part_id"].append(part_id)
    out["chunk_id"].append(chunk_id)
    out["row_start"].append(row_start)
    out["n"].append(meta.n)
    out["n_valid"].append(meta.n_valid)
    out["codec"].append(meta.codec)
    out["dtype"].append(meta.dtype)
    out["raw_bytes"].append(meta.raw_bytes)
    out["enc_bytes"].append(meta.enc_bytes)
    out["checksum"].append(meta.checksum)
    out["stat_min"].append(meta.stat_min)
    out["stat_max"].append(meta.stat_max)
    out["stat_min_bin"].append(meta.stat_min_bin)
    out["stat_max_bin"].append(meta.stat_max_bin)
    out["reason"].append(meta.reason)
    out["frame"].append(blob)


def encode_dataframe(
    df: DataFrame,
    columns: list[str] | None = None,
    codec: str | dict[str, str] = "auto",
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    table_name: str = "t",
) -> DataFrame:
    """Encode selected columns into chunk frames.

    One pass over the input: each task slices its partition into
    ``chunk_rows`` chunks and emits one encoded row per (column,
    chunk). Narrow (no shuffle) — partitioning/skew policy is applied
    by the caller *before* this (see partitioning.py), so the encode
    plan composes with whatever layout the table needs.
    """
    from .. import _ship

    _ship.ensure(df.sparkSession)
    import uuid

    cols = columns or df.columns
    src = df.select(*cols)
    run_id = uuid.uuid4().hex[:12]  # chunk identity discriminator:
    # (run_id, part_id, chunk_id) stays unique across commits/epochs

    codec_of = (lambda c: codec.get(c, "auto")) if isinstance(codec, dict) else (lambda c: codec)
    codec_map = {c: codec_of(c) for c in cols}

    def encode_iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        state = {"chunk_id": 0, "row_start": 0}
        from ..framing import column_cache

        # cache scope includes run_id: reused workers amortize FSST
        # training across THIS encode call's tasks without leaking a
        # table trained on some earlier dataset that shared names
        col_caches: dict[str, dict] = {
            c: column_cache(f"{table_name}:{run_id}", c) for c in cols
        }

        def flush(tbl: pa.Table) -> pa.RecordBatch:
            out: dict[str, list] = {k.name: [] for k in ENC_ARROW_SCHEMA}
            for col in tbl.column_names:
                encode_chunk_into(
                    out, tbl.column(col).combine_chunks(), col,
                    codec_map[col], col_caches[col], table_name, run_id,
                    pid, state["chunk_id"], state["row_start"],
                )
            state["chunk_id"] += 1
            state["row_start"] += tbl.num_rows
            return pa.RecordBatch.from_pydict(out, schema=ENC_ARROW_SCHEMA)

        pending: list[pa.RecordBatch] = []
        buffered = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            pending.append(batch)
            buffered += batch.num_rows
            while buffered >= chunk_rows:
                tbl = pa.Table.from_batches(pending)
                yield flush(tbl.slice(0, chunk_rows))
                rest = tbl.slice(chunk_rows)
                pending = rest.to_batches() if rest.num_rows else []
                buffered = rest.num_rows
        if buffered:
            yield flush(pa.Table.from_batches(pending))

    return src.mapInArrow(encode_iter, ENC_DDL)


def decode_column(
    encoded: DataFrame, column: str, value_ddl: str, table: str | None = None,
    verify_checksums: bool = False,
    value_range: tuple[float, float] | None = None,
    key_range: tuple[bytes | str, bytes | str] | None = None,
) -> DataFrame:
    """Decode one column's frames -> (part_id, row_id, value).

    ``row_id = row_start + offset`` is stable per encode run, so two
    decoded columns of the same run align on (part_id, row_id) without
    any global sort. ``value_ddl`` is the Spark type of the value
    column, e.g. ``"double"``.
    """
    from .. import _ship

    _ship.ensure(encoded.sparkSession)
    sel = encoded.filter(F.col("column") == column)
    if table is not None:
        sel = sel.filter(F.col("table") == table)
    if value_range is not None:
        # zone-map pruning: skip whole chunks whose [stat_min, stat_max]
        # cannot intersect the requested range (conservative: frames
        # without stats pass through). At scale this is the encoded
        # table's answer to parquet min/max row-group skipping.
        lo, hi = value_range
        sel = sel.filter(
            F.col("stat_min").isNull()
            | ((F.col("stat_max") >= F.lit(lo)) & (F.col("stat_min") <= F.lit(hi)))
        )
    if key_range is not None and "stat_max_bin" not in encoded.columns:
        key_range = None  # pre-upgrade table without string zone maps:
        # fall back to a full (conservative) scan instead of failing
    if key_range is not None:
        # string/binary zone maps: 16-byte truncated bounds (min is a
        # prefix -> valid lower bound; max is truncate-and-increment ->
        # valid upper bound; NULL bound = unbounded, chunk kept). The
        # encoded analogue of parquet row-group skipping on a sorted
        # url layout.
        klo, khi = key_range
        klo = klo.encode() if isinstance(klo, str) else klo
        khi = khi.encode() if isinstance(khi, str) else khi
        sel = sel.filter(
            (F.col("stat_max_bin").isNull() | (F.col("stat_max_bin") >= F.lit(klo)))
            & (F.col("stat_min_bin").isNull() | (F.col("stat_min_bin") <= F.lit(khi)))
        )
    sel = sel.select("part_id", "row_start", "checksum", "frame")
    out_type = _arrow_type_of_ddl(value_ddl)

    def dec_iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..framing import checksum_of

        for b in batches:
            pids = b.column("part_id").to_pylist()
            starts = b.column("row_start").to_pylist()
            frames = b.column("frame")
            sums = b.column("checksum").to_pylist()
            for i in range(b.num_rows):
                # as_buffer(): zero-copy view into the arrow batch
                raw = decode_chunk(memoryview(frames[i].as_buffer()))
                if verify_checksums and checksum_of(raw) != sums[i]:
                    raise ValueError(
                        f"checksum mismatch: part={pids[i]} row_start={starts[i]}"
                    )
                arr = _cast_to(raw, out_type)
                n = len(arr)
                rs = starts[i]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(n, pids[i], dtype=np.int32)),
                        pa.array(rs + np.arange(n, dtype=np.int64)),
                        arr,
                    ],
                    names=["part_id", "row_id", "value"],
                )

    return sel.mapInArrow(dec_iter, f"part_id int, row_id long, value {value_ddl}")


def _arrow_type_of_ddl(ddl: str) -> pa.DataType:
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import _parse_datatype_string

    return to_arrow_type(_parse_datatype_string(ddl))


def _cast_to(arr: pa.Array, t: pa.DataType) -> pa.Array:
    return arr if arr.type == t else arr.cast(t)


def colocate_chunks(encoded: DataFrame, columns: list[str]) -> DataFrame:
    """The decode co-location plan: ONE hash shuffle moving compressed
    frames so every (run, part, chunk) group's per-column frames land
    in the same task, in order. Shared by decode_table (JVM-emitting)
    and sink.decode_to_parquet (task-side writes)."""
    return (
        encoded.filter(F.col("column").isin(columns))
        .select("run_id", "part_id", "chunk_id", "row_start", "column", "checksum", "frame")
        .repartition(F.col("run_id"), F.col("part_id"), F.col("chunk_id"))
        .sortWithinPartitions("run_id", "part_id", "chunk_id", "column")
    )


def ddl_arrow_types(ddl: str) -> dict[str, pa.DataType]:
    return {
        f.split()[0]: _arrow_type_of_ddl(" ".join(f.split()[1:]))
        for f in ddl.split(",")
    }


# marker string of the incomplete-chunk-group error below; the decode
# sink's colocation auto-detect matches it across the Py4J boundary
# (a worker exception arrives stringified), so it lives as a shared
# constant rather than a substring two files must keep in sync
# the bracketed token makes the match effectively collision-proof: a
# user error whose text merely says "lacks columns" must not trigger
# the sink's silent second-pass fallback
INCOMPLETE_GROUP_MARK = "[CHIMP_INCOMPLETE_GROUP] lacks columns"


def iter_decoded_groups(
    batches: Iterator[pa.RecordBatch],
    columns: list[str],
    out_types: dict[str, pa.DataType],
    verify_checksums: bool = False,
) -> Iterator[pa.RecordBatch]:
    """Worker-side decode of co-located chunk rows (colocate_chunks
    order) -> one (part_id, row_id, *columns) RecordBatch per chunk
    group. The shared kernel behind decode_table and the parquet sink.
    """
    from ..framing import checksum_of

    group_key: tuple[str, int, int] | None = None
    group: dict[str, bytes] = {}
    sums: dict[str, int] = {}
    group_meta: tuple[int, int] = (0, 0)

    def emit() -> pa.RecordBatch:
        pid, rs = group_meta
        missing = [c for c in columns if c not in group]
        if missing:
            raise ValueError(
                f"chunk (run={group_key[0]}, part={pid}) {INCOMPLETE_GROUP_MARK} "
                f"{missing}: decode_table needs all columns from ONE "
                f"encode run — encode them together or decode per "
                f"column and join on (part_id, row_id)"
            )
        raws = {c: decode_chunk(group[c]) for c in columns}
        if verify_checksums:
            for c, a in raws.items():
                if checksum_of(a) != sums[c]:
                    raise ValueError(
                        f"checksum mismatch: col={c} part={pid} row_start={rs}"
                    )
        arrs = {c: _cast_to(raws[c], out_types[c]) for c in columns}
        n = len(next(iter(arrs.values())))
        cols = [
            pa.array(np.full(n, pid, dtype=np.int32)),
            pa.array(rs + np.arange(n, dtype=np.int64)),
        ] + [arrs[c] for c in columns]
        return pa.RecordBatch.from_arrays(cols, names=["part_id", "row_id"] + columns)

    for b in batches:
        # batch-decode the metadata columns once: per-element arrow
        # __getitem__/.as_py() costs ~3 us a call, which at 100 TB
        # scale (millions of frame rows per task) is minutes of pure
        # object churn; frames stay zero-copy via as_buffer()
        run_ids = b.column("run_id").to_pylist()
        part_ids = b.column("part_id").to_pylist()
        chunk_ids = b.column("chunk_id").to_pylist()
        row_starts = b.column("row_start").to_pylist()
        col_names = b.column("column").to_pylist()
        checksums = b.column("checksum").to_pylist()
        frames = b.column("frame")
        for i in range(b.num_rows):
            key = (run_ids[i], part_ids[i], chunk_ids[i])
            if key != group_key and group:
                yield emit()
                group = {}
            group_key = key
            group_meta = (key[1], row_starts[i])
            # zero-copy: the arrow buffer stays alive via refcount
            group[col_names[i]] = memoryview(frames[i].as_buffer())
            sums[col_names[i]] = checksums[i]
    if group:
        yield emit()


def decode_table(
    encoded: DataFrame, columns: list[str], ddl: str,
    verify_checksums: bool = False,
) -> DataFrame:
    """Decode several columns back into aligned rows.

    Chunks are co-located by (part_id, chunk_id) with one hash shuffle,
    then each group's frames (one per column) decode into a single
    output batch. ``ddl`` gives the decoded column types, e.g.
    ``"l_orderkey long, l_extendedprice double"``.

    This path emits decoded VALUES through Spark (Arrow -> JVM rows) —
    right when the values feed further Spark plan nodes (joins, aggs).
    A consumer that just needs decoded files should use
    ``sink.decode_to_parquet``, which writes shards straight from the
    tasks and never pays the JVM emit.
    """
    from .. import _ship

    _ship.ensure(encoded.sparkSession)
    sel = colocate_chunks(encoded, columns)
    out_types = ddl_arrow_types(ddl)

    def dec_iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        yield from iter_decoded_groups(batches, columns, out_types, verify_checksums)

    return sel.mapInArrow(dec_iter, f"part_id int, row_id long, {ddl}")


def verify_table(
    source: DataFrame, encoded: DataFrame, columns: list[str], ddl: str,
    table: str | None = None,
) -> dict:
    """Round-trip audit: decode ``columns`` from ``encoded`` (frame
    checksums verified — THE bit-level guard, crc32 over exact value
    bits per chunk) and multiset-compare against ``source`` (exceptAll
    both ways, so duplicates count). Returns {'rows', 'missing',
    'extra'} — all-zero mismatches == lossless. ``table`` filters a
    multi-table EncodedTable to the audited one.

    Spark's comparison normalizes floats (-0.0 == 0.0, all NaN equal),
    so float/double columns are compared through a string cast, which
    distinguishes -0.0 from 0.0; NaN PAYLOAD bits are covered by the
    frame checksums, not this row comparison."""
    from pyspark.sql.types import DoubleType, FloatType

    enc = encoded if table is None else encoded.filter(F.col("table") == table)
    dec = decode_table(enc, columns, ddl, verify_checksums=True).persist()
    try:
        rows = dec.count()  # materializes once; except-counts reuse it

        def canon(df: DataFrame) -> DataFrame:
            floaty = {
                f.name for f in df.select(*columns).schema.fields
                if isinstance(f.dataType, (DoubleType, FloatType))
            }
            return df.select(
                *[
                    F.col(c).cast("string").alias(c) if c in floaty else F.col(c)
                    for c in columns
                ]
            )

        lhs = canon(source)
        rhs = canon(dec)
        return {
            "rows": rows,
            "missing": lhs.exceptAll(rhs).count(),
            "extra": rhs.exceptAll(lhs).count(),
        }
    finally:
        dec.unpersist()


def compression_summary(encoded: DataFrame) -> DataFrame:
    """Per-(table, column, codec) ratio/throughput accounting — the
    engine-side analogue of the reference's printed metrics
    (main.rs:169-178)."""
    return (
        encoded.groupBy("table", "column", "codec")
        .agg(
            F.count("*").alias("chunks"),
            F.sum("n").alias("values"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sum("encode_ns").alias("encode_ns"),
        )
        .withColumn(
            "kernel_gbps",
            F.col("raw_bytes") / F.greatest(F.col("encode_ns"), F.lit(1)),
        )
        .withColumn(
            "bits_per_value", F.col("enc_bytes") * 8.0 / F.greatest(F.col("values"), F.lit(1))
        )
        .withColumn(
            "ratio", F.col("raw_bytes") / F.greatest(F.col("enc_bytes"), F.lit(1))
        )
        .orderBy("table", "column")
    )
