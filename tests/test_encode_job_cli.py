"""encode_job argument validation (no Spark session needed: argparse
errors fire before getOrCreate)."""

import os
import subprocess
import sys

JOB = "/root/repo/jobs/encode_job.py"
BASE = [sys.executable, JOB, "--input", "/x", "--output", "/y", "--table", "t"]


def _run(extra):
    env = dict(os.environ, PYTHONPATH="/root/repo")  # spark-submit
    # normally provides the package via --py-files
    return subprocess.run(BASE + extra, capture_output=True, text=True,
                          timeout=60, env=env)


def test_codec_typo_rejected_before_spark():
    r = _run(["--codec", "dec_fr"])
    assert r.returncode != 0
    assert "unknown codec" in r.stderr


def test_per_column_codec_syntax_error_message():
    r = _run(["--codec", "price=dec_for,auto"])
    assert r.returncode != 0
    assert "col=codec" in r.stderr


def test_per_column_codec_unknown_name():
    r = _run(["--codec", "price=dec_fr"])
    assert r.returncode != 0
    assert "unknown codec" in r.stderr and "price" in r.stderr


def test_cli_scan_resume_refuses_changed_input(tmp_path):
    """End-to-end CLI: a second run over a CHANGED input directory must
    refuse to resume (positional unit ids no longer identify the same
    row groups) instead of silently skipping data. Two real
    interpreter runs, same as spark-submit would execute."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "in"
    src.mkdir()
    t = pa.table({"k": list(range(1000)), "v": [float(i) / 7 for i in range(1000)]})
    pq.write_table(t, src / "part-0.parquet")
    out = str(tmp_path / "enc")
    args = [sys.executable, JOB, "--input", str(src), "--output", out,
            "--table", "t"]
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(args, capture_output=True, text=True, timeout=300, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert '"partitions": 1' in r1.stdout

    pq.write_table(t.slice(0, 100), src / "part-1.parquet")  # new crawl file
    r2 = subprocess.run(args, capture_output=True, text=True, timeout=300, env=env)
    assert r2.returncode != 0
    assert "scan resume refused" in (r2.stderr + r2.stdout)


def test_prepare_corpus_cli_end_to_end(tmp_path):
    """Full corpus-prep job via two real interpreter runs: the first
    dedups/filters/splits/encodes and commits; the second run RESUMES
    (0 new partitions). The committed table decodes to a corpus with
    zero duplicate texts and full split coverage."""
    import json

    JOB2 = "/root/repo/jobs/prepare_corpus.py"
    out = str(tmp_path / "corpus")
    args = [sys.executable, JOB2,
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", out, "--min-quality", "0.2"]
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(args, capture_output=True, text=True, timeout=600, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    stats = json.loads(r1.stdout.strip().splitlines()[-1])
    c = stats["counts"]
    assert c["input"] >= c["after_exact_dedup"] >= c["after_near_dedup"] >= c["after_filters"] > 0
    assert stats["commit"]["partitions"] > 0
    # encode layout is sized by chunk_rows per split, not inherited
    # from the dedup shuffle: 477 surviving docs at the default
    # 0.8/0.1/0.1 weights -> one bucket per split, 3 planned
    # partitions; committed = the non-empty ones
    assert stats["encode_partitions"] == 3
    assert stats["commit"]["partitions"] <= stats["encode_partitions"]

    r2 = subprocess.run(args, capture_output=True, text=True, timeout=600, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    stats2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert stats2["commit"]["partitions"] == 0  # resumed
    assert stats2["commit"].get("resumed") is True

    # decode the committed corpus and check pipeline invariants
    from pyspark.sql import functions as F

    from chimp_spark import engine

    spark = engine.get_spark(cpus=4, app="prep_check", chunk_rows=4096)
    try:
        t = engine.EncodedTable(out)
        cols = ["doc_id", "text", "split"]
        dec = spark_df = engine.decode_table(
            t.read(spark), cols, "doc_id long, text string, split string",
            verify_checksums=True,
        ).cache()
        n = dec.count()
        assert n == c["after_filters"]
        assert dec.select("text").distinct().count() == n  # no dup texts
        assert {r["split"] for r in dec.select("split").distinct().collect()} <= {
            "train", "valid", "test"
        }
        dec.unpersist()
    finally:
        spark.stop()


def test_export_job_where_parser():
    """--where grammar maps to the sink predicate forms (no Spark)."""
    sys.path.insert(0, "/root/repo/jobs")
    try:
        from export_job import parse_where
    finally:
        sys.path.pop(0)
    assert parse_where("split==train") == ("split", "==", "train")
    assert parse_where("price<=10") == ("price", "<=", 10)
    assert parse_where("score>=0.5") == ("score", ">=", 0.5)
    assert parse_where("id between 5 100") == ("id", "between", (5, 100))
    assert parse_where("lang in en,de") == ("lang", "in", ["en", "de"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot parse"):
        parse_where("split != train")
    with _pytest.raises(ValueError, match="between"):
        parse_where("id between 5")


def test_export_job_cli_end_to_end(tmp_path):
    """encode_job then export_job --where over real interpreter runs:
    the exported slice must equal the source's matching rows, and the
    audit must show chunk pruning on the id-sorted layout."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "in"
    src.mkdir()
    t = pa.table({
        "k": list(range(4000)),
        "v": [float(i) / 7 for i in range(4000)],
    })
    pq.write_table(t, src / "part-0.parquet", row_group_size=500)
    enc = str(tmp_path / "enc")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(
        [sys.executable, JOB, "--input", str(src), "--output", enc,
         "--table", "t", "--chunk-rows", "500"],
        capture_output=True, text=True, timeout=300, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]

    out = str(tmp_path / "export")
    r2 = subprocess.run(
        [sys.executable, "/root/repo/jobs/export_job.py",
         "--input", enc, "--output", out, "--table", "t",
         "--columns", "k,v", "--ddl", "k long, v double",
         "--where", "k between 1000 1999", "--verify-checksums"],
        capture_output=True, text=True, timeout=300, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    res = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res["rows"] == 1000
    a = res["audit"]
    assert 0 < a["groups_decoded"] < a["groups_total"], a
    got = pq.read_table(out).sort_by("k")
    assert got.column("k").to_pylist() == list(range(1000, 2000))
    assert got.column("v").to_pylist() == [float(i) / 7 for i in range(1000, 2000)]


def test_export_job_where_quoting_and_mixed_lists():
    """Quoted values stay strings (the only way to say \"the string
    2024\" about a string column); 'in' lists coerce all-or-nothing so
    the payload is always one comparable type."""
    sys.path.insert(0, "/root/repo/jobs")
    try:
        from export_job import parse_where
    finally:
        sys.path.pop(0)
    assert parse_where("category=='2024'") == ("category", "==", "2024")
    assert parse_where('code=="007"') == ("code", "==", "007")
    assert parse_where("code in en,2") == ("code", "in", ["en", "2"])
    assert parse_where("k in 1,2,3") == ("k", "in", [1, 2, 3])
    assert parse_where("k between '5' 'a'") == ("k", "between", ("5", "a"))
