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
    # encode layout is sized by chunk_rows, not inherited from the
    # dedup shuffle: 477 surviving docs / 65536 -> exactly 1 partition
    assert stats["commit"]["partitions"] == stats["encode_partitions"] == (
        (c["after_filters"] + 65_535) // 65_536
    )

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
