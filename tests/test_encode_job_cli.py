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
