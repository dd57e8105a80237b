"""Emulates the driver's correctness gate: run every queries() entry at
sf0.01 on Spark AND its oracle_sql() on DuckDB, compare row count,
column names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from chimp_spark import engine

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST01", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def spark():
    s = engine.get_spark(cpus=8, app="entry_contract", chunk_rows=8192)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = v.hex()
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["roundtrip_mismatches"] == 0 for r in rows)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    oracles = entrymod.oracle_sql()
    spark_rows = sdf.collect()
    cols = sdf.columns
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        if name == "pages_pipeline_invariant":
            assert spark_rows[0]["mismatches"] == 0
            assert spark_rows[0]["rows"] == 20_000
        return
    ddf = duck.execute(oracles[name]).fetch_arrow_table()
    duck_cols = ddf.column_names
    assert sorted(cols) == sorted(duck_cols), f"{name}: column names differ"
    duck_rows = ddf.to_pylist()
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    lhs = _norm([r.asDict() for r in spark_rows], sorted(cols))
    rhs = _norm(duck_rows, sorted(cols))
    assert lhs == rhs, f"{name}: value mismatch (first diff: {_first_diff(lhs, rhs)})"


def _first_diff(a, b):
    for x, y in zip(a, b):
        if x != y:
            return (x, y)
    return ("len", len(a), len(b))
