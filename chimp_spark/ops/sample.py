"""Deterministic hash-based sampling and splits.

A 100 TB training pipeline needs subsets that are REPRODUCIBLE — the
same rows selected on every run, on any engine, at any parallelism —
which rules out rand()/Bernoulli samplers (seeded RNG state is
per-partition and layout-dependent). These ops key selection on the
md5 of the row's identity columns: a pure function of the data, so

- re-running the pipeline (or resuming half of it) selects the SAME
  rows;
- train/val/test membership never migrates when the corpus is
  repartitioned or appended to;
- an external system (DuckDB, Trino, a reducer) reproduces the exact
  subset from the same expression — the property the oracle checks.

Mechanics: the first 13 hex chars of md5(seed || key) are a uniform
52-bit draw; comparing them LEXICOGRAPHICALLY against a fixed-width
hex threshold avoids integer-parsing differences across engines
(lowercase-hex string order == numeric order at fixed width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEXW = 13  # 52 bits: exact in a double, engine-portable


def hash_threshold(rate: float) -> str:
    """Fixed-width lowercase-hex threshold for a keep-rate in [0, 1].
    rate >= 1.0 returns "g" — lexicographically above every hex draw —
    so "keep everything" really keeps the (16^-13-probability) all-'f'
    draw too instead of silently dropping it at 10^10-row scale."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * (16 ** _HEXW)), f"0{_HEXW}x")


def hash_draw(cols: list[str], seed: str = "s1") -> Column:
    """The row's uniform draw: first 13 hex chars of md5(seed || key).
    Null-safe: nulls and empty strings are distinguished by an
    explicit per-column null marker."""
    parts: list[Column] = [F.lit(seed)]
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
    return F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, _HEXW)


def hash_sample(
    df: DataFrame, rate: float, cols: list[str], seed: str = "s1"
) -> DataFrame:
    """Keep ~rate of rows, deterministically by key identity. A narrow
    filter — no shuffle, no RNG state; pushes down like any predicate."""
    return df.filter(hash_draw(cols, seed) < F.lit(hash_threshold(rate)))


def stratified_hash_sample(
    df: DataFrame, rates: dict[str, float], strata_col: str,
    cols: list[str], seed: str = "s1", default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum keep-rates (e.g. downsample boilerplate languages,
    keep all rare ones): threshold chosen by CASE over the stratum,
    draw still keyed on row identity. One narrow filter."""
    thr: Column = F.lit(hash_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(hash_threshold(rate))).otherwise(thr)
    return df.filter(hash_draw(cols, seed) < thr)


def split_thresholds(weights: dict[str, float]) -> list[str]:
    """The cumulative hex thresholds train_test_split compares against
    (one per split but the last). The running sum is rounded to 12
    decimals so float accumulation (0.8 + 0.1 = 0.9000000000000001)
    can't shift a boundary one 52-bit unit off the documented external
    expression hash_threshold(0.9) that oracles reproduce."""
    acc = 0.0
    out = []
    for name in list(weights)[:-1]:
        acc = round(acc + weights[name], 12)
        out.append(hash_threshold(acc))
    return out


def train_test_split(
    df: DataFrame, weights: dict[str, float], cols: list[str],
    seed: str = "split1", split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by consecutive hash intervals
    (weights must sum to ~1). Membership is a pure function of the
    row key: appending data or repartitioning NEVER moves existing
    rows between splits — the leakage guarantee a training pipeline
    actually needs."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")
    draw = hash_draw(cols, seed)
    expr = None
    names = list(weights)
    for name, thr in zip(names[:-1], split_thresholds(weights)):
        cond = draw < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)
