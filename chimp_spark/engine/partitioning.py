"""Explicit partitioning & skew control for the encode pipeline.

The north rule requires partitioning/shuffle/skew handled explicitly
(not AQE-only): Common-Crawl-style url/lang distributions are Zipfian,
so a naive hash/range layout puts the 'en' mass or a hot host into one
straggler task. Policies here run BEFORE encode_dataframe (which is
narrow), so the chunk layout is the table layout.

At 100 TB the same code holds: range partitioning bounds task input by
bytes (Spark samples the key distribution), salting splits hot keys
across ``salt_buckets`` tasks, and the salt column is dropped before
encoding so it never reaches the frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_balanced(df: DataFrame, num_partitions: int) -> DataFrame:
    """Round-robin: equal rows per task; best for pure encode throughput
    when no key locality is needed downstream."""
    return df.repartition(num_partitions)


def repartition_by_range(df: DataFrame, key: str, num_partitions: int) -> DataFrame:
    """Range layout: co-locates key neighborhoods (sorted urls compress
    better under dict/RLE/FSST because shared prefixes cluster), and
    enables partition pruning on the key at read time."""
    return df.repartitionByRange(num_partitions, F.col(key))


def repartition_salted(
    df: DataFrame,
    key: str,
    num_partitions: int,
    hot_keys: list | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Range layout with salt for hot keys (explicit skew handling).

    ``hot_keys`` (e.g. ['en'] for lang, or dominant hosts for url) get
    a per-row salt derived from a stable hash of the whole row key, so
    one hot key spreads over ``salt_buckets`` adjacent range buckets
    while cold keys keep salt 0 (stay contiguous). If ``hot_keys`` is
    None, every key is salted (uniform spread, keeps range locality at
    bucket granularity).
    """
    # per-ROW salt (hashing only the key would be constant per key and
    # never spread it); monotonically_increasing_id is deterministic
    # for a given scan, keeping the layout reproducible
    salt = F.pmod(
        F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt_buckets)
    ).cast("int")
    if hot_keys is not None:
        salt = F.when(F.col(key).isin(hot_keys), salt).otherwise(F.lit(0))
    salted = df.withColumn("__salt", salt)
    out = salted.repartitionByRange(num_partitions, F.col(key), F.col("__salt"))
    return out.drop("__salt")


def detect_hot_keys(
    df: DataFrame, key: str, threshold: float = 0.05, max_keys: int = 32
) -> list:
    """Sampled frequency scan: keys holding > ``threshold`` of rows.
    One cheap aggregation on a sample; at 10^12 rows run it on a
    sampled fraction — the Zipf head is visible at any sample size."""
    if df.isStreaming:
        # count()/collect() raise on a streaming plan anyway — fail
        # with an actionable message instead of an AnalysisException
        # from the middle of the sample aggregation
        raise ValueError(
            "detect_hot_keys needs a batch DataFrame: sample a batch "
            "slice of the stream's source (or supply hot_keys "
            "explicitly to repartition_salted)"
        )
    sample = df.select(key).sample(0.1, seed=42)
    total = sample.count()
    if total == 0:
        return []
    rows = (
        sample.groupBy(key)
        .count()
        .filter(F.col("count") > threshold * total)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .collect()
    )
    return [r[0] for r in rows]
