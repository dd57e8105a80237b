"""Deterministic synthetic Common-Crawl-style pages table.

The north rule's input shape (BASELINE.json input_hint):

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generated distributed (one seeded kernel per Spark partition, no
driver-side materialization) and deterministic: partition i always
produces the same rows regardless of cluster size, so tests and
benches at two parallelism levels see identical bytes.

Skew is built in on purpose — Zipf hosts for ``url`` and a dominant
'en' share for ``lang`` — because the engine's salting/range layout
paths (engine.partitioning) need realistic hot keys to prove
themselves on.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

LANGS = np.array(
    ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl",
     "pl", "tr", "ar", "ko", "sv", "cs", "fi", "el", "he", "da"]
)
# Zipf-ish language mass: 'en' dominant (hot key for the salting path)
_LANG_W = 1.0 / np.arange(1, LANGS.size + 1) ** 1.5
_LANG_P = _LANG_W / _LANG_W.sum()

_VOCAB = np.array(
    ("the of and to in a is that for web page data crawl index search "
     "content site link image news article archive open public record "
     "время данные страница 网页 数据 页面 données page texte seite "
     "inhalt netz").split()
)


def _gen_partition(pid: int, rows: int, seed: int, base_ts: int) -> pa.RecordBatch:
    rng = np.random.default_rng(np.random.SeedSequence([seed, pid]))

    # Zipf hosts; unique full urls
    host_rank = rng.zipf(1.3, rows) % 5000
    hosts = np.char.add(
        np.char.add("www.host", host_rank.astype("U6")), ".example.org"
    )
    path_id = rng.integers(0, 1 << 40, rows)
    urls = np.char.add(
        np.char.add(np.char.add("https://", hosts), "/p/"),
        np.char.add(path_id.astype("U13"), np.char.add("-", np.arange(rows).astype("U8"))),
    )

    # near-monotonic microsecond timestamps with jitter (ts_chimp target)
    ts = base_ts + pid * np.int64(10**9) + np.cumsum(
        rng.integers(100, 5000, rows)
    ).astype(np.int64) + rng.integers(-50, 50, rows)

    lang = rng.choice(LANGS, rows, p=_LANG_P)

    # text: sentences over a small vocabulary (dict/FSST target)
    n_words = rng.integers(8, 40, rows)
    total = int(n_words.sum())
    words = rng.choice(_VOCAB, total)
    bounds = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(n_words, out=bounds[1:])
    texts = np.array(
        [" ".join(words[bounds[i] : bounds[i + 1]]) for i in range(rows)], dtype=object
    )
    htmls = [
        b"<html><body><p>" + t.encode("utf-8") + b"</p></body></html>" for t in texts
    ]

    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls.tolist(), type=pa.string()),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(htmls, type=pa.binary()),
            pa.array(texts.tolist(), type=pa.string()),
            pa.array(lang.tolist(), type=pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def pages_df(
    spark: SparkSession,
    total_rows: int = 100_000,
    num_partitions: int = 32,
    seed: int = 42,
    base_ts: int = 1_690_000_000_000_000,
) -> DataFrame:
    """Distributed deterministic pages table."""
    from . import _ship

    _ship.ensure(spark)
    per = total_rows // num_partitions
    counts = [per + (1 if i < total_rows % num_partitions else 0) for i in range(num_partitions)]
    plan = spark.createDataFrame(
        [(i, counts[i], seed, base_ts) for i in range(num_partitions)],
        "pid int, rows int, seed int, base_ts long",
    ).repartition(num_partitions, "pid")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for i in range(b.num_rows):
                yield _gen_partition(
                    b.column("pid")[i].as_py(),
                    b.column("rows")[i].as_py(),
                    b.column("seed")[i].as_py(),
                    b.column("base_ts")[i].as_py(),
                )

    return plan.mapInArrow(gen, PAGES_DDL)
