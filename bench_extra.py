"""Round-6 kernel/profiling harness (supplementary — bench.py is the
frozen driver contract; numbers cited in OPTIMIZATION_r06.md).

Modes:
    python bench_extra.py kernel [table ...]   per-column encode kernel timing
    python bench_extra.py profile <table>      cProfile of the encode kernel
    python bench_extra.py decode [table ...]   per-column decode kernel timing
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CHUNK = 65_536


def _chunks_of(table: str):
    t = pq.read_table(f"{SF_DIR}/{table}.parquet")
    for col in t.column_names:
        arr = t.column(col).combine_chunks()
        for off in range(0, t.num_rows, CHUNK):
            sl = arr.slice(off, CHUNK)
            if isinstance(sl, pa.ChunkedArray):
                sl = sl.combine_chunks()
            yield col, sl


def kernel_bench(tables: list[str], repeats: int = 3) -> None:
    from chimp_spark.framing import column_cache, encode_chunk

    for table in tables:
        chunks = list(_chunks_of(table))
        per_col: dict[str, list] = {}
        for _ in range(repeats):
            caches: dict[str, dict] = {}
            t_col: dict[str, float] = {}
            for col, arr in chunks:
                cache = caches.setdefault(col, {})
                t0 = time.perf_counter()
                blob, meta = encode_chunk(arr, codec="auto", cache=cache)
                dt = time.perf_counter() - t0
                t_col[col] = t_col.get(col, 0.0) + dt
                per_col.setdefault(col, [0, 0, meta.codec])
                per_col[col][0] = meta.raw_bytes
                per_col[col][1] = len(blob)
            for col, tt in t_col.items():
                per_col[col].append(tt)
        print(f"== {table} ==")
        tot_raw = tot_t = 0.0
        rows = []
        for col, rec in per_col.items():
            raw_last, enc_last, codec = rec[0], rec[1], rec[2]
            best = min(rec[3:])
            # raw bytes: sum over chunks -> recompute from all chunks
            raw = sum(m for c2, m in _raw_of(table).items() if c2 == col)
            rows.append((best, col, codec, raw, best))
            tot_t += best
        raws = _raw_of(table)
        rows = sorted(
            ((min(rec[3:]), col, rec[2], raws[col]) for col, rec in per_col.items()),
            reverse=True,
        )
        tot_raw = sum(raws.values())
        for best, col, codec, raw in rows:
            print(f"  {col:24s} {codec:12s} {best*1e3:8.2f} ms  "
                  f"{raw/1e6:8.2f} MB  {raw/best/1e6:8.1f} MB/s")
        print(f"  TOTAL {tot_t*1e3:.1f} ms  {tot_raw/1e6:.1f} MB  "
              f"{tot_raw/tot_t/1e6:.1f} MB/s/core\n")


_RAW_CACHE: dict[str, dict] = {}


def _raw_of(table: str) -> dict:
    if table not in _RAW_CACHE:
        from chimp_spark.framing import encode_chunk

        raws: dict[str, int] = {}
        for col, arr in _chunks_of(table):
            _, meta = encode_chunk(arr, codec="plain" if False else "auto", cache={})
            raws[col] = raws.get(col, 0) + meta.raw_bytes
        _RAW_CACHE[table] = raws
    return _RAW_CACHE[table]


def profile(table: str) -> None:
    import cProfile
    import pstats

    from chimp_spark.framing import encode_chunk

    chunks = list(_chunks_of(table))
    caches: dict[str, dict] = {}
    # warm (fsst training etc. once, matching steady state)
    for col, arr in chunks:
        encode_chunk(arr, codec="auto", cache=caches.setdefault(col, {}))

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(3):
        for col, arr in chunks:
            encode_chunk(arr, codec="auto", cache=caches[col])
    pr.disable()
    stats = pstats.Stats(pr)
    stats.sort_stats("cumulative").print_stats(40)


def decode_bench(tables: list[str], repeats: int = 3) -> None:
    from chimp_spark.framing import decode_chunk, encode_chunk

    for table in tables:
        blobs = []
        for col, arr in _chunks_of(table):
            blob, meta = encode_chunk(arr, codec="auto", cache={})
            blobs.append((col, blob, meta))
        per_col: dict[str, list] = {}
        for _ in range(repeats):
            t_col: dict[str, float] = {}
            for col, blob, meta in blobs:
                t0 = time.perf_counter()
                decode_chunk(blob)
                t_col[col] = t_col.get(col, 0.0) + time.perf_counter() - t0
            for col, tt in t_col.items():
                per_col.setdefault(col, []).append(tt)
        print(f"== {table} decode ==")
        raws = _raw_of(table)
        tot = 0.0
        for col in per_col:
            best = min(per_col[col])
            codec = next(m.codec for c, _b, m in blobs if c == col)
            tot += best
            print(f"  {col:24s} {codec:12s} {best*1e3:8.2f} ms  "
                  f"{raws[col]/best/1e6:8.1f} MB/s")
        print(f"  TOTAL {tot*1e3:.1f} ms  {sum(raws.values())/tot/1e6:.1f} MB/s/core\n")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    args = sys.argv[2:] or ["lineitem", "orders", "events", "documents"]
    if mode == "kernel":
        kernel_bench(args)
    elif mode == "profile":
        profile(args[0])
    elif mode == "decode":
        decode_bench(args)
