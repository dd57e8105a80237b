"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k for a query vector. The
  query is a broadcast literal; the dot product is a Catalyst
  ``aggregate(zip_with(...))`` fold, so the scan stays JVM-side,
  whole-stage-codegen'd, and embarrassingly parallel. This is the
  baseline/verifier.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane signatures
  (signed projections, vectorized in Arrow batches) bucket vectors so
  a query probes only its bucket (and optionally neighboring probes).
  At 10^12 vectors the bucket join replaces the full scan.
- ``embedding_near_dup_pairs``: pairs with cosine >= threshold via
  LSH buckets + exact verification (near-dup image/text dedup shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import id_ddl


def _cosine_expr(col: str, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(F.col(col), q, lambda a, b: a * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(F.col(col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    nq = float(np.sqrt(np.dot(query, query)))
    return dot / (nv * F.lit(nq))


def cosine_topk(
    df: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity (JVM-side fold, no UDF)."""
    return (
        df.select(id_col, _cosine_expr(vec_col, query).alias("cos"))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def _dense_matrix(vecs: pa.Array, dim: int, n_rows: int) -> np.ndarray:
    """Validated (n_rows, dim) float32 matrix from an arrow
    list<float> batch column: checks nulls, ragged lengths, and
    honors array offsets — a blind ``.values`` reshape silently
    misaligns ids with vectors on sliced or ragged input."""
    if vecs.null_count:
        raise ValueError("embedding column: null vectors unsupported")
    arr = vecs.cast(pa.list_(pa.float32()))
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    lens = np.diff(offs)
    if lens.size and not (lens == dim).all():
        raise ValueError(
            f"embedding column: ragged vectors (expected dim {dim}, "
            f"got lengths {np.unique(lens)[:5]})"
        )
    child = arr.values.slice(int(offs[0]) if offs.size else 0, int(lens.sum()))
    if child.null_count:
        raise ValueError("embedding column: null elements unsupported")
    flat = np.asarray(child, dtype=np.float32)
    return flat.reshape(n_rows, dim) if n_rows else flat.reshape(0, dim)


def probe_buckets(sig: int, nbits: int, multiprobe: int) -> list[int]:
    """The query bucket plus every bucket within ``multiprobe`` bit
    flips — sum_{j<=m} C(nbits, j) probes, driver-side math only.
    Bounded at 4096 probes: past that the isin literal list bloats
    the plan and the probe set stops pruning anything."""
    from itertools import combinations
    from math import comb

    m = min(max(multiprobe, 0), nbits)
    total = sum(comb(nbits, j) for j in range(m + 1))
    if total > 4096:
        raise ValueError(
            f"multiprobe={multiprobe} over {nbits} bits expands to "
            f"{total} probe buckets (> 4096): use fewer flips, fewer "
            f"bits, or more tables"
        )
    out = {sig}
    for j in range(1, m + 1):
        for bits in combinations(range(nbits), j):
            f = sig
            for b in bits:
                f ^= 1 << b
            out.add(f)
    return sorted(out)


def _hyperplanes(dim: int, nbits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float32)


def rp_signatures(
    df: DataFrame, dim: int, nbits: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) bucket signatures.
    One matmul per Arrow batch — vectorized, deterministic."""
    from .. import _ship

    _ship.ensure(df.sparkSession)
    planes = _hyperplanes(dim, nbits, seed)
    sel = df.select(id_col, vec_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        weights = (1 << np.arange(nbits, dtype=np.int64))
        for b in batches:
            ids = b.column(0)
            mat = _dense_matrix(b.column(1), dim, b.num_rows)
            proj = mat @ planes.T  # (n, nbits)
            sig = ((proj > 0) @ weights).astype(np.int64)
            yield pa.RecordBatch.from_arrays([ids, pa.array(sig)], names=["id", "bucket"])

    # the caller's id type rides through (string url keys work, same
    # as the minhash/simhash/ann_index kernels)
    return sel.mapInArrow(kernel, f"id {id_ddl(sel)}, bucket long")


def rp_signatures_multi(
    df: DataFrame, dim: int, nbits: int, tables: int,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
) -> DataFrame:
    """(t, id, bucket) for ALL hyperplane tables in ONE corpus pass —
    a per-table rp_signatures loop costs ``tables`` full scans; here
    each Arrow batch is projected against every table's planes before
    moving on (the matmuls dominate; the scan amortizes)."""
    from .. import _ship

    _ship.ensure(df.sparkSession)
    planes_all = np.stack(
        [_hyperplanes(dim, nbits, seed + 1009 * t) for t in range(tables)]
    )
    sel = df.select(id_col, vec_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        weights = 1 << np.arange(nbits, dtype=np.int64)
        for b in batches:
            ids = b.column(0)
            mat = _dense_matrix(b.column(1), dim, b.num_rows)
            for t in range(tables):
                proj = mat @ planes_all[t].T
                sig = ((proj > 0) @ weights).astype(np.int64)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.full(b.num_rows, t, dtype=np.int32)), ids,
                     pa.array(sig)],
                    names=["t", "id", "bucket"],
                )

    return sel.mapInArrow(kernel, f"t int, id {id_ddl(sel)}, bucket long")


def ann_params(n_vectors: int, target_bucket: int = 256, tables: int = 4) -> dict:
    """Corpus-size-aware ANN configuration: nbits so the expected
    bucket holds ~target_bucket vectors (n / 2^nbits), and several
    independent tables to recover the recall a single random-hyperplane
    table loses as buckets shrink. 10^12 vectors / 256-bucket target ->
    nbits=32, tables>=4."""
    import math

    nbits = max(4, int(math.ceil(math.log2(max(n_vectors, 2) / target_bucket))))
    return {"nbits": nbits, "tables": tables}


def lsh_bucketed_topk(
    df: DataFrame, query: list[float], k: int = 10, nbits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
    multiprobe: int = 1, tables: int = 1,
) -> DataFrame:
    """ANN: probe the query's bucket plus every bucket within
    ``multiprobe`` bit flips in each of ``tables`` independent
    hyperplane tables, union the candidates, rank exactly within
    them. Recall at a given corpus size is tuned with (nbits, tables)
    — see ann_params."""
    from functools import reduce

    dim = len(query)
    q = np.asarray(query, dtype=np.float32)
    weights = 1 << np.arange(nbits, dtype=np.int64)
    conds = []
    for t in range(tables):
        planes = _hyperplanes(dim, nbits, seed + 1009 * t)
        qsig = int(((q @ planes.T) > 0) @ weights)
        conds.append(
            (F.col("t") == t)
            & F.col("bucket").isin(probe_buckets(qsig, nbits, multiprobe))
        )
    # ONE corpus pass computes every table's signatures (was one scan
    # per table); for repeated queries use ops.ann_index instead
    sigs = rp_signatures_multi(df, dim, nbits, tables, id_col, vec_col, seed)
    cand_ids = (
        sigs.filter(reduce(lambda a, b: a | b, conds))
        .select(F.col("id").alias(id_col)).distinct()
    )
    cands = df.join(cand_ids, id_col)  # AQE broadcasts the small side
    return cosine_topk(cands, query, k, id_col, vec_col)


def ivf_centroids(
    df: DataFrame, dim: int, n_centroids: int = 64, sample: int = 8192,
    iters: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 7,
) -> np.ndarray:
    """Train an IVF coarse quantizer: k-means (cosine / normalized) on
    a bounded driver-side RANDOM sample. ``limit()`` alone would read
    the first partitions only — a corpus laid out by a key correlated
    with the embedding clusters would then train every centroid on one
    region. The sample is a rand()-keyed top-k (TakeOrderedAndProject:
    each task keeps a ``sample``-row heap — ONE corpus pass, no prior
    count() pass, driver memory capped at default 8k vectors = ~2 MB
    at dim 64); centroids broadcast to executors via closure."""
    rows = (
        df.select(F.col(vec_col), F.rand(seed).alias("__r"))
        .orderBy("__r").limit(sample).drop("__r").collect()
    )
    if not rows:
        raise ValueError("ivf_centroids: empty input")
    mat = np.asarray([r[vec_col] for r in rows], dtype=np.float32)
    if mat.ndim != 2 or mat.shape[0] == 0:
        raise ValueError("ivf_centroids: empty or ragged sample")
    if mat.shape[1] != dim:
        raise ValueError(f"ivf_centroids: expected dim {dim}, got {mat.shape[1]}")
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, mat.shape[0])
    cent = mat[rng.choice(mat.shape[0], k, replace=False)].copy()
    for _ in range(iters):
        sims = mat @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(
    df: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id): nearest-centroid assignment, one matmul+argmax
    per Arrow batch. At scale this DataFrame is the IVF index — write
    it partitioned by list_id so a query scans only its probe lists."""
    from .. import _ship

    _ship.ensure(df.sparkSession)
    cent = np.ascontiguousarray(centroids, dtype=np.float32)
    dim = cent.shape[1]
    sel = df.select(id_col, vec_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0)
            mat = _dense_matrix(b.column(1), dim, b.num_rows)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            assign = ((mat / norms) @ cent.T).argmax(axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(assign)], names=["id", "list_id"]
            )

    return sel.mapInArrow(kernel, f"id {id_ddl(sel)}, list_id int")


def ivf_topk(
    df: DataFrame, centroids: np.ndarray, query: list[float], k: int = 10,
    nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: rank exactly within the query's ``nprobe`` nearest
    inverted lists. Scan cost ~ nprobe/n_centroids of the corpus; the
    recall/cost knob is (n_centroids, nprobe)."""
    q = np.asarray(query, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[:nprobe].tolist()
    assign = ivf_assign(df, centroids, id_col, vec_col)
    cand_ids = assign.filter(F.col("list_id").isin(probes)).select(
        F.col("id").alias(id_col)
    )
    cands = df.join(cand_ids, id_col)  # AQE broadcasts the small side
    return cosine_topk(cands, query, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95, nbits: int = 12, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
    tables: int = 1,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH bucket equi-join -> exact cosine
    verify (array ops). Bucket join bounds the candidate set; scale
    recall/cost with (nbits, tables) — see ann_params. All tables'
    signatures come from ONE corpus pass and one (t, bucket) self-join
    (was one scan + join per table)."""
    sigs = rp_signatures_multi(df, dim, nbits, tables, id_col, vec_col, seed)
    pairs = (
        sigs.alias("l")
        .join(
            sigs.alias("r"),
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    j = (
        pairs.join(vecs.withColumnRenamed("id", "a").withColumnRenamed("v", "va"), "a")
        .join(vecs.withColumnRenamed("id", "b").withColumnRenamed("v", "vb"), "b")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    return (
        j.withColumn("cos", dot / (norm("va") * norm("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
