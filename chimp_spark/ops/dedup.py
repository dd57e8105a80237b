"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the shapes a large-scale training-data pipeline needs.

Scale notes (the designs assume 10^9+ documents):
- exact: hash-groupBy (map-side combinable; one shuffle on the hash,
  never on the full text).
- MinHash+LSH: signatures are computed in an Arrow-vectorized kernel
  (numpy over all shingles of a batch at once — no per-row Python),
  then banding turns near-dup search into an equi-join on (band,
  band_hash): cheap shuffle keys, no O(n^2) pair generation. Candidate
  pairs are verified with exact shingle Jaccard (array_intersect /
  array_union — JVM-side).
- SimHash: 64-bit signature, bucketed by 4x16-bit sub-keys (any pair
  within Hamming distance 3 shares at least one sub-key).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import id_ddl

# deterministic 64-bit hash mixing constants (splitmix64)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _SM_GAMMA).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


def exact_duplicates(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", max_ids: int = 100
) -> DataFrame:
    """Groups of byte-identical values with multiplicity > 1 ->
    (h1, h2, ln, copies, sample_ids).

    Aggregates on two independent 64-bit hashes + length (a 20-byte
    shuffle key, 128 effective hash bits — collision-free in practice,
    unlike a single xxhash64 whose within-length-class collisions are
    non-negligible at 10^10 docs) — never on the value itself, so at
    100 TB the shuffle moves keys+ids, not the corpus. Per-column null
    flags are mixed in because Spark's xxhash64 SKIPS null inputs.

    Output rows are BOUNDED: ``sample_ids`` holds at most ``max_ids``
    exemplars per group (rank-filtered *before* the collect, so the
    aggregation buffer itself is bounded); ``copies`` carries the full
    multiplicity. A pathologically hot value (a boilerplate page with
    10^8 copies) therefore costs one ordinary row, not a multi-GB one.
    """
    from pyspark.sql import Window

    nullf = F.col(col).isNull().cast("int")
    keyed = df.select(
        F.col(id_col),
        F.xxhash64(col, nullf).alias("h1"),
        F.xxhash64(F.lit("cs2"), col, nullf).alias("h2"),
        F.length(col).alias("ln"),
    )
    key = ["h1", "h2", "ln"]
    w = Window.partitionBy(*key)
    ranked = keyed.withColumn("copies", F.count("*").over(w)).withColumn(
        "rn", F.row_number().over(w.orderBy(id_col))
    )
    # the groupBy reuses the window's hash partitioning — one exchange
    return (
        ranked.filter((F.col("copies") > 1) & (F.col("rn") <= max_ids))
        .groupBy(*key, "copies")
        .agg(F.sort_array(F.collect_list(id_col)).alias("sample_ids"))
    )


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one row per distinct (cols) combination.

    Dedup key is a pair of independent 64-bit hashes (128-bit combined
    — collision-free in practice), so the shuffle HASHES and compares
    16 bytes per row instead of the full values; the surviving rows
    still move once, which is the lower bound for a dedup that returns
    rows.

    Spark's xxhash64 SKIPS null inputs (the running hash is left
    unchanged), so (x, null) and (null, x) would collide on both
    hashes deterministically; per-column null flags are mixed into
    each hash to keep null placement significant."""
    null_flags = [F.col(c).isNull().cast("int") for c in cols]
    h1 = F.xxhash64(*cols, *null_flags)
    h2 = F.xxhash64(F.lit("cs2"), *cols, *null_flags)
    return (
        df.withColumn("__h1", h1)
        .withColumn("__h2", h2)
        .dropDuplicates(["__h1", "__h2"])
        .drop("__h1", "__h2")
    )


def exact_dedup_canonical(df: DataFrame, id_col: str, cols: list[str]) -> DataFrame:
    """Deterministic exact dedup: keep the MIN-``id_col`` row per
    distinct (cols) combination (same 128-bit hash key as
    ``exact_dedup``).

    ``exact_dedup``'s dropDuplicates keeps whichever copy the shuffle
    happens to fetch first — fine for one-shot jobs, but a resumable
    pipeline reruns its dedup stage on retry, and a DIFFERENT survivor
    would land in a different partition/split than the one already
    committed. The min-id pick is a pure function of the data, so a
    rerun reproduces the surviving set exactly (the same canonical
    rule minhash/chargram cluster resolution uses). Cost: the same
    single hash-key shuffle; rows move once either way."""
    from pyspark.sql import Window

    null_flags = [F.col(c).isNull().cast("int") for c in cols]
    w = Window.partitionBy(
        F.xxhash64(*cols, *null_flags), F.xxhash64(F.lit("cs2"), *cols, *null_flags)
    ).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_HASH_PREFIX = 16  # hash first 16 bytes of each token + its length


def _tokenize_batch(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-native whitespace tokenization of a string batch ->
    (word_hashes: uint64 flat array, doc_offsets into it).

    Deterministic (FNV-1a over the first 16 bytes + length, mixed with
    splitmix64) and vectorized: C-level split, then ``_HASH_PREFIX``
    byte-lane passes over a (n_words, 16) matrix — no per-word Python.
    """
    import pyarrow.compute as pc

    lists = pc.split_pattern(texts, " ")
    flat = lists.values
    doc_offsets = np.frombuffer(lists.buffers()[1], dtype=np.int32)[
        lists.offset : lists.offset + len(lists) + 1
    ].astype(np.int64)

    n = len(flat)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), doc_offsets
    bufs = flat.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        flat.offset : flat.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    lens = np.diff(offs)
    take = np.minimum(lens, _HASH_PREFIX)
    mat = np.zeros((n, _HASH_PREFIX), dtype=np.uint8)
    total = int(take.sum())
    if total:
        row = np.repeat(np.arange(n, dtype=np.int64), take)
        ends = np.cumsum(take)
        col = np.arange(total, dtype=np.int64) - np.repeat(ends - take, take)
        mat[row, col] = data[np.repeat(offs[:-1], take) + col]
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    for j in range(_HASH_PREFIX):
        h = (h ^ mat[:, j]) * _FNV_PRIME
    h ^= lens.astype(np.uint64) << np.uint64(1)
    h = _splitmix64(h)
    keep = lens > 0
    if not bool(keep.all()):
        # split_pattern emits EMPTY tokens for empty strings and
        # repeated spaces; keeping them gives every empty/whitespace
        # doc the same padded shingles — identical signatures that
        # band-collide into O(m^2) candidates. Dropping them makes a
        # word-less doc yield ZERO shingles (all-zero signature),
        # which the band join filters out.
        ndocs = doc_offsets.size - 1
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), np.diff(doc_offsets))
        counts = np.bincount(doc_idx[keep], minlength=ndocs)
        new_off = np.zeros(ndocs + 1, dtype=np.int64)
        np.cumsum(counts, out=new_off[1:])
        return h[keep], new_off
    return h, doc_offsets


def _shingle_hashes(
    word_h: np.ndarray, doc_offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling word-k-gram hashes per doc with per-doc zero padding
    (each doc yields exactly its word count of shingles, so results
    are independent of batch layout). Returns (flat shingles,
    shingle_offsets per doc)."""
    nw = np.diff(doc_offsets)
    ndocs = nw.size
    if word_h.size == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(ndocs + 1, dtype=np.int64)
    pad = k - 1
    ext_off = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(nw + pad, out=ext_off[1:])
    ext = np.zeros(int(ext_off[-1]), dtype=np.uint64)
    dst = np.arange(word_h.size, dtype=np.int64) + np.repeat(
        pad * np.arange(ndocs, dtype=np.int64), nw
    )
    ext[dst] = word_h
    acc = _splitmix64(ext.copy())
    for j in range(1, k):
        shifted = np.zeros_like(ext)
        shifted[:-j] = ext[j:]
        acc = _splitmix64(acc ^ shifted)
    # shingle i of doc d sits at ext position ext_off[d] + i, i < nw[d]
    sh_off = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(nw, out=sh_off[1:])
    return acc[dst], sh_off


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """-> (id, sig: array<bigint>) via an Arrow-vectorized kernel.

    MinHash estimate: sig_i = min over shingles of h_i(shingle), with
    h_i(x) = splitmix64(x ^ seed_i). The per-doc min over all hash
    lanes is one (n_shingles x num_hashes) numpy reduction.
    """
    from .. import _ship

    _ship.ensure(df.sparkSession)
    seeds = _splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64))
    sel = df.select(id_col, text_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0)
            word_h, doc_off = _tokenize_batch(b.column(1))
            sh, sh_off = _shingle_hashes(word_h, doc_off, shingle_k)
            ndocs = b.num_rows
            empty = np.diff(sh_off) == 0
            # reduceat over NON-empty docs only: their starts are all
            # < sh.size and consecutive segments end exactly at the
            # next non-empty doc's start (empty docs contribute no
            # shingles in between), so no clamping is needed —
            # clamping would split the last doc's segment when a
            # batch ends with empty/null docs
            nz = np.flatnonzero(~empty)
            sigs = np.zeros((ndocs, num_hashes), dtype=np.uint64)
            if sh.size and nz.size:
                starts = sh_off[:-1][nz]
                for j in range(num_hashes):  # lane-at-a-time: O(shingles) mem
                    lane = _splitmix64(sh ^ seeds[j])
                    sigs[nz, j] = np.minimum.reduceat(lane, starts)
            sig_list = pa.FixedSizeListArray.from_arrays(
                pa.array((sigs >> np.uint64(1)).astype(np.int64).ravel()), num_hashes
            ).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays([ids, sig_list], names=["id", "sig"])

    _idt = id_ddl(sel)
    return sel.mapInArrow(kernel, f"id {_idt}, sig array<long>")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4,
    sig_col: str = "sig",
) -> DataFrame:
    """Band the signatures and equi-join on (band, band_key) -> (a, b)
    candidate pairs (a < b). Shuffle key is a 2-int tuple, never text.
    Works over any bottom-sketch column (word MinHash ``sig``, chargram
    ``fp``) — the banding algebra is sketch-agnostic.

    ALL-ZERO signatures (docs with no shingles/k-grams: empty, null,
    or shorter than the window) are dropped first: they'd all collide
    in every band, and 10^6 empty crawl docs would materialize ~10^12
    candidate rows — the O(n^2) blowup banding exists to avoid.
    Empty-doc dedup is exact_dedup's job (byte-identical), not a
    similarity question. Large groups of byte-identical NON-empty
    docs have the same quadratic shape, which is why every end-to-end
    lane documents exact-dedup-first."""
    signatures = signatures.filter(
        F.exists(sig_col, lambda x: x != F.lit(0))
    )
    banded = signatures.select(
        "id",
        F.posexplode(
            F.array(*[
                F.xxhash64(*[F.col(sig_col)[b * rows_per_band + r] for r in range(rows_per_band)])
                for b in range(bands)
            ])
        ).alias("band", "band_key"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def shingle_array(text_col: str, k: int = 3) -> F.Column:
    """Word k-gram array, built entirely with Catalyst expressions."""
    toks = F.split(F.col(text_col), " ")
    n = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]),
    )


def verify_jaccard(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str,
    threshold: float = 0.9, k: int = 3,
) -> DataFrame:
    """Exact word-shingle Jaccard on candidate pairs (JVM set ops)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingle_array(text_col, k)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "sh_b"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle -> minhash -> band ->
    bucket-join -> exact-Jaccard verify."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: trailing "
            f"hashes would be silently dropped, changing candidate recall "
            f"from the documented 1-(1-t^r)^b"
        )
    sigs = minhash_signatures(df, id_col, text_col, num_hashes=num_hashes)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=num_hashes // bands)
    return verify_jaccard(cands, df, id_col, text_col, threshold=threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 3,
    use_lsh: bool = True,
) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs.

    ``use_lsh=True`` (the scale path) generates candidates via
    MinHash banding then verifies with exact Jaccard; ``use_lsh=False``
    is the brute-force all-pairs variant (ground truth / small data).
    Both return (a, b, jaccard) with exact Jaccard values.
    """
    if use_lsh:
        return minhash_dedup_pairs(df, id_col, text_col, threshold=threshold)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingle_array(text_col, k)).alias("sh"),
    )
    pairs = sh.alias("l").join(sh.alias("r"), F.col("l.id") < F.col("r.id")).select(
        F.col("l.id").alias("a"), F.col("r.id").alias("b"),
        (
            F.size(F.array_intersect("l.sh", "r.sh"))
            / F.greatest(F.size(F.array_union("l.sh", "r.sh")), F.lit(1))
        ).alias("jaccard"),
    )
    return pairs.filter(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_iter: int = 25,
) -> DataFrame:
    """(id, comp) for every id in ``pairs``; comp = min id reachable.

    Iterative min-label propagation WITH pointer jumping: each round a
    vertex takes the min over (its own label, its neighbors' labels,
    its label's label). The neighbor messages guarantee the true
    component min is eventually found; the label self-join halves
    label-path lengths every round, so convergence is O(log diameter)
    rounds — a 10^7-long chain of templated crawl boilerplate converges
    in ~24 rounds, where plain one-hop propagation would need 10^7.
    Labels are localCheckpoint'ed every round: iterative Spark plans
    otherwise grow lineage exponentially and re-execute prior rounds.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass while labels
    are still changing — returning partially-merged labels would make
    downstream dedup silently keep rows it should drop.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionAll(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("comp")
        )
        # pointer jumping: comp values are vertex ids of the same
        # component (labels only ever shrink toward the component min),
        # so comp-of-comp is a valid, usually-smaller candidate label
        jump = (
            labels.alias("l1")
            .join(labels.alias("l2"), F.col("l1.comp") == F.col("l2.id"))
            .select(F.col("l1.id").alias("id"), F.col("l2.comp").alias("comp"))
        )
        new = (
            labels.select("id", "comp").unionAll(msgs).unionAll(jump)
            .groupBy("id").agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n").join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp")).limit(1).count()
        )
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(labels still changing) — raise max_iter; returning partial "
            f"labels would under-merge duplicate clusters"
        )
    return labels


def dedup_keep_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    a_col: str = "a", b_col: str = "b",
) -> DataFrame:
    """Resolve duplicate PAIRS into clusters and keep one canonical
    row per cluster (the min id) — the step that turns near-dup
    detection into an actually deduplicated corpus. Rows in no pair
    are kept untouched (left-anti semantics, no full-corpus shuffle
    beyond the join on the id)."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.filter(F.col("comp") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def minhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.9, num_hashes: int = 64, bands: int = 16,
) -> DataFrame:
    """End-to-end near-dup corpus dedup: shingle -> MinHash -> banded
    LSH -> exact-Jaccard verify -> connected components -> keep the
    min-id document of every duplicate cluster. Deterministic (hash
    seeds fixed, canonical = min id), so the result is reproducible
    and oracle-checkable."""
    pairs = minhash_dedup_pairs(df, id_col, text_col, threshold, num_hashes, bands)
    return dedup_keep_canonical(df, pairs, id_col)


def simhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, n_docs: int | None = None,
    words: int | None = None,
) -> DataFrame:
    """End-to-end SimHash near-dedup: signatures -> banded candidate
    pairs -> exact Hamming verify -> connected components -> keep the
    min-id document per cluster. The Hamming-distance counterpart of
    ``minhash_dedup`` (cheaper signatures, coarser similarity) with
    the same deterministic canonical rule.

    Pass either ``words`` (the signature width, see
    ``simhash_signatures``) or ``n_docs`` (corpus size; picks the
    scale-appropriate width via ``simhash_params``)."""
    if words is None:
        if n_docs is None:
            raise TypeError("simhash_dedup: pass words= or n_docs=")
        words = simhash_params(n_docs, max_hamming)["words"]
    sigs = simhash_signatures(df, id_col, text_col, words=words)
    pairs = simhash_candidate_pairs(sigs, max_hamming=max_hamming, words=words)
    return dedup_keep_canonical(df, pairs, id_col)


def chargram_minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, num_hashes: int = 16,
) -> DataFrame:
    """Rolling-hash document fingerprints: Karp-Rabin hashes of every
    k-byte window (ONE vectorized polynomial pass over the batch's
    flat UTF-8 buffer — O(k) shifted adds, no per-doc Python), then a
    bottom-sketch per doc (min over ``num_hashes`` independent
    remixes). Character-level, so it fingerprints texts that word
    tokenizers miss (no spaces, CJK, code) and survives reformatting
    that preserves byte runs. Same sketch algebra as word MinHash:
    P(lane equal) = k-gram resemblance; identical docs -> identical
    fingerprint. -> (id, fp: array<bigint>)."""
    from .. import _ship

    _ship.ensure(df.sparkSession)
    seeds = _splitmix64(np.arange(501, 501 + num_hashes, dtype=np.uint64))
    B = np.uint64(1099511628211)  # FNV prime as the polynomial base
    sel = df.select(id_col, text_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0)
            texts = b.column(1).cast(pa.binary())
            n = b.num_rows
            bufs = texts.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int32)[
                texts.offset : texts.offset + n + 1
            ].astype(np.int64)
            flat = (
                np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
                if bufs[2] is not None else np.zeros(0, np.uint8)
            )
            offs = offs - offs[0]
            total = flat.size
            # Karp-Rabin over the whole flat buffer: H[i] = sum_j
            # flat[i+j] * B^(k-1-j) (mod 2^64), k shifted adds
            nwin = max(total - k + 1, 0)
            H = np.zeros(nwin, dtype=np.uint64)
            for j in range(k):
                H *= B
                H += flat[j : j + nwin].astype(np.uint64)
            H = _splitmix64(H)
            lens = np.diff(offs)
            sigs = np.zeros((n, num_hashes), dtype=np.uint64)
            starts = offs[:-1]
            counts = np.maximum(lens - k + 1, 0)
            nz = np.flatnonzero(counts > 0)
            if nz.size:
                # windows crossing doc boundaries are INVALID: mask
                # them to u64::MAX so a reduceat segment (which runs to
                # the next doc's start) can never pick one as its min
                marks = np.zeros(nwin + 1, dtype=np.int32)
                np.add.at(marks, starts[nz], 1)
                np.add.at(marks, starts[nz] + counts[nz], -1)
                invalid = np.cumsum(marks[:-1]) <= 0
                for lane in range(num_hashes):
                    mixed = _splitmix64(H[:nwin] ^ seeds[lane])
                    mixed[invalid] = np.uint64(0xFFFFFFFFFFFFFFFF)
                    sigs[nz, lane] = np.minimum.reduceat(mixed, starts[nz])
            short = np.flatnonzero((counts == 0) & (lens > 0))
            if short.size:
                # docs shorter than k: deterministic whole-doc hash
                # (polynomial over their bytes) remixed per lane
                sh = np.zeros(short.size, dtype=np.uint64)
                for d_i, d in enumerate(short):
                    h = np.uint64(0)
                    for byte in flat[offs[d] : offs[d + 1]]:
                        h = h * B + np.uint64(byte)
                    sh[d_i] = h
                for lane in range(num_hashes):
                    sigs[short, lane] = _splitmix64(sh ^ seeds[lane])
            yield pa.RecordBatch.from_arrays(
                [ids, pa.FixedSizeListArray.from_arrays(
                    pa.array((sigs >> np.uint64(1)).astype(np.int64).ravel()),
                    num_hashes,
                ).cast(pa.list_(pa.int64()))],
                names=["id", "fp"],
            )

    _idt = id_ddl(sel)
    return sel.mapInArrow(kernel, f"id {_idt}, fp array<long>")


def chargram_array(text_col: str, k: int = 8) -> F.Column:
    """All k-byte character windows of a string, pure Catalyst
    (``substr`` over a ``sequence``). Docs shorter than ``k`` yield
    their whole text as the single gram — the same fallback the
    rolling-hash fingerprints use, so verify and sketch agree."""
    n = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n.cast("int")),
        lambda i: F.col(text_col).substr(i, F.lit(k)),
    )


def verify_chargram_jaccard(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str,
    threshold: float = 0.8, k: int = 8,
) -> DataFrame:
    """Exact character-k-gram set Jaccard on candidate pairs (JVM set
    ops) — the character-level twin of verify_jaccard for corpora word
    tokenizers can't split (no spaces, CJK, code)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(chargram_array(text_col, k)).alias("sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "sh_b"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def chargram_dedup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, k: int = 8, num_hashes: int = 16, bands: int = 8,
) -> DataFrame:
    """Character-level near-dup pairs: rolling-hash k-gram bottom
    sketches -> banding equi-join -> exact chargram-Jaccard verify.
    Candidate recall at the threshold: 1-(1-t^r)^b with r =
    num_hashes/bands (defaults: t=0.8, r=2, b=8 -> 0.9997)."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: trailing "
            f"hashes would be silently dropped, changing candidate recall "
            f"from the documented 1-(1-t^r)^b"
        )
    fps = chargram_minhash_signatures(df, id_col, text_col, k=k, num_hashes=num_hashes)
    cands = lsh_candidate_pairs(
        fps, bands=bands, rows_per_band=num_hashes // bands, sig_col="fp"
    )
    return verify_chargram_jaccard(cands, df, id_col, text_col, threshold, k)


def chargram_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, k: int = 8, num_hashes: int = 16, bands: int = 8,
) -> DataFrame:
    """END-TO-END character-level corpus dedup: the no-space/CJK/code
    twin of minhash_dedup. Rolling-hash sketches -> banded LSH ->
    exact chargram-Jaccard verify -> connected components -> keep the
    min-id document per duplicate cluster. Deterministic and
    oracle-checkable (brute-force chargram Jaccard + transitive
    closure reproduce the surviving id set)."""
    pairs = chargram_dedup_pairs(df, id_col, text_col, threshold, k, num_hashes, bands)
    return dedup_keep_canonical(df, pairs, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_params(n_docs: int, max_hamming: int = 3) -> dict:
    """Corpus-size-aware SimHash configuration.

    Pigeonhole needs ``max_hamming + 1`` disjoint bands; expected
    spurious collisions per band are ~n^2 / 2^band_bits, so the band
    key must be >= 2*log2(n) bits to keep bucket joins linear. A
    64-bit signature caps bands at 16 bits — fine to ~10^6 docs; past
    that, use one 64-bit word PER BAND (multi-word signature)."""
    if n_docs <= 1 << 20:
        return {"words": 1}
    return {"words": max_hamming + 1}


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    words: int = 1,
) -> DataFrame:
    """SimHash over word hashes (vectorized popcount-style sum).

    ``words`` 64-bit words are computed from independently re-mixed
    token hashes -> a ``words*64``-bit signature. words=1 keeps the
    classic 64-bit shape; words=max_hamming+1 gives 64-bit band keys
    for web-scale corpora (see simhash_params)."""
    from .. import _ship

    _ship.ensure(df.sparkSession)
    sel = df.select(id_col, text_col)
    wseeds = _splitmix64(np.arange(101, 101 + words, dtype=np.uint64))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0)
            word_h, doc_off = _tokenize_batch(b.column(1))
            ndocs = b.num_rows
            nw = np.diff(doc_off)
            out = np.zeros((ndocs, words), dtype=np.uint64)
            nz = np.flatnonzero(nw > 0)
            if word_h.size and nz.size:
                starts = doc_off[:-1][nz]  # non-empty docs only (see
                # minhash_signatures: clamped starts split segments)
                for w in range(words):
                    wh = word_h if w == 0 else _splitmix64(word_h ^ wseeds[w])
                    for bit in range(64):
                        ones = ((wh >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
                        votes = np.add.reduceat(ones, starts)
                        out[nz, w] |= np.uint64(1 << bit) * (2 * votes > nw[nz])
            sig = pa.FixedSizeListArray.from_arrays(
                pa.array((out >> np.uint64(1)).astype(np.int64).ravel()), words
            ).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays([ids, sig], names=["id", "simhash"])

    _idt = id_ddl(sel)
    return sel.mapInArrow(kernel, f"id {_idt}, simhash array<long>")


def simhash_candidate_pairs(
    sigs: DataFrame, max_hamming: int = 3, bands: int | None = None,
    words: int | None = None,
) -> DataFrame:
    """Bucket by disjoint signature bands (pigeonhole: Hamming <=
    max_hamming pairs share at least one of max_hamming+1 bands),
    verify exact Hamming distance with bit ops.

    ``words`` is REQUIRED (the word count used in
    ``simhash_signatures(words=...)``): plan construction stays lazy —
    no sniffing job runs before the caller's action.

    Single-word signatures band into ``bands`` (default
    max_hamming+1) sub-keys of 64/bands bits; multi-word signatures
    use one whole 64-bit word per band — the web-scale shape where
    bucket sizes stay O(1) at 10^9+ docs."""
    sig = F.col("simhash")
    # all-zero signatures = token-less docs; see lsh_candidate_pairs
    # for why they must not enter the band join
    keyed = sigs.select("id", "simhash").filter(
        F.exists("simhash", lambda x: x != F.lit(0))
    )
    if words is None:
        raise TypeError(
            "simhash_candidate_pairs: 'words' is required (pass the value "
            "given to simhash_signatures(words=...)); inferring it would "
            "run an eager job at plan-construction time"
        )
    n_words = words
    if n_words > 1:
        # multi-word signatures: one whole 64-bit word per band. The
        # pigeonhole guarantee needs max_hamming+1 DISTINCT bands —
        # reusing a word across bands would silently lose recall.
        if n_words < max_hamming + 1:
            raise ValueError(
                f"simhash: {n_words}-word signatures support max_hamming "
                f"<= {n_words - 1}; generate words={max_hamming + 1} signatures"
            )
        if bands is not None and bands != n_words:
            raise ValueError("simhash: multi-word signatures band one word per band")
        nb = n_words
    else:
        nb = bands or (max_hamming + 1)
    width = 64 // nb
    pairs = None
    for i in range(nb):
        if n_words > 1:
            band_key = F.element_at(sig, i + 1)
        elif width >= 64:
            band_key = F.element_at(sig, 1)  # single band = whole word
        else:
            band_key = F.shiftrightunsigned(F.element_at(sig, 1), width * i).bitwiseAND(
                F.lit((1 << width) - 1)
            )
        k = keyed.withColumn("bk", band_key)
        l = k.alias("l")
        r = k.alias("r")
        p = l.join(
            r, (F.col("l.bk") == F.col("r.bk")) & (F.col("l.id") < F.col("r.id"))
        ).select(
            F.col("l.id").alias("a"), F.col("r.id").alias("b"),
            F.col("l.simhash").alias("sa"), F.col("r.simhash").alias("sb"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    ham = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0), lambda acc, x: acc + x,
    )
    return (
        pairs.distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
