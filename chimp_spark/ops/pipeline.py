"""End-to-end training-corpus preparation: the composition every
large-scale data pipeline runs, built from the engine's own ops.

    raw documents
      -> exact dedup          (128-bit hash keys, one shuffle)
      -> near-dup dedup       (MinHash -> LSH bands -> verify ->
                               connected components -> keep min id)
      -> quality + language   (narrow Catalyst filters)
      -> decontamination      (optional: n-gram overlap vs a held-out
                               eval set, eval grams broadcast)
      -> split assignment     (deterministic md5 intervals — append
                               stable, engine-reproducible)
      -> encode + commit      (EncodedTable snapshot, chunk lineage,
                               partition-granular RESUME)

Every stage is deterministic, so the whole pipeline is reproducible
and auditable: rerunning yields the same surviving ids, the same
splits, and (via the manifest) resumes the encode instead of redoing
it. Stage counts are returned for pipeline observability — a 100 TB
run tracks shrinkage per stage, not just the final row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D
from . import sample as S
from . import text as T


def prepare_corpus(
    spark: SparkSession,
    df: DataFrame,
    out_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup_threshold: float = 0.9,
    min_quality: float = 0.0,
    langs: list[str] | None = None,
    eval_df: DataFrame | None = None,
    decontam_ngram: int = 8,
    split_weights: dict[str, float] | None = None,
    table_name: str = "documents",
    chunk_rows: int = 65_536,
    resume: bool = True,
    encode_columns: list[str] | None = None,
    stage_counts: bool = True,
) -> dict:
    """Run the full preparation chain and commit the encoded corpus to
    ``out_root`` (an EncodedTable root). Returns per-stage counts plus
    the commit stats.

    The dedup/filter/split stages are deterministic transformations —
    rerunning them reproduces the same surviving set, so resume only
    needs to exist where the expensive, stateful work happens: the
    encode commit (partition-granular via the table snapshot).

    ``langs`` filters on the engine's own ``lang_id`` prediction (not a
    trusted input column); ``min_quality`` on ``quality_score``. Both
    default to keeping everything. ``eval_df`` (id + text of a held-out
    benchmark set) enables decontamination: train docs sharing any
    ``decontam_ngram``-gram with the eval set are dropped before the
    split (the eval grams broadcast; the corpus never shuffles).

    ``stage_counts=True`` records per-stage survivor counts. Each
    intermediate count materializes that stage once more, so a run that
    only needs the output can pass ``stage_counts=False`` and pay a
    single count (used to size the encode layout) over the final set.
    """
    from .. import engine

    counts: dict[str, int] = {}
    cached: list[DataFrame] = []
    if stage_counts:
        counts["input"] = df.count()

    try:
        # min-id canonical pick: deterministic across reruns, which the
        # encode commit's partition-granular resume depends on
        step = D.exact_dedup_canonical(df, id_col, [text_col])
        # persist REGARDLESS of stage_counts: the minhash chain below
        # consumes this frame 4+ times (signatures, both verify joins,
        # the keep anti-join) — without it the cheap-mode run re-executes
        # the full-corpus dedup window shuffle for each consumer
        step = step.persist()
        cached.append(step)
        if stage_counts:
            counts["after_exact_dedup"] = step.count()

        step = D.minhash_dedup(step, id_col, text_col, threshold=near_dup_threshold)
        # persist: consumed by the count, the filters, and the encode
        step = step.persist()
        cached.append(step)
        if stage_counts:
            counts["after_near_dedup"] = step.count()

        if min_quality > 0.0:
            scored = T.quality_score(step, text_col)
            step = scored.filter(F.col("quality") >= min_quality).select(*step.columns)
        if langs:
            pred = T.lang_id(step, text_col)
            step = pred.filter(F.col("lang_pred").isin(langs)).select(*step.columns)
        if eval_df is not None:
            if stage_counts:
                counts["after_filters"] = step.count()
            from . import decontam as DC

            step = DC.decontaminate(
                step, eval_df, id_col, text_col, n=decontam_ngram
            )
        n_out = step.count()
        counts["after_filters" if eval_df is None else "after_decontam"] = n_out

        weights = split_weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
        step = S.train_test_split(step, weights, [id_col])

        # Encode chunking is per physical partition: left on the dedup
        # output's shuffle layout, a 100 TB run would commit millions of
        # near-empty chunks (metadata blowup) or, worse, few giant ones.
        # The layout must be (a) a PURE FUNCTION of the data — the
        # manifest's partition-granular resume assumes a rerun reproduces
        # partition membership, which rules out repartitionByRange (its
        # boundaries come from sampling upstream partitions whose
        # shuffle-fetch row order is not stable across runs) and
        # round-robin repartition(n); and (b) SPLIT-CLUSTERED so
        # decode_table_to_parquet(predicate=("split", ...)) zone-prunes a
        # split export instead of reading the whole corpus (hash-of-id
        # alone interleaves splits in every chunk). Both: hash-partition
        # on (split, bucket) where bucket = xxhash64(id) mod the split's
        # expected chunk count (a pure value function — the bucket counts
        # derive from the configured weights and n_out, not from
        # sampling). Each (split, bucket) group is ~chunk_rows rows and
        # lands whole in one partition, so partitions hold a Poisson-few
        # split-pure groups (bounded size, no giant partitions); the sort
        # within keeps same-split rows contiguous, so chunks mix splits
        # only at group boundaries.
        cols = (encode_columns or df.columns) + ["split"]
        wsum = sum(weights.values()) or 1.0
        buckets = {
            s: max(1, -(-int(round(n_out * w / wsum)) // chunk_rows))
            for s, w in weights.items()
        }
        n_parts = sum(buckets.values())
        bucket = None
        for s, b in buckets.items():
            cond = F.col("split") == s
            val = F.pmod(F.xxhash64(F.col(id_col)), F.lit(b))
            bucket = F.when(cond, val) if bucket is None else bucket.when(cond, val)
        step = (
            step.select(*cols)
            .repartition(n_parts, F.col("split"), bucket.otherwise(F.lit(0)))
            .sortWithinPartitions("split", id_col)
        )
        commit = engine.encode_and_commit(
            spark, step, out_root, table_name,
            chunk_rows=chunk_rows, resume=resume,
        )
    finally:
        # dead the moment the commit lands — do not pin the corpus in
        # executor storage for the rest of the session
        for c in cached:
            c.unpersist()
    return {"counts": counts, "commit": commit, "columns": cols,
            "weights": weights, "out_root": out_root,
            "encode_partitions": n_parts}
