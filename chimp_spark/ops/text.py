"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in Catalyst functions (split,
filter-lambda, md5, regexp) — no Python UDFs — so they stay inside
whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenizer (matches DuckDB string_split semantics for
    single-space text; BPE-ish subword counting is `bpe_token_count`)."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Cheap BPE-like token estimate: words + extra tokens for long
    words (a word of length L costs ~ceil(L/4) subword tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        tokens(c),
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.ceil(F.length(w) / 4).cast("int"), F.lit(1)),
    )


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS[lang])))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/word/stopword quality features, one projection."""
    toks = tokens(text_col)
    return df.withColumns(
        {
            "n_bytes": F.length(text_col),
            "n_tokens": F.size(toks),
            "avg_token_len": F.length(text_col) / F.greatest(F.size(toks), F.lit(1)),
            "stopword_ratio": stopword_ratio(text_col, "en"),
            "upper_ratio": (
                F.length(F.regexp_replace(F.col(text_col), "[^A-Z]", ""))
                / F.greatest(F.length(text_col), F.lit(1))
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score (documented, deterministic weights)."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / 64.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("upper_ratio") * 5.0, F.lit(1.0))) * 0.2
    )
    return feats.withColumn("quality", score)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint (md5 of the raw text)."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def ngram_counts(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Corpus word-n-gram frequencies -> (gram, cnt). The n-gram
    generation is a narrow map (see ops/decontam.word_ngrams — whole
    stage codegen, short-text guarded); the count is one map-side
    combinable groupBy whose shuffle moves (gram, partial-count) pairs,
    never documents. Top-k consumers should order by (cnt DESC, gram)
    for a deterministic cut."""
    from .decontam import word_ngrams

    return (
        df.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: argmax over per-language
    stopword ratios; 'und' (undetermined) when no list scores >0.
    Pure Catalyst expressions (one pass, no shuffle)."""
    toks = tokens(text_col)

    def _hits(lang: str):
        # single-arg lambda: F.filter treats 2-arg lambdas as (elem, idx)
        words = STOPWORDS[lang]
        return F.size(F.filter(toks, lambda w: w.isin(words)))

    scores = [_hits(lang).alias(f"_s_{lang}") for lang in STOPWORDS]
    scored = df.select("*", *scores)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"_s_{la}") for la in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for la in langs:
        pick = pick.when(F.col(f"_s_{la}") == best, F.lit(la))
    out = scored.withColumn("lang_pred", pick)
    return out.drop(*[f"_s_{la}" for la in langs])
