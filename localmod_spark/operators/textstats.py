"""SQL-expressible text statistics — pure column expressions, no UDFs.

These are the moderation heuristics whose semantics survive translation
to ANSI SQL / Java regex (unlike the CPython-`re`-bound scrubbers), so
they stay JVM-side inside whole-stage codegen: the caps-ratio spam
heuristic (`src/localmod/classifiers/spam.py:135`), token counting,
stop-word ratio, and length stats for the quality filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed stop-word list shared verbatim with the DuckDB oracle.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "are",
)


def caps_ratio_col(text: str = "text") -> Column:
    """ASCII-uppercase share: length(regexp_replace(text,'[^A-Z]',''))/length.
    The `[^A-Z]` class behaves identically in Java regex and RE2/DuckDB."""
    t = F.col(text)
    return F.round(
        F.length(F.regexp_replace(t, "[^A-Z]", "")) / F.greatest(F.length(t), F.lit(1)),
        6,
    )


def token_count_col(text: str = "text") -> Column:
    """Whitespace token count; 0 for empty/blank."""
    t = F.trim(F.col(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def stopword_ratio_col(text: str = "text") -> Column:
    """Share of whitespace tokens that are stop-words (lowercased)."""
    t = F.trim(F.lower(F.col(text)))
    tokens = F.split(t, r"\s+")
    stops = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda x: F.array_contains(stops, x)))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        F.round(n_stop / F.size(tokens), 6)
    )


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per-language corpus stats — a partial-aggregatable groupBy (map-side
    combine keeps the shuffle at one row per (partition, lang))."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


def doc_text_features(documents: DataFrame) -> DataFrame:
    """Per-document SQL-side heuristics (caps ratio, token count, stop-word
    ratio, spam-ish flags) — one projection, zero shuffles, fully
    whole-stage-codegen."""
    return documents.select(
        "doc_id",
        caps_ratio_col("text").alias("caps_ratio"),
        token_count_col("text").alias("n_tokens"),
        stopword_ratio_col("text").alias("stopword_ratio"),
        (F.length(F.regexp_replace(F.col("text"), "[^!?]", "")) >= 3).alias("has_punct_burst"),
        F.length("text").alias("n_chars_computed"),
    )
