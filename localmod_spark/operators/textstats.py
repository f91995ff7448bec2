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


def train_char_bigram_lm(documents: DataFrame, text_col: str = "text"):
    """Fit the quality scorer's character-bigram LM on the corpus itself,
    distributed (the KenLM-style step done Spark-first).

    Map side: one 28×28 count matrix per Arrow batch (mapInPandas emits a
    single 784-long array row per batch — thousands of texts collapse to
    one row before anything shuffles).  Driver side: sum the per-batch
    matrices (a few KB each), apply add-one smoothing and row-normalize
    via :func:`localmod_spark.kernel.quality.logprob_table`.

    Returns the (28, 28) log-probability ndarray — a model parameter.
    Plug it into ``char_perplexity(text, logprob_flat=table.reshape(-1))``
    or any scorer that accepts a custom table.  At 100 TB this is one
    narrow pass with a ~3 KB-per-task reduce — train on the full corpus
    or a sample, identical plan shape.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    from localmod_spark.kernel.quality import _N_SYMBOLS, bigram_counts, logprob_table

    out_schema = StructType([StructField("counts", ArrayType(LongType()), False)])

    def _count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = np.zeros((_N_SYMBOLS, _N_SYMBOLS))
            for t in pdf[text_col].fillna(""):
                acc += bigram_counts(t)
            yield pd.DataFrame({"counts": [acc.reshape(-1).astype(np.int64).tolist()]})

    rows = documents.select(text_col).mapInPandas(_count_batches, schema=out_schema).collect()
    total = np.zeros(_N_SYMBOLS * _N_SYMBOLS)
    for r in rows:
        total += np.array(r.counts, dtype=np.float64)
    return logprob_table(total.reshape(_N_SYMBOLS, _N_SYMBOLS))


def train_char_kn_trigram_lm(documents: DataFrame, text_col: str = "text", discount: float = 0.75):
    """Fit a KenLM-style interpolated Kneser-Ney character-TRIGRAM LM on
    the corpus, distributed — same one-narrow-pass shape as the bigram
    trainer, with a 28³ (≈170 KB) count tensor per Arrow batch reduced
    driver-side, then KN smoothing (:func:`kernel.quality.kn_logprob_table`)
    on the summed counts.  Returns the dense (28², 28) log-probability
    table; score with ``char_perplexity_trigram(text, table.reshape(-1))``.
    Counts are additive, so the distributed sum equals a single-machine
    train bit for bit (tested)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    from localmod_spark.kernel.quality import _N_SYMBOLS, kn_logprob_table, trigram_counts

    out_schema = StructType([StructField("counts", ArrayType(LongType()), False)])

    def _count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = np.zeros((_N_SYMBOLS, _N_SYMBOLS, _N_SYMBOLS))
            for t in pdf[text_col].fillna(""):
                acc += trigram_counts(t)
            yield pd.DataFrame({"counts": [acc.reshape(-1).astype(np.int64).tolist()]})

    rows = documents.select(text_col).mapInPandas(_count_batches, schema=out_schema).collect()
    total = np.zeros(_N_SYMBOLS**3)
    for r in rows:
        total += np.array(r.counts, dtype=np.float64)
    return kn_logprob_table(total.reshape(_N_SYMBOLS, _N_SYMBOLS, _N_SYMBOLS), discount=discount)
