"""Deterministic sampling for training-corpus construction.

``df.sample()`` is the wrong tool for corpus building at 10^12 rows: its
Bernoulli draw depends on partition layout and rerun seed plumbing, so a
resumed or re-planned job samples a DIFFERENT subset.  These operators
key every decision on a content-stable hash of the row id instead —

  * reproducible: same ids → same sample, any partitioning, any rerun
    (exactly what a checkpoint-resumable pipeline needs: a wave that
    reruns must re-select the same rows);
  * shuffle-free: a narrow filter, no global count, no sort;
  * engine-independent: MD5-based uniforms, so a SQL oracle (DuckDB)
    reproduces the exact keep set — same trick as the media/simhash
    oracles.

The hash uniform is ``first 8 hex chars of md5(id) / 2^32`` — 32 bits of
mantissa is ample for sampling rates down to ~1e-8.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(col: Column) -> Column:
    """Deterministic U[0,1) from any column (via its string form)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 32))


def sample_uniform(df: DataFrame, rate: float, id_col: str = "doc_id") -> DataFrame:
    """Keep each row iff hash_uniform(id) < rate."""
    return df.where(hash_uniform(F.col(id_col)) < F.lit(float(rate)))


def sample_stratified(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rate sampling (the training-mix knob: e.g. keep 50% of
    English, 10% of everything else).  The stratum only selects the RATE;
    the keep decision still hashes the id, so changing one stratum's rate
    never reshuffles another stratum's sample — mixes can be retuned
    incrementally without invalidating downstream caches."""
    pairs = []
    for k, v in rates.items():
        pairs += [F.lit(k), F.lit(float(v))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(stratum_col)),
        F.lit(float(default_rate)),
    )
    return df.where(hash_uniform(F.col(id_col)) < rate)


def split_train_holdout(
    df: DataFrame, holdout_rate: float = 0.01, id_col: str = "doc_id"
) -> DataFrame:
    """Append a ``split`` column ('train' | 'holdout') from the same
    deterministic uniform — disjoint by construction, stable across
    reruns, and a row's split never changes when the rate of the OTHER
    split moves."""
    u = hash_uniform(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(u < F.lit(float(holdout_rate)), F.lit("holdout")).otherwise(F.lit("train")),
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    order_by,
    token_col: str = "n_tokens",
    group_cols=("lang",),
) -> DataFrame:
    """Quality-ranked TOKEN-BUDGET selection — the training-mixture
    builder's final cut: per group (language/domain), walk the docs in
    quality order and keep them while the cumulative token count stays
    within the group's budget.  Appends ``cum_tokens``.

    ``order_by`` must be a deterministic total order (end it with the id
    column) — the selection is then rerun/partitioning-stable like the
    hash samplers above.  One window per group (a single exchange on the
    group key); a running ``rows between unbounded preceding`` sum —
    no driver-side iteration, no second pass.  At 10^12 rows a single
    group IS its whole sort partition, so keep groups at
    language × domain-shard granularity (the same bounding rule as
    ``pack_greedy``) or pre-prune with a cheap quality floor before the
    exact budget cut."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    return df.withColumn("cum_tokens", cum).where(F.col("cum_tokens") <= budget)
