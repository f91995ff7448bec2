"""Data-quality verification with partition-mergeable state
(Deequ-style; cf. Schelter et al., "Differential Data Quality
Verification on Partitioned Data", ICDE 2019 — PAPERS.md).

A 10^12-turn ingest pipeline must verify each increment BEFORE
committing it, and re-verify the whole corpus WITHOUT rescanning it.
Both follow from one design rule: every quality metric is computed from
an algebraically mergeable per-partition STATE (counts, null counts,
sums, mins, maxes, predicate-pass counts) —

  * per-wave gate: compute the state for the new wave only, check it;
  * corpus roll-up: merge all waves' states (pure arithmetic, no scan);
  * differential re-check after replacing one wave: merge (old corpus
    state − old wave state + new wave state) — the paper's trick.

Approximate-distinct is deliberately OUT of the mergeable state here
(HLL sketches merge too, but are not exactly verifiable cross-engine);
`check_suite` offers exact `uniqueness` as a whole-relation check
instead.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------- checks ----


@dataclass(frozen=True)
class Check:
    """One verifiable constraint: a row predicate plus the minimum share
    of rows that must satisfy it (1.0 = every row)."""

    name: str
    predicate: Column
    min_pass_share: float = 1.0


def completeness_check(col: str, min_share: float = 1.0) -> Check:
    return Check(f"complete({col})", F.col(col).isNotNull(), min_share)


def in_range_check(col: str, lo, hi, min_share: float = 1.0) -> Check:
    return Check(f"range({col})", F.col(col).between(lo, hi), min_share)


def in_set_check(col: str, values: Sequence, min_share: float = 1.0) -> Check:
    return Check(f"in_set({col})", F.col(col).isin(list(values)), min_share)


def check_suite(df: DataFrame, checks: List[Check], unique_col: Optional[str] = None) -> DataFrame:
    """Evaluate every check in ONE aggregation pass (each check is a
    conditional count — map-side combinable, one row out).  Returns one
    row per check: (check, pass_share, min_pass_share, passed).

    ``unique_col`` adds an exact uniqueness check (distinct/count) — the
    one constraint that genuinely needs a shuffle."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(checks):
        aggs.append(F.sum(c.predicate.cast("long")).alias(f"_p{i}"))
    if unique_col is not None:
        aggs.append(F.countDistinct(unique_col).alias("_u"))
    row = df.agg(*aggs)
    out = []
    for i, c in enumerate(checks):
        out.append(
            (F.lit(c.name), F.round(F.col(f"_p{i}") / F.col("_n"), 6), F.lit(c.min_pass_share))
        )
    if unique_col is not None:
        out.append(
            (F.lit(f"unique({unique_col})"), F.round(F.col("_u") / F.col("_n"), 6), F.lit(1.0))
        )
    rows = F.array(
        *[
            F.struct(n.alias("check"), s.alias("pass_share"), m.alias("min_pass_share"))
            for n, s, m in out
        ]
    )
    return (
        row.select(F.explode(rows).alias("r"))
        .select("r.check", "r.pass_share", "r.min_pass_share")
        .withColumn("passed", F.col("pass_share") >= F.col("min_pass_share"))
    )


# ------------------------------------- mergeable per-partition state ----


def quality_state(
    df: DataFrame,
    partition_col: str,
    numeric_col: str,
    checks: List[Check],
) -> DataFrame:
    """Per-partition quality STATE: one row per partition value with
    count, per-check pass counts, and sum/min/max of ``numeric_col`` —
    every field merges algebraically (+, +, +, min, max), so corpus-level
    metrics come from :func:`merge_states` without touching the data."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(numeric_col)).alias("v_sum"),
        F.min(F.col(numeric_col)).alias("v_min"),
        F.max(F.col(numeric_col)).alias("v_max"),
    ]
    for i, c in enumerate(checks):
        aggs.append(F.sum(c.predicate.cast("long")).alias(f"pass_{i}"))
    return df.groupBy(partition_col).agg(*aggs)


def merge_states(states: DataFrame, n_checks: int) -> DataFrame:
    """Merge per-partition states to one corpus-level row — pure
    arithmetic over the (tiny) state table; the data is never rescanned.
    Replacing one partition = subtract its old state row, add the new
    one, re-merge (the differential re-verification property)."""
    aggs = [
        F.sum("n").alias("n"),
        F.sum("v_sum").alias("v_sum"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    ]
    for i in range(n_checks):
        aggs.append(F.sum(f"pass_{i}").alias(f"pass_{i}"))
    return states.agg(*aggs)
