"""As-of and range (interval) joins — the time-series operators Spark
lacks as built-ins, expressed as compositions of existing DataFrame ops
(no UDF, no cartesian product).

As-of join: for each left row, the latest right row at-or-before its
timestamp (same key) — pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics, backward + inclusive.  Implemented as the classic
union-and-window merge: tag both sides, union, one window ordered by
(ts, side) carrying the last right payload forward.  ONE exchange on the
key, no join node at all — at 100 TB this beats any join-shaped plan
because the right side is never built into a hash table and skewed keys
degrade into a sort, not a hot build side.

Range join: match events to [start, end] intervals (inclusive on BOTH
ends, matching the DuckDB oracle's BETWEEN) by TIME BINNING —
explode each interval into the fixed-width bins it covers, equi-join
events on (key, bin), then apply the exact BETWEEN as a residual filter.
The equi-join keys the shuffle (Catalyst would otherwise plan
BroadcastNestedLoopJoin for a pure inequality join); each event lives in
exactly one bin so no post-join dedup is needed.  Bin width tunes the
explode factor vs bucket selectivity (~ median interval length is a good
default).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward inclusive as-of join: append the payload of the latest
    right row with ``right_ts <= left_ts`` per key (nulls when none).

    Right-side TIES on (key, ts) must be resolved by the caller (e.g.
    pre-aggregate to one row per key+ts) — as-of semantics are undefined
    under ties in every engine, and a deterministic pipeline must not
    depend on engine-internal order."""
    keys = list(key_cols)
    rcols = list(right_cols)
    payload = F.struct(*[F.col(c) for c in rcols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        payload.alias("_r"),
        F.lit(0).alias("_side"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right rows sort BEFORE left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r.unionByName(l).withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = merged.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in rcols],
    )
    return out


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner range join: event rows matched to every interval row (same
    key) whose ``[start, end]`` contains the event's timestamp.

    The binned equi-join shape: intervals explode into covered bins
    (``sequence`` of bin ids — an interval of length L costs ~L/bin
    copies of its (key, start, end) triple, payload NOT duplicated beyond
    that), events map to their single bin, the join keys the shuffle on
    (key, bin), and the exact containment is a cheap residual."""
    keys = list(key_cols)
    ev_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    st_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    en_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    bw = bin_seconds * 1_000_000
    binned_iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(F.floor(st_us / bw), F.floor(en_us / bw)))
    )
    binned_ev = events.withColumn("_bin", F.floor(ev_us / bw))
    joined = binned_ev.join(binned_iv, keys + ["_bin"])
    ev_us_j = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return joined.where(
        (ev_us_j >= F.unix_micros(F.col(start_col).cast("timestamp")))
        & (ev_us_j <= F.unix_micros(F.col(end_col).cast("timestamp")))
    ).drop("_bin")
