"""Conversation-granularity moderation decisions.

The reference decides keep/drop per text (`src/localmod/pipeline.py:120-138`);
a transcript pipeline additionally needs the CONVERSATION-level rollup —
drop the whole conversation when enough of its turns are flagged or any
turn reaches a terminal severity — because a poisoned context taints the
surrounding turns even when they individually pass.

Scale shape: one ``groupBy(conv_col)`` (map-side combined, shuffles on
the same key as the scoring pipeline's context stage, so an upstream
conv-partitioned exchange is reused) plus, for the join-back, a shuffle
join keyed identically.  The decision table is one row per conversation
— at 10^12 turns it is still ~10^10-10^11 rows, so it is NOT broadcast;
co-partitioning is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from localmod_spark.kernel.types import SEVERITIES, SEVERITY_RANK


def _severity_rank(col: Column) -> Column:
    """Rank-encode a severity string by reference enum position
    (`src/localmod/models/base.py:9-15`).

    NULL ranks as 'none' (an unscored turn carries no evidence); an
    UNKNOWN non-null string fails CLOSED to the 'critical' rank — a
    typo'd severity must never let a conversation through silently.
    """
    expr = F.when(col.isNull(), F.lit(0))
    for s, r in SEVERITY_RANK.items():
        expr = expr.when(col == s, F.lit(r))
    return expr.otherwise(F.lit(SEVERITY_RANK["critical"]))


def conv_decision(
    turns: DataFrame,
    *,
    max_flag_share: float = 0.2,
    drop_severity: str = "high",
    conv_col: str = "conv_id",
    flagged_col: str = "flagged",
    severity_col: str = "severity",
) -> DataFrame:
    """Per-conversation keep/drop: drop when the flagged-turn share
    EXCEEDS ``max_flag_share`` or any turn's severity reaches
    ``drop_severity``.

    Returns one row per conversation: ``n_turns``, ``n_flagged``,
    ``flag_share`` (rounded 6 for cross-engine display; the comparison
    uses the unrounded value), ``max_severity``, ``conv_keep`` and
    ``drop_reason`` ('flag_share', 'severity', 'flag_share+severity',
    or NULL when kept).
    """
    if drop_severity not in SEVERITY_RANK:
        raise ValueError(
            f"drop_severity must be one of {SEVERITIES}, got {drop_severity!r}"
        )
    if not 0.0 <= max_flag_share <= 1.0:
        raise ValueError(f"max_flag_share must be in [0, 1], got {max_flag_share}")
    drop_rank = SEVERITY_RANK[drop_severity]

    agg = turns.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.coalesce(F.col(flagged_col), F.lit(False)).cast("long")).alias(
            "n_flagged"
        ),
        F.max(_severity_rank(F.col(severity_col))).alias("_max_rank"),
    )
    share = F.col("n_flagged") / F.col("n_turns")
    share_bad = share > F.lit(float(max_flag_share))
    sev_bad = F.col("_max_rank") >= F.lit(drop_rank)
    reason = F.concat_ws(
        "+",
        F.when(share_bad, F.lit("flag_share")),
        F.when(sev_bad, F.lit("severity")),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_flagged",
        F.round(share, 6).alias("flag_share"),
        F.element_at(
            F.array(*[F.lit(s) for s in SEVERITIES]), F.col("_max_rank") + 1
        ).alias("max_severity"),
        (~(share_bad | sev_bad)).alias("conv_keep"),
        F.nullif(reason, F.lit("")).alias("drop_reason"),
    )


def with_conv_decision(turns: DataFrame, **kwargs) -> DataFrame:
    """Join the conversation decision back onto every turn (adds
    ``conv_keep`` and ``drop_reason``); keyword args as
    :func:`conv_decision`."""
    conv_col = kwargs.get("conv_col", "conv_id")
    decisions = conv_decision(turns, **kwargs).select(
        F.col("conv_id").alias("_dconv"), "conv_keep", "drop_reason"
    )
    # null-safe: a NULL conv_id is one (malformed) conversation group in
    # the aggregate, and a plain equality join would silently give its
    # turns conv_keep=NULL — letting critical-severity turns through a
    # `conv_keep == False` quarantine filter
    return turns.join(
        decisions, F.col(conv_col).eqNullSafe(F.col("_dconv")), "left"
    ).drop("_dconv")
