"""Hot-conversation skew: the pipeline's skew-sensitive stages under an
extreme distribution (one conversation holding ~40% of all turns)."""

import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.context import add_context, conv_features
from localmod_spark.operators.score import score_turns
from localmod_spark.operators.skew import salted_repartition
from localmod_spark.sources.transcripts import synth_transcripts

N = 60_000


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot conversation with 40% of all turns
    df = synth_transcripts(spark, N, n_hot=1, hot_share=0.4, slices=8)
    return df.persist()


def test_skew_shape(skewed):
    sizes = {r.conv_id: r.n for r in skewed.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    assert sizes["hot-000"] == int(N * 0.4)


def test_salted_repartition_balances(spark, skewed):
    """Without salting, hashing on conv_id puts 40% of rows in one
    partition; salted repartition bounds the max partition near the mean."""
    parts = 16
    unsalted = skewed.repartition(parts, F.col("conv_id"))
    salted = salted_repartition(skewed, parts, salt_buckets=parts)

    def max_part(df):
        return max(
            r.n
            for r in df.withColumn("p", F.spark_partition_id())
            .groupBy("p").agg(F.count("*").alias("n")).collect()
        )

    mean = N / parts
    assert max_part(unsalted) >= N * 0.4  # the hot conv serializes
    assert max_part(salted) < mean * 2.0  # salting spreads it


def test_scoring_is_skew_immune(spark, skewed):
    """The fused scoring stage is narrow — per-turn work, no grouping —
    so skew in conv_id cannot serialize it."""
    out = score_turns(skewed)
    assert out.count() == N


def test_conv_features_skew_safe_and_correct(spark, skewed):
    """Salted two-phase aggregation over the skewed table must equal the
    naive single-phase plan."""
    scored = score_turns(skewed).select("conv_id", "turn_idx", "flagged", "pii_flagged", "severity")
    naive = {
        r.conv_id: (r.n, r.f)
        for r in scored.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.sum(F.col("flagged").cast("long")).alias("f"))
        .collect()
    }
    salted = {
        r.conv_id: (r.n_turns, r.n_flagged)
        for r in conv_features(scored, salt_buckets=16).collect()
    }
    assert naive == salted


def test_full_context_completes_under_skew(spark, skewed):
    """End-to-end with the window stage: completes and conv totals are
    right even with the 24k-turn hot conversation (documented bound: at
    true hot-key scale, partition the ordered window by day)."""
    ctx = add_context(score_turns(skewed))
    hot = ctx.where(F.col("conv_id") == "hot-000").select("n_turns").first()
    assert hot.n_turns == int(N * 0.4)
    assert ctx.count() == N


def test_bounded_context_caps_sort_width_and_keeps_totals(spark, skewed):
    """add_context_bounded: per-day ordered windows (no task ever sorts
    the whole 24k-turn hot conversation) with identical conversation
    totals to the unbounded variant."""
    from localmod_spark.operators.context import add_context_bounded

    scored = score_turns(skewed).persist()
    bounded = add_context_bounded(scored).persist()
    assert bounded.count() == N  # no row loss through the join

    # conversation totals equal the unbounded plan's
    unb = {r.conv_id: (r.n_turns, r.n_flagged)
           for r in add_context(scored).select("conv_id", "n_turns", "n_flagged").distinct().collect()}
    bnd = {r.conv_id: (r.n_turns, r.n_flagged)
           for r in bounded.select("conv_id", "n_turns", "n_flagged").distinct().collect()}
    assert unb == bnd

    # the ordered window really is day-bounded: ranks restart daily, so
    # the max rank is one day of minute-spaced turns, not 24k
    max_rank = bounded.agg(F.max("turn_rank")).collect()[0][0]
    assert max_rank <= 1441, max_rank
    assert bounded.where("conv_id = 'hot-000'").count() == int(N * 0.4)
    bounded.unpersist()
    scored.unpersist()
