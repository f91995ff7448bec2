"""Conversation-structure checks, PSI drift, context-window truncation,
canonical normalization, and the Bloom-prefiltered exact dedup gate."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: int) -> datetime.datetime:
    return BASE + datetime.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def turns(spark):
    # conv a: clean 3-turn conversation.
    # conv b: turn_idx gap (0, 2) -> dense fails.
    # conv c: ts goes backwards -> monotone fails.
    # conv d: opens with assistant -> first-role fails.
    # conv e: tool payload on a user turn AND a tool turn missing its
    #         payload -> tool_iff_role fails.
    rows = [
        ("a", 0, "user", "hi", None, _ts(0)),
        ("a", 1, "assistant", "hello", None, _ts(1)),
        ("a", 2, "tool", "result", "search", _ts(2)),
        ("b", 0, "user", "x", None, _ts(0)),
        ("b", 2, "assistant", "y", None, _ts(1)),
        ("c", 0, "user", "x", None, _ts(5)),
        ("c", 1, "assistant", "y", None, _ts(3)),
        ("d", 0, "assistant", "pre-empt", None, _ts(0)),
        ("d", 1, "user", "ok", None, _ts(1)),
        ("e", 0, "user", "x", "search", _ts(0)),
        ("e", 1, "tool", "y", None, _ts(1)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_conversation_checks_shares(spark, turns):
    from localmod_spark.operators.checks import conversation_checks

    out = {r["check"]: r for r in conversation_checks(turns).collect()}
    assert out["dense(turn_idx)"]["pass_share"] == pytest.approx(4 / 5)
    assert out["monotone(ts)"]["pass_share"] == pytest.approx(4 / 5)
    assert out["first(role=user)"]["pass_share"] == pytest.approx(4 / 5)
    assert out["tool_iff_role(tool)"]["pass_share"] == pytest.approx(4 / 5)
    assert all(not r["passed"] for r in out.values())  # min_pass_share=1.0


def test_conversation_checks_all_clean(spark):
    from localmod_spark.operators.checks import conversation_checks

    rows = [
        ("a", 0, "user", None, _ts(0)),
        ("a", 1, "tool", "code", _ts(1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, ts timestamp"
    )
    out = conversation_checks(df)
    assert all(r["pass_share"] == 1.0 and r["passed"] for r in out.collect())


def test_psi_drift_stable_and_shifted(spark):
    from localmod_spark.operators.checks import psi_drift

    base = spark.range(1000).select((F.col("id") % 200).cast("double").alias("v"))
    same = spark.range(1000).select((F.col("id") % 200).cast("double").alias("v"))
    shifted = spark.range(1000).select(
        (100 + F.col("id") % 100).cast("double").alias("v")
    )
    breaks = [50.0, 100.0, 150.0]
    stable = psi_drift(base, same, "v", breaks, max_psi=0.25).collect()[0]
    assert stable["pass_share"] == pytest.approx(0.0, abs=1e-6)
    assert stable["passed"]
    moved = psi_drift(base, shifted, "v", breaks, max_psi=0.25).collect()[0]
    assert moved["pass_share"] > 0.25
    assert not moved["passed"]
    assert moved["check"] == "psi(v)<=0.25"


def test_psi_drift_empty_bucket_is_finite(spark):
    from localmod_spark.operators.checks import psi_drift

    base = spark.range(100).select(F.lit(10.0).alias("v"))
    cur = spark.range(100).select(F.lit(500.0).alias("v"))
    row = psi_drift(base, cur, "v", [50.0, 100.0], max_psi=0.25).collect()[0]
    assert row["pass_share"] == row["pass_share"]  # not NaN
    assert row["pass_share"] > 1.0  # total mass migration


@pytest.fixture(scope="module")
def budget_turns(spark):
    rows = [
        ("a", 0, 10),
        ("a", 1, 20),
        ("a", 2, 30),
        ("a", 3, 40),
        ("b", 0, 100),
        ("b", 1, 5),
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tokens int")


def test_truncate_suffix_keeps_latest(spark, budget_turns):
    from localmod_spark.operators.context import truncate_to_budget

    kept = truncate_to_budget(budget_turns, budget=75, keep="suffix")
    got = {(r["conv_id"], r["turn_idx"]): r["cum_tokens"] for r in kept.collect()}
    # a: suffix sums 40, 70, 100 -> keep turns 3 and 2 only
    # b: suffix sums 5, 105 -> keep turn 1 only
    assert got == {("a", 3): 40, ("a", 2): 70, ("b", 1): 5}


def test_truncate_prefix_and_overbudget_turn(spark, budget_turns):
    from localmod_spark.operators.context import truncate_to_budget

    kept = truncate_to_budget(budget_turns, budget=35, keep="prefix")
    got = {(r["conv_id"], r["turn_idx"]): r["cum_tokens"] for r in kept.collect()}
    # a: prefix sums 10, 30, 60 -> keep turns 0 and 1
    # b: first turn alone is 100 > 35 -> conversation fully dropped
    assert got == {("a", 0): 10, ("a", 1): 30}


def test_truncate_rejects_bad_keep(budget_turns):
    from localmod_spark.operators.context import truncate_to_budget

    with pytest.raises(ValueError, match="suffix"):
        truncate_to_budget(budget_turns, budget=10, keep="middle")


def test_normalize_text_kernel_and_udf(spark):
    from localmod_spark.functions.text import normalize_text_udf
    from localmod_spark.kernel.normalize import normalize_text

    raw = "  café   x\ty\x07z  "
    assert normalize_text(raw) == "café x\ty\x07z".replace("\t", "").replace("\x07", "")
    assert normalize_text(raw) == "café xyz"
    # newlines are content, not collapsible whitespace
    assert normalize_text("a\n b") == "a\n b"
    df = spark.createDataFrame([(raw,), (None,)], "text string")
    got = [r["n"] for r in df.select(normalize_text_udf("text").alias("n")).collect()]
    assert got == ["café xyz", None]


def test_bloom_no_false_negatives_and_exactness(spark):
    from localmod_spark.operators.bloom import (
        bloom_maybe_contains,
        build_bloom,
        incremental_exact_dedup,
    )

    corpus = spark.range(500).select(F.format_string("doc-%d", "id").alias("text"))
    # batch: 100 seen + 100 novel + a null
    batch = (
        spark.range(400, 600)
        .select(F.format_string("doc-%d", "id").alias("text"))
        .unionByName(spark.createDataFrame([(None,)], "text string"))
    )
    bloom = build_bloom(corpus, "text", num_bits=1 << 14, k=5)
    flagged = bloom_maybe_contains(batch, bloom, "text", num_bits=1 << 14, k=5)
    seen = {r["text"]: r["maybe_seen"] for r in flagged.collect()}
    # zero false negatives: every actually-seen key must flag maybe
    for i in range(400, 500):
        assert seen[f"doc-{i}"] is True
    assert seen[None] is False

    got = incremental_exact_dedup(
        batch, corpus, bloom=bloom, key_col="text", num_bits=1 << 14, k=5
    )
    want = batch.join(corpus.distinct(), "text", "left_anti")
    assert sorted(r["text"] or "" for r in got.collect()) == sorted(
        r["text"] or "" for r in want.collect()
    )


def test_bloom_prefilter_prunes_most_novel_rows(spark):
    """The point of the filter: with a reasonable m/n, almost all novel
    keys skip the verification join."""
    from localmod_spark.operators.bloom import bloom_maybe_contains, build_bloom

    corpus = spark.range(1000).select(F.format_string("k-%d", "id").alias("text"))
    novel = spark.range(5000, 7000).select(F.format_string("k-%d", "id").alias("text"))
    bloom = build_bloom(corpus, "text", num_bits=1 << 16, k=5)
    flagged = bloom_maybe_contains(novel, bloom, "text", num_bits=1 << 16, k=5)
    fp = flagged.where(F.col("maybe_seen")).count()
    assert fp / 2000 < 0.05


def test_bloom_rejects_unaligned_bits(spark):
    from localmod_spark.operators.bloom import build_bloom

    df = spark.range(1).select(F.lit("x").alias("text"))
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(df, "text", num_bits=100)


def test_truncate_null_tokens_cost_zero(spark):
    """Review fix: a NULL-cost turn at the kept end must not NULL the
    running sum and evict the newest turns."""
    from localmod_spark.operators.context import truncate_to_budget

    rows = [("a", 0, 10), ("a", 1, None), ("a", 2, None)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tokens int")
    kept = truncate_to_budget(df, budget=100, keep="suffix")
    got = sorted((r["turn_idx"], r["cum_tokens"]) for r in kept.collect())
    assert got == [(0, 10), (1, 0), (2, 0)]


def test_conversation_checks_null_fields_are_violations(spark):
    """Review fix: NULL role/ts must count as violations, not vanish
    from the per-conversation AND."""
    from localmod_spark.operators.checks import conversation_checks

    rows = [
        # conv a: role NULL on a turn carrying a tool payload
        ("a", 0, "user", None, _ts(0)),
        ("a", 1, None, "search", _ts(1)),
        # conv b: ts NULL mid-conversation
        ("b", 0, "user", None, _ts(0)),
        ("b", 1, "assistant", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, ts timestamp"
    )
    out = {r["check"]: r["pass_share"] for r in conversation_checks(df).collect()}
    assert out["tool_iff_role(tool)"] == pytest.approx(0.5)  # conv a fails
    assert out["monotone(ts)"] == pytest.approx(0.5)  # conv b fails


def test_psi_drift_ignores_nulls_and_runs_no_jobs_at_build(spark):
    from localmod_spark.operators.checks import psi_drift

    base = spark.createDataFrame([(10.0,), (None,), (None,)], "v double")
    cur = spark.createDataFrame([(10.0,)], "v double")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    row_df = psi_drift(base, cur, "v", [50.0], max_psi=0.25)
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before  # construction is lazy — no driver actions
    row = row_df.collect()[0]
    # nulls excluded from BOTH sides -> identical distributions -> psi 0
    assert row["pass_share"] == pytest.approx(0.0, abs=1e-6)


def test_bloom_rejects_nonpositive_k(spark):
    from localmod_spark.operators.bloom import build_bloom

    df = spark.range(1).select(F.format_string("x%d", "id").alias("text"))
    with pytest.raises(ValueError, match="k must be"):
        build_bloom(df, "text", num_bits=1 << 10, k=0)
