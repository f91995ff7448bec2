"""Conversation-level decisions (operators/convmod.py) and operational
diagnostics (operators/diagnostics.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.convmod import conv_decision, with_conv_decision
from localmod_spark.operators.diagnostics import (
    audit_sample,
    audit_sample_scalable,
    heavy_hitters,
    key_skew_stats,
)

SCHEMA = "conv_id string, flagged boolean, severity string"


def _decisions(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["conv_id"]: r.asDict()
        for r in conv_decision(df, max_flag_share=0.5, drop_severity="high").collect()
    }


def test_conv_decision_reasons(spark):
    rows = [
        # kept: 1/3 flagged, max medium
        ("k", True, "medium"), ("k", False, "none"), ("k", False, "none"),
        # share drop: 2/3 flagged, low severity
        ("s", True, "low"), ("s", True, "low"), ("s", False, "none"),
        # severity drop: 1/4 flagged but one high turn
        ("v", True, "high"), ("v", False, "none"),
        ("v", False, "none"), ("v", False, "none"),
        # both
        ("b", True, "critical"), ("b", True, "low"),
    ]
    d = _decisions(spark, rows)
    assert d["k"]["conv_keep"] and d["k"]["drop_reason"] is None
    assert d["k"]["max_severity"] == "medium"
    assert not d["s"]["conv_keep"] and d["s"]["drop_reason"] == "flag_share"
    assert not d["v"]["conv_keep"] and d["v"]["drop_reason"] == "severity"
    assert d["b"]["drop_reason"] == "flag_share+severity"
    assert d["b"]["max_severity"] == "critical"
    assert d["s"]["flag_share"] == pytest.approx(0.666667)


def test_conv_decision_boundary_share_is_kept(spark):
    # share EXACTLY at the threshold does not drop (strict >)
    rows = [("e", True, "low"), ("e", False, "none")]
    d = _decisions(spark, rows)  # share 0.5 == max_flag_share 0.5
    assert d["e"]["conv_keep"]


def test_conv_decision_nulls_and_unknown_severity(spark):
    rows = [
        # NULL flagged counts as unflagged; NULL severity ranks 'none'
        ("n", None, None), ("n", False, "none"),
        # unknown severity string fails CLOSED (ranks critical -> drop)
        ("u", False, "HIGHEST"), ("u", False, "none"),
    ]
    d = _decisions(spark, rows)
    assert d["n"]["conv_keep"] and d["n"]["n_flagged"] == 0
    assert d["n"]["max_severity"] == "none"
    assert not d["u"]["conv_keep"] and d["u"]["drop_reason"] == "severity"
    assert d["u"]["max_severity"] == "critical"


def test_conv_decision_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", True, "low")], SCHEMA)
    with pytest.raises(ValueError, match="drop_severity"):
        conv_decision(df, drop_severity="fatal")
    with pytest.raises(ValueError, match="max_flag_share"):
        conv_decision(df, max_flag_share=1.5)


def test_with_conv_decision_joins_back(spark):
    rows = [("a", True, "high"), ("a", False, "none"), ("c", False, "none")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = with_conv_decision(df, max_flag_share=0.9, drop_severity="high")
    got = {(r["conv_id"], r["conv_keep"]) for r in out.collect()}
    assert got == {("a", False), ("c", True)}
    assert out.count() == 3  # per-turn grain preserved


# ------------------------------------------------------------------ skew


def _keyed(spark, spec):
    rows = [(k, i) for k, n in spec.items() for i in range(n)]
    return spark.createDataFrame(rows, "k string, i int")


def test_key_skew_stats_values(spark):
    df = _keyed(spark, {"a": 8, "b": 2, "c": 2})
    r = key_skew_stats(df, "k").collect()[0]
    assert (r["n_keys"], r["total"], r["max_cnt"]) == (3, 12, 8)
    assert r["avg_cnt"] == pytest.approx(4.0)
    assert r["skew_factor"] == pytest.approx(2.0)
    assert r["recommended_salt"] == 2


def test_key_skew_stats_salt_clamped(spark):
    # mild skew: ceil(100 / (102/3)) = 3, under the cap
    df = _keyed(spark, {"hot": 100, "c1": 1, "c2": 1})
    r = key_skew_stats(df, "k", salt_cap=16).collect()[0]
    assert r["recommended_salt"] == 3
    # extreme skew: one 1000-row key over 100 singletons -> clamp binds
    spec = {"hot": 1000}
    spec.update({f"c{i}": 1 for i in range(100)})
    r2 = key_skew_stats(_keyed(spark, spec), "k", salt_cap=16).collect()[0]
    assert r2["recommended_salt"] == 16


def test_heavy_hitters_rank_and_plan(spark):
    df = _keyed(spark, {"a": 5, "b": 5, "c": 1})
    top = heavy_hitters(df, "k", top_n=2)
    rows = [(r["key"], r["cnt"], r["rank"]) for r in top.collect()]
    # tie on cnt broken by key asc — deterministic
    assert rows == [("a", 5, 1), ("b", 5, 2)]
    assert top.collect()[0]["share"] == pytest.approx(5 / 11, abs=1e-6)
    assert "TakeOrderedAndProject" in top._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="top_n"):
        heavy_hitters(df, "k", top_n=0)


# ------------------------------------------------------------------ audit


def _events(spark, per_cat):
    rows = [
        (cat, cat * 1000 + i)
        for cat, n in per_cat.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "cat int, id long")


def test_audit_sample_is_deterministic_and_bounded(spark):
    df = _events(spark, {1: 50, 2: 3, 3: 1})
    out = audit_sample(df, "cat", "id", n_per=5, seed=7)
    by_cat = {}
    for r in out.collect():
        by_cat.setdefault(r["cat"], []).append((r["sample_rank"], r["id"]))
    assert len(by_cat[1]) == 5 and len(by_cat[2]) == 3 and len(by_cat[3]) == 1
    # matches a driver-side replay of the same md5 order
    want = sorted(
        (1000 + i for i in range(50)),
        key=lambda i: hashlib.md5(f"{i}:7".encode()).hexdigest(),
    )[:5]
    got = [i for _, i in sorted(by_cat[1])]
    assert got == want
    # rerun on a different partitioning -> identical rows
    again = audit_sample(df.repartition(7), "cat", "id", n_per=5, seed=7)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


def _assert_same_sample(plain_df, scal_df):
    def rows(df):
        return sorted(df.collect(), key=lambda r: tuple(map(repr, r)))

    assert rows(plain_df) == rows(scal_df)


def test_audit_sample_scalable_equals_plain(spark):
    df = _events(spark, {1: 200, 2: 40, 3: 2})
    plain = audit_sample(df, "cat", "id", n_per=4, seed=3)
    scal = audit_sample_scalable(df, "cat", "id", n_per=4, seed=3, oversample=8)
    _assert_same_sample(plain, scal)


def test_audit_sample_scalable_shortfall_fallback(spark):
    """Find a seed where the oversample=1 prefilter provably undershoots
    (fewer than n_per of the category's rows fall under the hash-rate
    threshold), then check the exact fallback restores equality."""
    n, n_per = 400, 4
    ids = [1000 + i for i in range(n)]

    def survivors(seed: int) -> int:
        rate = n_per / n
        return sum(
            1
            for i in ids
            if int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:15], 16)
            / 16**15
            <= rate
        )

    seed = next(s for s in range(200) if survivors(s) < n_per)
    df = _events(spark, {1: n})
    plain = audit_sample(df, "cat", "id", n_per=n_per, seed=seed)
    scal = audit_sample_scalable(
        df, "cat", "id", n_per=n_per, seed=seed, oversample=1
    )
    _assert_same_sample(plain, scal)


def test_audit_sample_scalable_null_category(spark):
    rows = [(None, 10), (None, 11), (None, 12), (1, 20), (1, 21)]
    df = spark.createDataFrame(rows, "cat int, id long")
    plain = audit_sample(df, "cat", "id", n_per=2, seed=0)
    scal = audit_sample_scalable(df, "cat", "id", n_per=2, seed=0, oversample=8)
    _assert_same_sample(plain, scal)
    assert plain.where(F.col("cat").isNull()).count() == 2


def test_audit_sample_null_ids_excluded_both_paths(spark):
    """Review fix: a NULL id must not hash NULL, sort first and occupy
    audit slot 1 (and the scalable path must stay equal to plain)."""
    rows = [(1, None), (1, 10), (1, 11), (1, 12)]
    df = spark.createDataFrame(rows, "cat int, id long")
    plain = audit_sample(df, "cat", "id", n_per=2, seed=0)
    assert sorted(r["id"] for r in plain.collect()) == sorted(
        [10, 11, 12],
        key=lambda i: hashlib.md5(f"{i}:0".encode()).hexdigest(),
    )[:2]
    scal = audit_sample_scalable(df, "cat", "id", n_per=2, seed=0, oversample=8)
    _assert_same_sample(plain, scal)


def test_with_conv_decision_null_conv_id(spark):
    """Review fix: the NULL-conv group's decision must join back to its
    turns (plain equality would leave conv_keep NULL)."""
    rows = [(None, True, "critical"), (None, True, "critical"), ("a", False, "none")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = with_conv_decision(df, max_flag_share=0.9, drop_severity="high")
    got = {(r["conv_id"], r["conv_keep"]) for r in out.collect()}
    assert got == {(None, False), ("a", True)}


def test_audit_sample_rejects_bad_params(spark):
    df = _events(spark, {1: 3})
    with pytest.raises(ValueError, match="n_per"):
        audit_sample(df, "cat", "id", n_per=0)
    with pytest.raises(ValueError, match="oversample"):
        audit_sample_scalable(df, "cat", "id", n_per=1, oversample=0)
