"""Bloom artifact lifecycle (extend/save/load/stats) and the pipeline's
optional conversation-rollup stage."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.bloom import (
    bloom_stats,
    build_bloom,
    extend_bloom,
    load_bloom,
    save_bloom,
)

BITS = 1 << 12


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.format_string("key-%d", "id").alias("text"))


def _words(df):
    return {(r["word_ix"], r["word"]) for r in df.collect()}


def test_extend_equals_fresh_build(spark):
    a, b = _keys(spark, 0, 300), _keys(spark, 300, 500)
    fresh = build_bloom(a.unionByName(b), "text", num_bits=BITS, k=3)
    extended = extend_bloom(
        build_bloom(a, "text", num_bits=BITS, k=3), b, "text", num_bits=BITS, k=3
    )
    assert _words(fresh) == _words(extended)


def test_extend_preserves_no_false_negatives(spark):
    a, b = _keys(spark, 0, 100), _keys(spark, 100, 200)
    bloom = extend_bloom(
        build_bloom(a, "text", num_bits=BITS, k=3), b, "text", num_bits=BITS, k=3
    )
    from localmod_spark.operators.bloom import bloom_maybe_contains

    probed = bloom_maybe_contains(
        a.unionByName(b), bloom, "text", num_bits=BITS, k=3
    )
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_save_load_extend_in_place(spark, tmp_path):
    """The REAL daily lifecycle: load → extend → save back to the SAME
    path.  The extended plan reads the artifact's own data dir, so this
    exercises the tmp-write/swap path (a naive overwrite trips Spark's
    self-overwrite guard AND torches the old filter on failure)."""
    path = str(tmp_path / "bloom")
    bloom = build_bloom(_keys(spark, 0, 200), "text", num_bits=BITS, k=3, seed=9)
    save_bloom(bloom, path, num_bits=BITS, k=3, seed=9, n_keys=200)
    loaded, params = load_bloom(spark, path)
    assert params == {
        "num_bits": BITS, "k": 3, "seed": 9, "n_keys": 200,
        "last_batch": None, "bound_out_dir": None, "corpus_dirs": None,
    }
    assert _words(loaded) == _words(bloom)
    # extend the LOADED filter and save in place
    bigger = extend_bloom(
        loaded, _keys(spark, 200, 300), "text", num_bits=BITS, k=3, seed=9
    )
    save_bloom(bigger, path, num_bits=BITS, k=3, seed=9, n_keys=300)
    loaded2, params2 = load_bloom(spark, path)
    assert params2["n_keys"] == 300
    fresh = build_bloom(_keys(spark, 0, 300), "text", num_bits=BITS, k=3, seed=9)
    assert _words(loaded2) == _words(fresh)


def test_load_refuses_half_written_artifact(spark, tmp_path):
    path = str(tmp_path / "orphan")
    bloom = build_bloom(_keys(spark, 0, 50), "text", num_bits=BITS, k=3)
    save_bloom(bloom, path, num_bits=BITS, k=3, seed=77)
    # simulate a crash between data overwrite and params write
    shutil.rmtree(f"{path}/_bloom_params")
    with pytest.raises(ValueError, match="no readable bloom params"):
        load_bloom(spark, path)


def test_bloom_stats_monotone_and_consistent(spark):
    small = build_bloom(_keys(spark, 0, 50), "text", num_bits=BITS, k=3)
    big = build_bloom(_keys(spark, 0, 1000), "text", num_bits=BITS, k=3)
    s = bloom_stats(small, num_bits=BITS, k=3).collect()[0]
    b = bloom_stats(big, num_bits=BITS, k=3).collect()[0]
    assert 0 < s["fill_ratio"] < b["fill_ratio"] < 1
    assert s["est_fpr"] == pytest.approx(s["fill_ratio"] ** 3, abs=1e-6)
    # filled-word count can never exceed the word-table rows * 64
    assert s["bits_set"] <= s["n_words"] * 64


# --------------------------------------------------------- pipeline rollup


def test_pipeline_conv_rollup_columns_and_consistency(spark, tmp_path):
    from localmod_spark.operators.convmod import conv_decision
    from localmod_spark.plans.pipeline import read_output, run_pipeline
    from localmod_spark.sources.transcripts import synth_transcripts

    out = str(tmp_path / "roll_out")
    turns = synth_transcripts(spark, 400, slices=4)
    rollup = {"max_flag_share": 0.2, "drop_severity": "high"}
    run_pipeline(
        spark, turns, out, n_waves=2, context=False, conv_rollup=rollup
    )
    got = read_output(spark, out)
    assert {"conv_keep", "drop_reason"} <= set(got.columns)
    assert got.count() == 400
    # per-conv values match the operator applied directly to the output
    direct = {
        r["conv_id"]: r["conv_keep"]
        for r in conv_decision(got, **rollup).collect()
    }
    joined = {r["conv_id"]: r["conv_keep"] for r in got.collect()}
    assert joined == direct
    assert False in joined.values() and True in joined.values()


def test_pipeline_conv_rollup_is_part_of_resume_key(spark, tmp_path):
    from localmod_spark.plans.pipeline import read_output, run_pipeline
    from localmod_spark.sources.transcripts import synth_transcripts

    out = str(tmp_path / "key_out")
    turns = synth_transcripts(spark, 200, slices=2)
    res1 = run_pipeline(spark, turns, out, n_waves=2, context=False)
    assert sorted(res1.waves_run) == [0, 1]
    # a resumed run WITH the rollup must rerun, not skip with the wrong schema
    res2 = run_pipeline(
        spark,
        turns,
        out,
        n_waves=2,
        context=False,
        conv_rollup={"max_flag_share": 0.2},
    )
    assert sorted(res2.waves_run) == [0, 1]
    assert "conv_keep" in read_output(spark, out).columns
    # and a second rollup run resumes as a no-op
    res3 = run_pipeline(
        spark,
        turns,
        out,
        n_waves=2,
        context=False,
        conv_rollup={"max_flag_share": 0.2},
    )
    assert res3.waves_run == []
    # CHANGED rollup thresholds are a different resume key — rerun
    res4 = run_pipeline(
        spark,
        turns,
        out,
        n_waves=2,
        context=False,
        conv_rollup={"max_flag_share": 0.5},
    )
    assert sorted(res4.waves_run) == [0, 1]
    # and flipping the rollup OFF must rerun too, despite the stale
    # 'flat' rows the very first run appended (latest-row-wins)
    res5 = run_pipeline(spark, turns, out, n_waves=2, context=False)
    assert sorted(res5.waves_run) == [0, 1]
    assert "conv_keep" not in read_output(spark, out).columns
