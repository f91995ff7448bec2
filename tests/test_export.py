"""Staged corpus export (plans/export.py): mix → shuffle → shards with
parameter-aware resume and rerun-stable shard contents."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from localmod_spark.plans.export import run_export  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
WEIGHTS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


@pytest.fixture(scope="module")
def docs(spark):
    from localmod_spark.sources.tables import load_table

    return load_table(spark, SF0001, "documents")


def _shard_sets(df):
    out: dict = {}
    for r in df.select("shard", "doc_id").collect():
        out.setdefault(r["shard"], set()).add(r["doc_id"])
    return out


def test_export_end_to_end_shapes_and_shares(spark, docs, tmp_path):
    out = str(tmp_path / "exp")
    res = run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=4, seed=3)
    assert res.stages_run == ["mixed", "shards"]
    shards = res.shards
    assert {r["shard"] for r in shards.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # token shares track the weights (within one doc per source)
    spent = {
        r["lang"]: r["t"]
        for r in shards.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    for lang, w in WEIGHTS.items():
        assert spent[lang] <= 8000 * w
        assert spent[lang] > 8000 * w - 200
    # every selected doc landed in exactly one shard
    assert shards.count() == shards.select("doc_id").distinct().count()


def test_export_resume_skips_both_stages(spark, docs, tmp_path):
    out = str(tmp_path / "exp")
    run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=4, seed=3)
    again = run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=4, seed=3)
    assert again.stages_run == []
    assert again.stages_skipped == ["mixed", "shards"]


def test_export_reshard_reuses_the_staged_mix(spark, docs, tmp_path):
    out = str(tmp_path / "exp")
    first = run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=4, seed=3)
    # materialize BEFORE resharding: the shards dir is overwritten in place
    first_ids = {r["doc_id"] for r in first.shards.select("doc_id").collect()}
    reshard = run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=8, seed=9)
    assert reshard.stages_run == ["shards"]  # the mix stage is parameter-stable
    assert {r["doc_id"] for r in reshard.shards.select("doc_id").collect()} == first_ids
    assert reshard.shards.select("shard").distinct().count() == 8


def test_export_weight_change_invalidates_downstream(spark, docs, tmp_path):
    out = str(tmp_path / "exp")
    run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=4, seed=3)
    new_w = dict(WEIGHTS, en=0.2, de=0.35)
    res = run_export(spark, docs, out, new_w, total_budget=8000, n_shards=4, seed=3)
    assert res.stages_run == ["mixed", "shards"]  # shards params embed the mix's
    spent = {
        r["lang"]: r["t"]
        for r in res.shards.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert spent["de"] > spent["en"]  # the new weights actually took effect


def test_export_is_rerun_stable_across_dirs_and_partitionings(spark, docs, tmp_path):
    a = run_export(
        spark, docs.repartition(7), str(tmp_path / "a"), WEIGHTS,
        total_budget=6000, n_shards=4, seed=11,
    )
    b = run_export(
        spark, docs.coalesce(1), str(tmp_path / "b"), WEIGHTS,
        total_budget=6000, n_shards=4, seed=11,
    )
    assert _shard_sets(a.shards) == _shard_sets(b.shards)


def test_export_with_real_bpe_counts(spark, docs, tmp_path):
    from localmod_spark.operators.bpe import PINNED_MERGES

    res = run_export(
        spark, docs, str(tmp_path / "bpe"), WEIGHTS,
        total_budget=20000, n_shards=2, seed=1, bpe_merges=PINNED_MERGES,
    )
    assert "n_bpe_tokens" in res.shards.columns
    assert res.shards.count() > 0


def test_bpe_retrain_invalidates_the_staged_mix(spark, docs, tmp_path):
    """The invalidation key carries the TOKENIZER IDENTITY: re-exporting
    with different merges (a retrained BPE) must recompute the mix, not
    silently reuse counts budgeted under the old vocabulary."""
    from localmod_spark.operators.bpe import PINNED_MERGES

    out = str(tmp_path / "exp")
    run_export(
        spark, docs, out, WEIGHTS, total_budget=20000, n_shards=2, seed=1,
        bpe_merges=PINNED_MERGES,
    )
    res = run_export(
        spark, docs, out, WEIGHTS, total_budget=20000, n_shards=2, seed=1,
        bpe_merges=PINNED_MERGES[:8],  # "retrained" vocabulary
    )
    assert res.stages_run == ["mixed", "shards"]
    # and identical merges still resume cleanly
    res2 = run_export(
        spark, docs, out, WEIGHTS, total_budget=20000, n_shards=2, seed=1,
        bpe_merges=PINNED_MERGES[:8],
    )
    assert res2.stages_run == []


def test_crash_mid_overwrite_is_not_trusted(spark, docs, tmp_path, monkeypatch):
    """Stage dirs are overwritten IN PLACE, so a rerun that dies between
    the running marker and the done row must not let an OLDER matching
    done row vouch for the (possibly half-written) dir."""
    import localmod_spark.operators.sampling as samp

    out = str(tmp_path / "exp")
    run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=4, seed=3)

    def _boom(*a, **kw):
        raise RuntimeError("simulated crash during the mix overwrite")

    monkeypatch.setattr(samp, "mix_corpora", _boom)
    new_w = dict(WEIGHTS, en=0.2, de=0.35)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_export(spark, docs, out, new_w, total_budget=8000, n_shards=4, seed=3)
    monkeypatch.undo()

    # the no-params status check honors the marker too (a monitoring
    # caller without the params must not see the stage as done)
    from localmod_spark.plans.export import EXPORT_STAGES
    from localmod_spark.plans.selection import completed_stages

    assert "mixed" not in completed_stages(spark, out, stages=EXPORT_STAGES)

    # resuming with the ORIGINAL params: the newest 'mixed' ledger row is
    # the crashed run's running marker, so the stage recomputes rather
    # than trusting the old done row
    with pytest.warns(UserWarning, match="recomputing"):
        res = run_export(spark, docs, out, WEIGHTS, total_budget=8000, n_shards=4, seed=3)
    assert "mixed" in res.stages_run
    assert res.shard_rows == res.shards.count()  # ledger count is exact


def test_mix_warns_on_ghost_source(spark, docs):
    from localmod_spark.operators.sampling import mix_corpora

    with pytest.warns(UserWarning, match="no tokens in the input"):
        sel = mix_corpora(
            docs.withColumn("n_tokens", F.length("text")),
            {"en": 0.5, " de": 0.5},  # ' de' = the CLI-whitespace typo shape
            2000,
            source_col="lang",
        )
        assert {r["lang"] for r in sel.select("lang").distinct().collect()} == {"en"}
