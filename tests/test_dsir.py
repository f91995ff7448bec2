"""DSIR importance resampling (operators/dsir.py): target recovery,
model completeness, exact-k determinism, and the plan-level scale claim."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.dsir import (
    dsir_logweights,
    dsir_select,
    gumbel_noise,
    hashed_gram_counts,
    hashed_lm_logprobs,
)

_FORMAL = [
    "the committee reviewed the annual report and approved the budget",
    "the council published the findings of the independent review",
    "the report summarizes the committee findings for the annual budget",
    "members of the council reviewed the published annual findings",
]
_SLANG = [
    "lol that meme was fire no cap fr fr",
    "bro the stream was lit ngl gg wp",
    "yo the clip went viral lmao so fire",
    "ngl bro that play was cracked gg fr",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t, "formal" if i < len(_FORMAL) else "slang")
            for i, t in enumerate(_FORMAL + _SLANG)]
    return spark.createDataFrame(rows, "doc_id long, text string, register string")


def test_weights_prefer_target_like_docs(spark, corpus):
    """Docs sharing the target's vocabulary must outscore the rest —
    the whole point of the selector."""
    target = corpus.where(F.col("register") == "formal")
    out = dsir_logweights(corpus, target, buckets=128).collect()
    w = {r["doc_id"]: r["dsir_logw"] for r in out}
    worst_formal = min(w[i] for i in range(len(_FORMAL)))
    best_slang = max(w[i + len(_FORMAL)] for i in range(len(_SLANG)))
    assert worst_formal > best_slang


def test_model_is_complete_and_normalized(spark, corpus):
    """Exactly ``buckets`` rows, and the smoothed probabilities sum to 1
    (the add-alpha model is a proper distribution over buckets)."""
    lm = hashed_lm_logprobs(corpus, buckets=64, alpha=0.5).collect()
    assert len(lm) == 64
    assert sorted(r["bk"] for r in lm) == list(range(64))
    assert math.isclose(sum(math.exp(r["logp"]) for r in lm), 1.0, rel_tol=1e-9)


def test_gram_counts_unigram_plus_bigram(spark):
    """A 3-word doc contributes 3 unigrams + 2 bigrams; a 1-word doc
    only its unigram (the descending-sequence guard)."""
    df = spark.createDataFrame([(1, "a b a"), (2, "solo")], "doc_id long, text string")
    n = {r["doc_id"]: r["total"] for r in
         hashed_gram_counts(df, buckets=1024).groupBy("doc_id")
         .agg(F.sum("n").alias("total")).collect()}
    assert n == {1: 5, 2: 1}


def test_select_exact_k_deterministic_and_partition_stable(spark, corpus):
    target = corpus.where(F.col("register") == "formal")
    a = dsir_select(corpus, target, k=3, buckets=128)
    b = dsir_select(corpus.repartition(7), target, k=3, buckets=128)
    ra = sorted((r["doc_id"], r["dsir_rk"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["dsir_rk"]) for r in b.collect())
    assert ra == rb
    assert len(ra) == 3
    assert sorted(rk for _, rk in ra) == [1, 2, 3]
    with pytest.raises(ValueError):
        dsir_select(corpus, target, k=-1)


def test_seed_changes_the_draw_but_not_the_weights(spark, corpus):
    """The Gumbel perturbation is seed-keyed; the importance weights are
    not — reseeding resamples WITHOUT rescoring."""
    target = corpus.where(F.col("register") == "formal")
    picks = [
        tuple(r["doc_id"] for r in
              dsir_select(corpus, target, k=6, buckets=128, seed=s)
              .orderBy("dsir_rk").collect())
        for s in range(6)
    ]
    # k=6 reaches past the 4 target-vocab docs into the near-tied rest,
    # where the perturbation decides — some seed must reorder the draw
    assert len(set(picks)) > 1
    g1 = gumbel_noise(F.col("doc_id"), seed=1)
    g2 = gumbel_noise(F.col("doc_id"), seed=2)
    gs = corpus.select(g1.alias("a"), g2.alias("b")).collect()
    assert any(abs(r["a"] - r["b"]) > 1e-9 for r in gs)


def test_blank_text_scores_zero(spark, corpus):
    target = corpus.limit(2)
    df = corpus.unionByName(
        corpus.sparkSession.createDataFrame(
            [(99, "   ", "blank")], "doc_id long, text string, register string"
        )
    )
    out = {r["doc_id"]: r["dsir_logw"] for r in dsir_logweights(df, target, buckets=64).collect()}
    assert out[99] == 0.0


def test_select_plan_is_pre_exchange_topk_with_broadcast_models(spark, corpus):
    """Scale claims, plan-asserted per repo convention: the global
    ``rk <= k`` rank filter plans as TakeOrderedAndProject — a
    distributed top-k (per-partition heap + k-row merge), NO full-corpus
    sort — and the buckets-row model table reaches the scoring join as a
    broadcast."""
    target = corpus.where(F.col("register") == "formal")
    out = dsir_select(corpus, target, k=3, buckets=128)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=3" in plan
    assert "BroadcastHashJoin" in plan


def test_oracle_agrees_on_messy_whitespace_corpus(spark):
    """Operator/oracle tokenizer parity beyond the fixture corpus: tabs,
    newlines and double spaces must bucket identically in Spark (\\s+
    split) and the DuckDB replay (regexp_split_to_array '\\s+')."""
    import duckdb

    from localmod_spark.operators.dsir import dsir_oracle_sql

    rows = [
        (0, "alpha\tbeta  gamma", "en"),
        (1, "alpha beta\ngamma", "en"),
        (2, "delta  epsilon\tzeta", "fr"),
        (3, " alpha\t beta gamma ", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_select(df, df.where(F.col("lang") == "en"), k=4, buckets=64)
    got = sorted(
        (r["doc_id"], r["lang"], round(r["dsir_logw"], 4), r["dsir_rk"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        (d, lg, lw, rk)
        for d, lg, lw, rk in con.execute(
            dsir_oracle_sql(k=4, buckets=64, alpha=1.0)
        ).fetchall()
    )
    assert got == want
    # docs 0, 1 and 3 tokenize identically -> identical log-weights
    w = {d: lw for d, _, lw, _ in got}
    assert w[0] == w[1] == w[3]
