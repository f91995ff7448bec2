"""Trained quality classifier (operators/quality_model.py): planted
separation, held-out generalization, deterministic scoring."""

import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.quality_model import score_quality, train_quality_classifier

GOOD = [
    "the committee reviewed the annual report and approved the budget for next year",
    "researchers measured the glacier retreat over three decades of field observations",
    "the library extended its opening hours after consulting with student groups",
    "a new bridge connects the two districts and shortens the daily commute",
    "the orchestra performed a program of early romantic symphonies last night",
    "local farmers adapted their crop rotation to the changing rainfall patterns",
    "the museum restored the painting using techniques developed by its own lab",
    "city planners proposed wider sidewalks and more shade trees downtown",
]
BAD = [
    "zzz qqq xjw vvv kpt zzz qqq xjw lorem click here buy now win",
    "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa",
    "qwerty asdf zxcv qwerty asdf zxcv uiop hjkl vbnm",
    "111 222 333 444 555 666 777 888 999 000 xxx yyy",
    "buy cheap buy cheap buy cheap click click click free free free",
    "kfjd sldk fjsl dkfj slkd fjsl dkfj slkd fjsl dkfj",
    "spam spam spam eggs spam spam spam eggs spam spam",
    "xoxo zzz xoxo zzz xoxo zzz xoxo zzz xoxo zzz xoxo",
]


@pytest.fixture(scope="module")
def model(spark):
    rows = [(t, 1) for t in GOOD[:6]] + [(t, 0) for t in BAD[:6]]
    labeled = spark.createDataFrame(rows, "text string, label int")
    return train_quality_classifier(labeled, dim=1 << 12, max_iter=25)


def test_classifier_separates_planted_sets(spark, model):
    rows = [(i, t) for i, t in enumerate(GOOD + BAD)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scored = {r.doc_id: r.model_quality for r in score_quality(model, docs).collect()}
    good_scores = [scored[i] for i in range(len(GOOD))]
    bad_scores = [scored[len(GOOD) + i] for i in range(len(BAD))]
    assert min(good_scores[:6]) > max(bad_scores[:6])  # training rows separate


def test_classifier_generalizes_to_heldout(spark, model):
    """The two held-out rows per class (never seen in training) rank
    correctly — hashed-token features carry the signal."""
    docs = spark.createDataFrame(
        [(0, GOOD[6]), (1, GOOD[7]), (2, BAD[6]), (3, BAD[7])],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.model_quality for r in score_quality(model, docs).collect()}
    assert min(s[0], s[1]) > max(s[2], s[3])


def test_scoring_is_deterministic_and_jvm_side(spark, model):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(GOOD)], "doc_id long, text string")
    a = {r.doc_id: r.model_quality for r in score_quality(model, docs).collect()}
    b = {r.doc_id: r.model_quality for r in score_quality(model, docs.repartition(7)).collect()}
    assert a == b
    plan = score_quality(model, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python in scoring
    out = score_quality(model, docs)
    assert set(out.columns) == {"doc_id", "text", "model_quality"}
    assert all(0.0 <= v <= 1.0 for v in a.values())


def test_bigram_features_hold_accuracy_on_planted_corpora(spark):
    """fastText-faithful word-bigram features (bigrams=True): held-out
    pairwise ranking accuracy (all good-vs-bad held-out pairs ordered
    correctly) must be at least the unigram baseline's on the planted
    corpora, and the scoring path stays JVM-only through the save/load
    roundtrip (SQLTransformer + NGram serialize with the PipelineModel)."""
    rows = [(t, 1) for t in GOOD[:6]] + [(t, 0) for t in BAD[:6]]
    labeled = spark.createDataFrame(rows, "text string, label int")
    docs = spark.createDataFrame(
        [(0, GOOD[6]), (1, GOOD[7]), (2, BAD[6]), (3, BAD[7])],
        "doc_id long, text string",
    )

    def heldout_acc(m) -> float:
        s = {r.doc_id: r.model_quality for r in score_quality(m, docs).collect()}
        pairs = [(g, b) for g in (0, 1) for b in (2, 3)]
        return sum(s[g] > s[b] for g, b in pairs) / len(pairs)

    uni = train_quality_classifier(labeled, dim=1 << 12, max_iter=25)
    bi = train_quality_classifier(labeled, dim=1 << 12, max_iter=25, bigrams=True)
    assert heldout_acc(bi) >= heldout_acc(uni)
    assert heldout_acc(bi) == 1.0
    plan = score_quality(bi, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    out = score_quality(bi, docs)
    assert set(out.columns) == {"doc_id", "text", "model_quality"}


def test_bigrams_capture_word_order_unigrams_cannot(spark):
    """The reason bigrams exist: a sentence and its reversal have
    IDENTICAL unigram features, so a unigram model is blind to word
    order; the bigram model separates fluent from reversed text —
    including held-out sentences sharing only the phrase vocabulary."""
    fluent = [
        "the cat chased the bird near the old house",
        "the dog watched the fish near the old house",
        "the bird found the cat near the old barn",
        "the fish chased the dog near the old barn",
    ]
    heldout_fluent = "the dog chased the bird near the old house"

    def reverse(t: str) -> str:
        return " ".join(reversed(t.split()))

    rows = [(t, 1) for t in fluent] + [(reverse(t), 0) for t in fluent]
    labeled = spark.createDataFrame(rows, "text string, label int")
    docs = spark.createDataFrame(
        [(0, heldout_fluent), (1, reverse(heldout_fluent))], "doc_id long, text string"
    )
    bi = train_quality_classifier(labeled, dim=1 << 12, max_iter=25, bigrams=True)
    uni = train_quality_classifier(labeled, dim=1 << 12, max_iter=25)
    s_bi = {r.doc_id: r.model_quality for r in score_quality(bi, docs).collect()}
    s_uni = {r.doc_id: r.model_quality for r in score_quality(uni, docs).collect()}
    assert s_bi[0] - s_bi[1] > 0.2  # bigrams separate order
    assert abs(s_uni[0] - s_uni[1]) < 0.05  # unigrams provably cannot


def test_model_path_artifact_is_kept(spark, tmp_path):
    """model_path persists the artifact for the caller (a model-registry
    entry) and the returned model is the loaded-back one."""
    import os

    from pyspark.ml import PipelineModel

    rows = [(t, 1) for t in GOOD[:4]] + [(t, 0) for t in BAD[:4]]
    labeled = spark.createDataFrame(rows, "text string, label int")
    path = str(tmp_path / "qm_artifact")
    m = train_quality_classifier(labeled, dim=1 << 10, max_iter=10, model_path=path)
    assert os.path.isdir(path)  # artifact kept, not cleaned up
    reloaded = PipelineModel.load(path)
    docs = spark.createDataFrame([(0, GOOD[0])], "doc_id long, text string")
    a = score_quality(m, docs).collect()[0].model_quality
    b = score_quality(reloaded, docs).collect()[0].model_quality
    assert a == b
