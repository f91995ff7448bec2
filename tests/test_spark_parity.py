"""THE correctness gate (BASELINE.md): Spark pipeline output vs the
reference-kernel oracle on the fixture transcript corpus —

  * keep/drop F1 ≥ 0.99 (target: exact agreement),
  * scrubbed text byte-exact,
  * severity/summary/confidence agreement.

The oracle is `analyze_text` per turn (validated against the actual
reference implementation — see tests/test_kernel_*).  F1 is computed as in
the reference benchmark harness (`evaluation/chi2025_benchmark.py:86-115`,
positive class = drop/flagged).
"""

import pandas as pd
import pytest

from localmod_spark.kernel.aggregate import analyze_text
from localmod_spark.operators.score import score_turns
from localmod_spark.sources.transcripts import synth_transcripts

N_TURNS = 3000


@pytest.fixture(scope="module")
def scored_vs_oracle(spark):
    turns = synth_transcripts(spark, N_TURNS, slices=8)
    got = (
        score_turns(turns)
        .select(
            "conv_id", "turn_idx", "text", "keep", "severity", "summary",
            "scrubbed_text", "redaction_count",
            "tox_conf", "pii_conf", "inj_conf", "spam_conf", "nsfw_conf",
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    oracle = pd.DataFrame([analyze_text(t) for t in got["text"]])
    return got, oracle


def test_rowcount(scored_vs_oracle):
    got, _ = scored_vs_oracle
    assert len(got) == N_TURNS


def test_keep_drop_f1_gate(scored_vs_oracle):
    got, oracle = scored_vs_oracle
    pred_drop = ~got["keep"].to_numpy()
    true_drop = oracle["flagged"].to_numpy()
    tp = int((pred_drop & true_drop).sum())
    fp = int((pred_drop & ~true_drop).sum())
    fn = int((~pred_drop & true_drop).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    assert true_drop.sum() > 100, "fixture mix must include plenty of drops"
    assert f1 >= 0.99, (tp, fp, fn)
    assert f1 == 1.0  # deterministic kernel on both sides → exact


def test_scrubbed_text_byte_exact(scored_vs_oracle):
    got, oracle = scored_vs_oracle
    mismatches = (got["scrubbed_text"].fillna("") != oracle["scrubbed_text"].fillna("")).sum()
    assert mismatches == 0
    assert (got["redaction_count"] == oracle["redaction_count"]).all()


def test_severity_and_summary_exact(scored_vs_oracle):
    got, oracle = scored_vs_oracle
    assert (got["severity"] == oracle["severity"]).all()
    assert (got["summary"] == oracle["summary"]).all()


def test_confidences_exact(scored_vs_oracle):
    got, oracle = scored_vs_oracle
    for col in ["tox_conf", "pii_conf", "inj_conf", "spam_conf", "nsfw_conf"]:
        assert (got[col].to_numpy() == oracle[col].to_numpy()).all(), col
