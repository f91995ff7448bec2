"""Replicates the reference's published PII benchmark: the synthetic
balanced dataset from `evaluation/chi2025_benchmark.py:134-192`
(`synthetic_pii_v1`, n=2000) on which the reference reports
precision/recall/F1 = 1.0000 with FP=0 FN=0 (`README.md:36`,
`evaluation/chi2025_benchmark_results.json`).

Our Spark pipeline must reproduce that exactly — this ties the repo to a
*published* reference accuracy number end-to-end (generation → Spark
scoring → the A5 metrics operator)."""

import pytest

from localmod_spark.operators.evaluate import classification_metrics
from localmod_spark.operators.score import score_turns

N = 2000

_SAFE_TEMPLATES = [
    "Let's meet tomorrow at the office.",
    "The quick brown fox jumps over the lazy dog.",
    "Can you review this PR before EOD?",
    "Dinner was great, thanks for hosting.",
    "Reminder: standup at 10am.",
]

_PII_TEMPLATES = [
    "Email me at {email} about the invoice.",
    "Call me at {phone} when you arrive.",
    "My SSN is {ssn} (do not share).",
    "Card number: {cc} exp 11/29.",
    "Reach me: {email} or {phone}.",
]


def _synthetic_pii(n: int):
    """1:1 re-expression of `_make_synthetic_pii_dataset`
    (`chi2025_benchmark.py:134-192`); the rng shuffle is omitted — order
    doesn't affect the metrics."""
    n_pos = n // 2
    n_neg = n - n_pos
    data = []
    for i in range(n_neg):
        data.append((_SAFE_TEMPLATES[i % len(_SAFE_TEMPLATES)], 0))
    for i in range(n_pos):
        t = _PII_TEMPLATES[i % len(_PII_TEMPLATES)].format(
            email=f"user{i}@example.com",
            phone=f"555-{1000 + (i % 9000):04d}",
            ssn=f"{100 + (i % 899):03d}-{10 + (i % 89):02d}-{1000 + (i % 8999):04d}",
            cc="4111 1111 1111 1111",
        )
        data.append((t, 1))
    return data


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [(i, t, bool(y)) for i, (t, y) in enumerate(_synthetic_pii(N))]
    df = spark.createDataFrame(rows, "id long, text string, label boolean").repartition(8)
    scored = score_turns(df)
    pairs = scored.selectExpr("pii_flagged as pred", "label")
    return classification_metrics(pairs).collect()[0]


def test_pii_benchmark_perfect_f1(metrics):
    """README.md:36: precision 1.0000 / recall 1.0000 / F1 1.0000."""
    assert metrics.precision == 1.0
    assert metrics.recall == 1.0
    assert metrics.f1 == 1.0


def test_pii_benchmark_confusion(metrics):
    """FP = 0, FN = 0, n = 2000 (chi2025_benchmark_results.json)."""
    assert metrics.fp == 0 and metrics.fn == 0
    assert metrics.tp + metrics.tn == N
