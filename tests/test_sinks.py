"""Sink operators: JSON report, explanation strings, jsonl export."""

import json

from pyspark.sql import functions as F

from localmod_spark.operators.score import score_turns
from localmod_spark.sources.sinks import with_explanation, with_report_json, write_jsonl
from localmod_spark.sources.transcripts import synth_transcripts


def test_explanation_format(spark):
    scored = score_turns(synth_transcripts(spark, 120, slices=1))
    out = with_explanation(scored)
    passed = out.where(~F.col("flagged")).select("explanation").first()[0]
    assert passed.startswith("Content passed pipeline check (confidence: ")
    assert passed.endswith("%)")
    flagged = out.where(F.col("flagged")).select("explanation", "severity").first()
    assert flagged.explanation.startswith("Content flagged by pipeline (confidence: ")
    assert f"severity: {flagged.severity})" in flagged.explanation


def test_jsonl_roundtrip(spark, tmp_path):
    scored = score_turns(synth_transcripts(spark, 80, slices=1))
    d = str(tmp_path / "jsonl")
    write_jsonl(scored, d)
    back = spark.read.json(d)
    assert back.count() == 80
    doc = json.loads(back.select("report").first()[0])
    assert set(doc) >= {"flagged", "severity", "summary", "results"}
    # confidence rounded to 4 decimals (`models/base.py:33`)
    for r in doc["results"]:
        assert round(r["confidence"], 4) == r["confidence"]


def test_report_confidences_match_columns(spark):
    scored = score_turns(synth_transcripts(spark, 60, slices=1))
    row = with_report_json(scored).select("report", "tox_conf", "spam_conf").first()
    doc = json.loads(row.report)
    by_name = {r["classifier"]: r["confidence"] for r in doc["results"]}
    assert by_name["toxicity"] == round(row.tox_conf, 4)
    assert by_name["spam"] == round(row.spam_conf, 4)


def test_report_json_matches_safety_report_shape(spark):
    """Full SafetyReport.to_dict fidelity (`pipeline.py:27-35`): top-level
    key set, per-result key set (`models/base.py:29-38`), per-classifier
    severity, flagged-only categories, measured processing_time_ms, and
    pipeline metadata."""
    import json

    from localmod_spark.operators.score import score_turns
    from localmod_spark.sources.sinks import with_report_json

    df = spark.createDataFrame(
        [("c", 0, "My SSN is 123-45-6789"), ("c", 1, "a perfectly fine sentence")],
        "conv_id string, turn_idx int, text string",
    )
    rows = {r.turn_idx: json.loads(r.report)
            for r in with_report_json(score_turns(df)).collect()}

    for rep in rows.values():
        assert set(rep) == {"flagged", "severity", "results", "summary",
                            "processing_time_ms", "metadata"}
        assert rep["metadata"] == {
            "classifiers_run": ["toxicity", "pii", "prompt_injection", "spam", "nsfw"],
            "device": "cpu",
        }
        assert rep["processing_time_ms"] > 0
        assert [r["classifier"] for r in rep["results"]] == [
            "toxicity", "pii", "prompt_injection", "spam", "nsfw"]
        for r in rep["results"]:
            assert set(r) == {"classifier", "flagged", "confidence", "severity",
                              "categories", "metadata", "explanation"}

    pii_res = next(r for r in rows[0]["results"] if r["classifier"] == "pii")
    assert rows[0]["flagged"] and pii_res["flagged"]
    assert pii_res["categories"] == ["ssn"] and pii_res["confidence"] == 1.0
    assert pii_res["severity"] in ("high", "critical")

    clean = rows[1]
    assert not clean["flagged"]
    assert all(r["categories"] == [] for r in clean["results"])  # flagged-only
    assert all(r["severity"] == "none" for r in clean["results"])


def test_report_subset_classifiers_run(spark):
    """ADVICE r3: a pipeline with classifiers disabled must not emit a
    report claiming they ran — classifiers_run and results[] reflect the
    enabled subset, in registry order."""
    from localmod_spark.kernel.aggregate import DEFAULT_CONFIG

    subset = ("pii", "spam")
    cfg = DEFAULT_CONFIG._replace(classifiers=subset)
    scored = score_turns(synth_transcripts(spark, 40, slices=1), cfg=cfg)
    doc = json.loads(with_report_json(scored, classifiers=subset).select("report").first()[0])
    assert doc["metadata"]["classifiers_run"] == ["pii", "spam"]
    assert [r["classifier"] for r in doc["results"]] == ["pii", "spam"]
