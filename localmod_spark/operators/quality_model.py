"""Trainable document-quality classifier — the supervised counterpart of
the heuristic quality score (`kernel/quality.py`).

The standard corpus-curation pattern (GPT-3/CCNet-style): label a small
seed set (curated = good vs raw crawl = bad), train a linear classifier
over hashed token n-gram counts — the fastText shape — and score the
full corpus with it; the score then feeds the same selection machinery
as the heuristic quality column (``select_representatives``,
``select_token_budget``...).

Spark-first: features are built with ``pyspark.ml.feature`` (JVM-side
tokenize → hash → TF — no Python in the scoring path) and the model is
``pyspark.ml.classification.LogisticRegression`` — distributed L-BFGS,
the driver only holds the coefficient vector (``dim`` floats — a model
parameter, not data).  Scoring a 10^12-row corpus is one narrow
mapPartitions-free transform: hash + dot product per row inside the JVM.

No SQL oracle (iterative training is not SQL-expressible); verification
is behavioral — planted-separation, held-out accuracy, determinism-of-
scoring — in tests/test_quality_model.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_pipeline(text_col: str, dim: int):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_toks", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(inputCol="_toks", outputCol="features", numFeatures=dim)
    return Pipeline(stages=[tok, tf])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 1 << 16,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit tokenize→hashTF→logistic-regression on a labeled seed set
    (label 1 = good/curated, 0 = bad/raw).  Returns the fitted
    ``pyspark.ml.PipelineModel`` — apply with :func:`score_quality`.

    The seed set is small by construction (curation is the expensive
    part); training cost is per-seed-row, scoring cost is per-corpus-row
    and fully JVM-side."""
    import os
    import tempfile
    import uuid

    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression

    feats = _feature_pipeline(text_col, dim)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    fitted = Pipeline(stages=[feats, lr]).fit(
        labeled.select(text_col, F.col(label_col).cast("double").alias(label_col))
    )
    # Save/load roundtrip before returning: the freshly-fitted LR model
    # carries a trainingSummary that references the SparkSession, and the
    # scoring UDF's closure serialization can drag that reference into
    # tasks (observed: NotSerializableException on ObservationManager in
    # sessions that ran multithreaded observed jobs).  Persisted models
    # drop the summary — and production scores from a saved artifact
    # anyway, so the roundtrip also keeps that path exercised.
    path = os.path.join(tempfile.gettempdir(), f"quality_model_{uuid.uuid4().hex}")
    try:
        fitted.write().overwrite().save(path)
        return PipelineModel.load(path)
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def score_quality(model, docs: DataFrame, text_col: str = None) -> DataFrame:
    """Append ``model_quality`` = P(good | text) ∈ [0,1] (rounded to 6),
    dropping the intermediate feature columns.  ``text_col`` scores a
    column other than the one the model was trained on (renamed for the
    transform, restored in the output)."""
    from pyspark.ml.functions import vector_to_array

    # first leaf stage with an inputCol = the tokenizer (the pipeline may
    # nest the feature stages inside an inner PipelineModel)
    def _first_input_col(m):
        for st in getattr(m, "stages", []):
            if hasattr(st, "getInputCol"):
                return st.getInputCol()
            found = _first_input_col(st)
            if found is not None:
                return found
        return None

    trained_col = _first_input_col(model)
    renamed = text_col is not None and text_col != trained_col
    if renamed:
        if trained_col in docs.columns:
            raise ValueError(
                f"cannot score {text_col!r}: docs already has a {trained_col!r} column "
                f"(the model's trained input) — drop or rename it first"
            )
        docs = docs.withColumnRenamed(text_col, trained_col)
    scored = model.transform(docs)
    out = scored.withColumn(
        "model_quality",
        F.round(vector_to_array(F.col("probability")).getItem(1), 6),
    ).drop("_toks", "features", "rawPrediction", "probability", "prediction")
    return out.withColumnRenamed(trained_col, text_col) if renamed else out
