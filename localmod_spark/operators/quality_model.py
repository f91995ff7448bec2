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
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    feats = _feature_pipeline(text_col, dim)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[feats, lr]).fit(
        labeled.select(text_col, F.col(label_col).cast("double").alias(label_col))
    )


def score_quality(model, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``model_quality`` = P(good | text) ∈ [0,1] (rounded to 6),
    dropping the intermediate feature columns."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs)
    return scored.withColumn(
        "model_quality",
        F.round(vector_to_array(F.col("probability")).getItem(1), 6),
    ).drop("_toks", "features", "rawPrediction", "probability", "prediction")
