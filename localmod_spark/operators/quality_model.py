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


def _feature_pipeline(text_col: str, dim: int, bigrams: bool = False):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, SQLTransformer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_toks", pattern=r"\s+", toLowercase=True
    )
    if not bigrams:
        tf = HashingTF(inputCol="_toks", outputCol="features", numFeatures=dim)
        return Pipeline(stages=[tok, tf])
    # fastText-faithful features: word bigrams UNIONED with the unigrams
    # into one token stream before hashing — one shared hash space (the
    # fastText bucket trick), still entirely JVM-side (NGram and the
    # array concat are catalyst expressions; SQLTransformer serializes
    # with the PipelineModel so the scoring path stays save/load-able)
    ng = NGram(n=2, inputCol="_toks", outputCol="_bigrams")
    cat = SQLTransformer(
        statement="SELECT *, concat(_toks, _bigrams) AS _grams FROM __THIS__"
    )
    tf = HashingTF(inputCol="_grams", outputCol="features", numFeatures=dim)
    return Pipeline(stages=[tok, ng, cat, tf])


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 1 << 16,
    max_iter: int = 50,
    reg_param: float = 1e-4,
    model_path: str = None,
    bigrams: bool = False,
):
    """Fit tokenize→hashTF→logistic-regression on a labeled seed set
    (label 1 = good/curated, 0 = bad/raw).  Returns the fitted
    ``pyspark.ml.PipelineModel`` — apply with :func:`score_quality`.

    The seed set is small by construction (curation is the expensive
    part); training cost is per-seed-row, scoring cost is per-corpus-row
    and fully JVM-side.

    ``model_path`` (optional) persists the fitted model there — any
    Hadoop-FS URI (hdfs://, s3a://, file://); the artifact is KEPT (it is
    the caller's model registry entry) and the returned model is loaded
    back from it.  With the default ``None`` the roundtrip uses a
    driver-local temp dir addressed with an explicit ``file://`` scheme
    and removes it afterwards — this ASSUMES a local[*] master (Spark ML
    writers save model parts from executor tasks, so on a multi-node
    cluster a driver-local path would scatter parts across executor
    disks); non-local masters must pass ``model_path`` on a shared
    filesystem, enforced with a clear error.

    ``bigrams=True`` hashes word bigrams alongside the unigrams (the
    fastText n-gram trick — word order is what separates fluent prose
    from keyword soup); same hash space, same JVM-only scoring path."""
    import os
    import tempfile
    import uuid

    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression

    feats = _feature_pipeline(text_col, dim, bigrams=bigrams)
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
    if model_path is not None:
        fitted.write().overwrite().save(model_path)
        return PipelineModel.load(model_path)
    master = labeled.sparkSession.conf.get("spark.master", "")
    if not master.startswith("local"):
        raise ValueError(
            f"train_quality_classifier's default temp roundtrip assumes a local "
            f"master (got {master!r}): ML save jobs write model parts from "
            "executors, so a driver-local temp dir would scatter them across "
            "nodes — pass model_path on a shared filesystem (hdfs://, s3a://)"
        )
    local = os.path.join(tempfile.gettempdir(), f"quality_model_{uuid.uuid4().hex}")
    path = f"file://{local}"
    try:
        fitted.write().overwrite().save(path)
        return PipelineModel.load(path)
    finally:
        import shutil

        # the file:// scheme pinned the artifact to the driver's local
        # disk regardless of fs.defaultFS, so a local rmtree is exact
        shutil.rmtree(local, ignore_errors=True)


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
    ).drop(
        "_toks", "_bigrams", "_grams", "features",
        "rawPrediction", "probability", "prediction",
    )
    return out.withColumnRenamed(trained_col, text_col) if renamed else out
