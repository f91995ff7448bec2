"""Output sinks (reference S6 + the target's table-out contract).

The reference serializes reports to JSON (`src/localmod/pipeline.py:27-35`,
`src/localmod/models/base.py:29-38`); the batch engine's equivalents:

  * parquet/Iceberg table writes partitioned by the wave/bucket column
    (plans/pipeline.py handles the resumable path);
  * a JSON-lines sink for interop — one ``report`` JSON string per turn,
    with confidence rounded to 4 decimals as the reference's ``to_dict``
    does (`models/base.py:33`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: registry order (`src/localmod/classifiers/__init__.py:29-35`)
ALL_CLASSIFIERS = ("toxicity", "pii", "prompt_injection", "spam", "nsfw")


def with_report_json(scored: DataFrame, device: str = "cpu", classifiers=None) -> DataFrame:
    """Append ``report``: the per-turn JSON document with the FULL
    ``SafetyReport.to_dict`` shape (`src/localmod/pipeline.py:27-35`):
    flagged, severity, results[] (each with classifier, flagged,
    confidence rounded to 4 per `models/base.py:33`, severity,
    flagged-only categories, metadata, explanation), summary,
    processing_time_ms rounded to 2, and the pipeline metadata
    (classifiers_run, device — `pipeline.py:139-142`).

    ``classifiers``: the ENABLED classifier set (pass
    ``PipelineConfig.classifiers``; default = all five).  results[] and
    metadata.classifiers_run are built from it in registry order, so a
    pipeline run with classifiers disabled never emits a report claiming
    they ran (the reference's per-run classifiers_run is likewise the
    requested subset, `pipeline.py:102-103,139-142`)."""
    if classifiers is None:
        enabled = list(ALL_CLASSIFIERS)
    else:
        unknown = set(classifiers) - set(ALL_CLASSIFIERS)
        if unknown:
            # a typo'd name silently vanishing from the report would be the
            # exact mislabeled-classifiers_run bug this parameter prevents
            raise ValueError(
                f"unknown classifier(s) {sorted(unknown)}; valid: {list(ALL_CLASSIFIERS)}"
            )
        enabled = [c for c in ALL_CLASSIFIERS if c in set(classifiers)]
    if not enabled:
        raise ValueError("with_report_json needs at least one enabled classifier")

    def result_struct(name: str, short: str, cats):
        return F.struct(
            F.lit(name).alias("classifier"),
            F.col(f"{short}_flagged").alias("flagged"),
            F.round(F.col(f"{short}_conf"), 4).alias("confidence"),
            F.col(f"{short}_severity").alias("severity"),
            cats.alias("categories"),
            F.expr("map()").alias("metadata"),
            F.lit("").alias("explanation"),
        )

    empty = F.array().cast("array<string>")
    # fixed-category classifiers: `toxicity.py:183`, `nsfw.py:131`
    all_structs = {
        "toxicity": lambda: result_struct(
            "toxicity", "tox",
            F.when(F.col("tox_flagged"), F.array(F.lit("toxic"))).otherwise(empty),
        ),
        "pii": lambda: result_struct("pii", "pii", F.col("pii_categories")),
        "prompt_injection": lambda: result_struct(
            "prompt_injection", "inj", F.col("inj_categories")
        ),
        "spam": lambda: result_struct("spam", "spam", F.col("spam_categories")),
        "nsfw": lambda: result_struct(
            "nsfw", "nsfw",
            F.when(F.col("nsfw_flagged"), F.array(F.lit("sexual_content"))).otherwise(empty),
        ),
    }
    results = F.array(*[all_structs[c]() for c in enabled])
    metadata = F.struct(
        F.array(*[F.lit(c) for c in enabled]).alias("classifiers_run"),
        F.lit(device).alias("device"),
    )
    return scored.withColumn(
        "report",
        F.to_json(
            F.struct(
                F.col("flagged"),
                F.col("severity"),
                results.alias("results"),
                F.col("summary"),
                F.round(F.col("processing_time_ms"), 2).alias("processing_time_ms"),
                metadata.alias("metadata"),
            )
        ),
    )


def with_explanation(scored: DataFrame, classifier: str = "pipeline") -> DataFrame:
    """Human-readable explanation column, format per the reference
    ``get_explanation`` (`src/localmod/models/base.py:87-94`).  Uses the
    pipeline-level flag/severity; auxiliary output only (not part of the
    decision gate), so Java %.2f vs Python %.2% half-rounding edge cases
    are acceptable."""
    conf = F.greatest("tox_conf", "pii_conf", "inj_conf", "spam_conf", "nsfw_conf")
    return scored.withColumn(
        "explanation",
        F.when(
            ~F.col("flagged"),
            F.format_string(
                f"Content passed {classifier} check (confidence: %.2f%%)",
                (1 - conf) * 100,
            ),
        ).otherwise(
            F.format_string(
                f"Content flagged by {classifier} (confidence: %.2f%%, severity: %s)",
                conf * 100,
                F.col("severity"),
            )
        ),
    )


def write_jsonl(
    scored: DataFrame, path: str, mode: str = "overwrite", classifiers=None
) -> None:
    """JSON-lines export of the report documents."""
    with_report_json(scored, classifiers=classifiers).select(
        "conv_id", "turn_idx", "report"
    ).write.mode(mode).json(path)


def write_table(df: DataFrame, path: str, partition_col: str = None, mode: str = "overwrite") -> None:
    """Parquet (sandbox) / Iceberg (cluster) table write.  Uses the
    iceberg format when a catalog is configured on the session, else
    parquet — the call sites don't change between environments."""
    spark = df.sparkSession
    use_iceberg = any(
        k.startswith("spark.sql.catalog.") for k, _ in spark.sparkContext.getConf().getAll()
    )
    writer = df.write.mode(mode)
    if partition_col:
        writer = writer.partitionBy(partition_col)
    if use_iceberg:
        writer.format("iceberg").save(path)
    else:
        writer.parquet(path)
