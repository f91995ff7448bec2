"""Bucketed-table layout: co-located joins without a shuffle.

At 10^12 turns the expensive joins are turn-table ⋈ turn-derived tables
on conv_id (e.g. scored turns ⋈ golden labels for the F1 gate, or
turns ⋈ conversation features).  Writing both sides bucketed by conv_id
(`bucketBy` — the parquet analog of Iceberg's bucket(conv_id) partition
transform) lets Spark's sort-merge join read matching buckets pairwise
with NO exchange on either side: the join cost collapses from
2× full-table shuffle to a partitioned local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 16,
    sort_col: str | None = "turn_idx",
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+ optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(bucket_col, sort_col)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key/count — Catalyst detects
    the matching output partitioning and elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
