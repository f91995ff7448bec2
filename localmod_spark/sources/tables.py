"""Readers for the driver-provided parquet tables (TESTDATA.md).

At production scale these would be Iceberg tables
(``spark.read.format("iceberg").load(...)``) with partition pruning on the
table's partition spec; parquet paths are the sandbox stand-in.  Catalyst
pushes filters and prunes columns into these scans either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
