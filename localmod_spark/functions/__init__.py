"""Column-level functions: vectorized UDF wrappers around the kernel."""

from localmod_spark.functions.text import langid_udf, pii_scrub_udf, quality_udf

__all__ = ["pii_scrub_udf", "langid_udf", "quality_udf"]
