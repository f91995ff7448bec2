"""Auxiliary benchmarks for optimization work (guide §1.4 noop isolation).

NOT the driver's bench — ``bench.py`` stays the frozen measurement
surface.  This harness isolates individual declared queries (or named
operator stages) with the noop sink so the computation is timed without
the collect/sink cost, labels jobs for the UI, and prints per-query
best-of-N seconds.  Used to produce the before/after numbers cited in
OPTIMIZATION_r07.md.

Usage:
    python bench_extra.py [query ...]          # default: the heavy set
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python bench_extra.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

HEAVY = [
    "repeated_spans", "span_scrub", "dup_clusters", "corpus_select_best",
    "ann_recall", "knn_join", "ann_join_topk", "ivf_join_topk",
    "single_vec_topk", "minhash_dedup", "incremental_dedup",
    "token_budget_scalable", "greedy_pack", "media_features", "bpe_tokens",
]


def main() -> None:
    import __spark_entry__ as em
    from localmod_spark.cache_registry import release_stage_caches
    from localmod_spark.session import get_spark

    names = sys.argv[1:] or HEAVY
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    em._ship_package(spark)
    q = em.queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        best = float("inf")
        for rep in range(REPS):
            # every rep recomputes from the parquet inputs: clear the SQL
            # cache and drain operator stage persists so run 2 never times
            # a cache scan (same discipline as bench.py's cold list)
            spark.catalog.clearCache()
            release_stage_caches()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            noop(q[name](spark, SF_DIR))
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{name:28s} {best:.3f}s (best of {REPS}, noop sink)")
    spark.stop()


if __name__ == "__main__":
    main()
