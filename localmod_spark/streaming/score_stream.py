"""Streaming moderation: the same fused scoring stage over readStream.

The reference is batch-only (its only 'stream' is HTTP arrival,
`src/localmod/api/app.py`), but the scoring stage is stateless per turn,
so it lifts to Structured Streaming unchanged: readStream → score_turns →
writeStream.  Watermarked conversation aggregates are provided for
late-data-tolerant per-conversation flag counts.

Micro-batch semantics: each trigger's batch flows through the identical
mapInPandas plan used in batch mode — one code path, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from localmod_spark.kernel.aggregate import DEFAULT_CONFIG, PipelineConfig
from localmod_spark.operators.score import score_turns


def score_stream(stream_df: DataFrame, cfg: PipelineConfig = None) -> DataFrame:
    """Apply the fused scoring stage to a streaming DataFrame of turns.
    Stateless — supported by every output mode."""
    return score_turns(stream_df, cfg=cfg or DEFAULT_CONFIG)


def dedup_stream(
    stream_df: DataFrame,
    key_cols=("conv_id", "turn_idx"),
    watermark_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Ingest-side exactly-once-ish dedup: drop redelivered turns whose
    keys were already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``) — the standard guard in front of
    a scoring stream fed by an at-least-once bus.  State is bounded by
    the watermark delay instead of growing forever (what a bare
    ``dropDuplicates`` on a stream would do)."""
    return stream_df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def conv_running_totals_stream(scored_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-conversation totals maintained
    across micro-batches via ``applyInPandasWithState`` — the pattern for
    moderation state Spark's built-in aggregations can't express (e.g.
    escalation logic over a conversation's lifetime).

    State per conv_id: (n_turns, n_flagged); each trigger emits the
    updated totals for conversations seen in that batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "conv_id string, n_turns long, n_flagged long"
    state_schema = "n_turns long, n_flagged long"

    def _update(key, pdfs, state: GroupState):
        n, f = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            f += int(pdf["flagged"].sum())
        state.update((n, f))
        yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n], "n_flagged": [f]})

    return (
        scored_stream.select("conv_id", "flagged")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def conv_flag_counts_stream(
    scored_stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Watermarked per-(conversation, time-window) flag counts — the
    streaming analog of conv_features.  Late turns beyond the watermark
    are dropped deterministically; state is bounded by the watermark."""
    return (
        scored_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("flagged").cast("long")).alias("n_flagged"),
            F.sum(F.col("pii_flagged").cast("long")).alias("n_pii_turns"),
        )
    )


def write_scored_stream(
    scored: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by_day: bool = False,
    available_now: bool = True,
):
    """Checkpointed parquet file sink for the scored stream — emitting
    the SAME consumer-shaped layout as the batch pipeline
    (``day = to_date(ts)`` hive partitions when ``partition_by_day``), so
    a downstream date-ranged reader prunes identically regardless of
    which engine produced a partition.  The file sink's checkpoint +
    transaction log give exactly-once file commits across restarts (the
    streaming analog of the batch ledger).  ``available_now=True``
    processes the current backlog and stops — the catch-up/batch-drain
    mode; ``False`` runs continuously.  Returns the started query."""
    df = scored
    if partition_by_day:
        df = df.withColumn("day", F.to_date(F.col("ts")))
    w = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by_day:
        w = w.partitionBy("day")
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def ingest_bloom_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bloom_dir: str,
    key_col: str = "text",
    num_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 77,
    available_now: bool = True,
):
    """Bloom-gated exact-dedup ingest: admit only never-seen keys from an
    arriving stream, extending the corpus Bloom artifact as it goes —
    the streaming face of ``operators/bloom.incremental_exact_dedup``.

    Per micro-batch (foreachBatch):

      1. load the artifact (bootstrapped empty on a brand-new path);
      2. key-distinct the batch, gate it: bloom-definitely-new rows pass
         free, bloom-maybe rows pay the exact anti-join against the
         PRIOR admitted batches only (10^12-scale point: the corpus
         rescan is reserved for the sketch's false positives);
      3. write admitted rows to ``out_dir/batch=<id>`` with overwrite —
         a retried batch rewrites the same dir, never appends twice;
      4. extend + save the bloom, recording ``last_batch_id``.

    Crash-window audit (availableNow retries re-run the LAST uncommitted
    batch only): die before (3) → nothing durable changed, the retry
    recomputes identically.  Die between (3) and (4) → the bloom lacks
    the batch keys, but the verify corpus EXCLUDES the batch's own dir,
    so the retry recomputes the same admitted set and the overwrite is
    byte-idempotent.  Die between (4) and the checkpoint commit → the
    bloom already holds the keys, every batch key probes "maybe" and the
    exact anti-join (again minus the batch's own dir) re-admits the same
    set; ``last_batch_id == batch id`` skips the n_keys re-count (the
    bit OR itself is idempotent, the counter is not).  Exactly-once for
    both the data dirs and the bookkeeping.

    The per-batch stage caches registered by the gate are released at
    the end of each batch (the registry's documented between-jobs
    contract — a multi-tenant driver should not share the session with
    a concurrent job that persists its own stages mid-batch).

    Returns the started StreamingQuery."""
    import os

    from localmod_spark.cache_registry import release_stage_caches
    from localmod_spark.operators.bloom import (
        ensure_bloom,
        extend_bloom,
        incremental_exact_dedup,
        save_bloom,
    )
    from localmod_spark.plans.pipeline import _hadoop_fs

    def _prior_batch_dirs(spark, batch_id):
        fs, _ = _hadoop_fs(spark, out_dir)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        root = jpath(out_dir)
        if not fs.exists(root):
            return []
        out = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("batch=") and name != f"batch={batch_id}":
                out.append(str(st.getPath()))
        return out

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bloom, params = ensure_bloom(
            spark, bloom_dir, key_col=key_col, num_bits=num_bits, k=k, seed=seed
        )
        nb, kk, sd = params["num_bits"], params["k"], params["seed"]
        batch_keys = batch_df.where(F.col(key_col).isNotNull()).dropDuplicates([key_col])
        prior = _prior_batch_dirs(spark, batch_id)
        if prior:
            corpus = spark.read.parquet(*prior).select(key_col)
        else:
            corpus = spark.createDataFrame([], batch_df.select(key_col).schema)
        admitted = incremental_exact_dedup(
            batch_keys, corpus, bloom, key_col, num_bits=nb, k=kk, seed=sd
        ).persist()
        try:
            n_admitted = admitted.count()  # materialize BEFORE mutating the bloom
            admitted.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
            if params.get("last_batch_id") != batch_id:
                save_bloom(
                    extend_bloom(bloom, admitted, key_col, num_bits=nb, k=kk, seed=sd),
                    bloom_dir,
                    num_bits=nb,
                    k=kk,
                    seed=sd,
                    n_keys=int(params.get("n_keys") or 0) + n_admitted,
                    last_batch_id=batch_id,
                )
        finally:
            admitted.unpersist()
            release_stage_caches()

    w = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
