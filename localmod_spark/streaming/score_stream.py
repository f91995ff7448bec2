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


def _ingest_batch_dirs(spark, out_dir: str, exclude: str = None):
    """List the ``run=*/batch=*`` admitted dirs under an ingest out_dir;
    ``exclude`` is one "run=<qid>/batch=<id>" suffix to skip."""
    from localmod_spark.plans.pipeline import _hadoop_fs

    fs, _ = _hadoop_fs(spark, out_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    root = jpath(out_dir)
    if not fs.exists(root):
        return []
    dirs = []
    for run_st in fs.listStatus(root):
        if not (run_st.isDirectory() and run_st.getPath().getName().startswith("run=")):
            continue
        for st in fs.listStatus(run_st.getPath()):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("batch=")):
                continue
            if exclude and f"{run_st.getPath().getName()}/{name}" == exclude:
                continue
            dirs.append(str(st.getPath()))
    return dirs


def ingest_bloom_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bloom_dir: str,
    key_col: str = "text",
    num_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 77,
    corpus_dirs=(),
    transform_fn=None,
    available_now: bool = True,
):
    """Bloom-gated exact-dedup ingest: admit only never-seen keys from an
    arriving stream, extending the corpus Bloom artifact as it goes —
    the streaming face of ``operators/bloom.incremental_exact_dedup``.

    Per micro-batch (foreachBatch):

      1. load the artifact (bootstrapped empty on a brand-new path;
         self-healed from the admitted dirs after a crash inside a prior
         save's marker window);
      2. key-distinct the batch and probe the bloom: definitely-new rows
         pass free; if NO row probes "maybe", the verification corpus is
         never even read (the steady-state fast path for novel crawl
         data); otherwise the maybe rows alone pay the exact anti-join
         against the PRIOR admitted batches plus ``corpus_dirs``;
      3. write admitted rows (if any) to
         ``out_dir/run=<query-id>/batch=<id>`` with overwrite — a
         retried batch rewrites the same dir, never appends twice, and
         the run namespace keeps a RESET checkpoint's replayed batch ids
         from colliding with earlier runs' dirs (a collision would both
         overwrite committed data and exclude it from verification);
      4. extend + save the bloom, recording the
         "<query-id>/<batch-id>" idempotency marker.

    Artifact↔corpus binding: the verification corpus must be exactly
    the key set the bloom covers, so the artifact records
    ``bound_out_dir`` on its first save and any later stream pointing it
    at a DIFFERENT out_dir fails fast (a bloom-maybe key verified
    against the wrong corpus would be silently re-admitted).  A
    pre-built artifact (n_keys > 0, unbound) is accepted only with
    ``corpus_dirs`` naming the corpora it was built over; those dirs are
    recorded at binding time and folded into every later verification
    (pass the same dirs on every start — the recorded and passed sets
    are unioned).

    Crash-window audit (availableNow retries re-run the LAST uncommitted
    batch only): die before (3) → nothing durable changed, the retry
    recomputes identically.  Die between (3) and (4) → the bloom lacks
    the batch keys, but the verify corpus EXCLUDES the batch's own dir,
    so the retry recomputes the same admitted set and the overwrite is
    byte-idempotent.  Die between (4) and the checkpoint commit → the
    bloom already holds the keys, every batch key probes "maybe" and the
    exact anti-join (again minus the batch's own dir) re-admits the same
    set; a matching ``last_batch`` marker skips the n_keys re-count (the
    bit OR itself is idempotent, the counter is not) — and because the
    marker carries the checkpoint-scoped query id, a RESET checkpoint
    replaying colliding batch ids re-extends instead of silently
    skipping the save.  Die INSIDE (4)'s marker window (params deleted,
    not yet rewritten) → the next batch rebuilds the filter from the
    prior admitted dirs + ``corpus_dirs`` (the exact covered key set)
    with the stream's own (num_bits, k, seed) and proceeds.

    Long-lived streams accumulate one small dir per micro-batch and the
    maybe-path re-reads them all; compact periodically (stop the stream,
    rewrite ``out_dir/run=*/batch=*`` into one dir, restart with a fresh
    checkpoint and the compacted dir in ``corpus_dirs`` — or size
    triggers so batches are large).  The per-batch stage caches are
    released at the end of each batch (the registry's documented
    between-jobs contract — don't share the session with a concurrent
    job that persists its own stages mid-batch).

    Returns the started StreamingQuery."""
    import json
    import os

    from localmod_spark.cache_registry import register_stage_cache, release_stage_caches
    from localmod_spark.operators.bloom import (
        bloom_maybe_contains,
        build_bloom,
        ensure_bloom,
        extend_bloom,
        save_bloom,
    )
    from localmod_spark.plans.pipeline import _hadoop_fs

    corpus_dirs = tuple(corpus_dirs)
    _qid = {}

    def _query_id(spark) -> str:
        # the checkpoint's metadata file carries the query id: stable
        # across restarts of the same checkpoint, fresh after a reset
        if "id" not in _qid:
            txt = spark.sparkContext.wholeTextFiles(
                os.path.join(checkpoint_dir, "metadata")
            ).collect()[0][1]
            _qid["id"] = json.loads(txt)["id"]
        return _qid["id"]

    def _prior_batch_dirs(spark, batch_id):
        """All run=*/batch=* dirs EXCEPT the current run's current batch
        (a same-checkpoint retry must not dedup against its own crashed
        write); other runs' dirs are committed corpus, always included."""
        return _ingest_batch_dirs(
            spark, out_dir, exclude=f"run={_query_id(spark)}/batch={batch_id}"
        )

    def _covered_corpus(spark, batch_id, recorded_dirs):
        """Every key the artifact covers, MINUS the current batch's own
        dir (a retry must not dedup against itself)."""
        dirs = _prior_batch_dirs(spark, batch_id) + sorted(
            set(corpus_dirs) | set(recorded_dirs)
        )
        if not dirs:
            return None
        return spark.read.parquet(*dirs).select(key_col)

    def _load_or_heal(spark, batch_id):
        try:
            return ensure_bloom(
                spark, bloom_dir, key_col=key_col, num_bits=num_bits, k=k, seed=seed
            )
        except ValueError:
            # crash inside a prior save's marker window: the artifact dir
            # exists but refuses to load.  Its covered key set is exactly
            # the admitted dirs + corpus_dirs (passed AND previously
            # recorded — the sidecar survives the marker window precisely
            # for this: compacted corpora live only in the record) —
            # rebuild from those with OUR params (a full rebuild is
            # self-consistent under any).
            from localmod_spark.operators.bloom import covered_dirs_sidecar

            sidecar = covered_dirs_sidecar(spark, bloom_dir)
            corpus = _covered_corpus(spark, batch_id, sidecar)
            if corpus is None:
                corpus = spark.createDataFrame([], f"{key_col} string")
            corpus = corpus.dropDuplicates([key_col]).persist()
            n = corpus.count()
            save_bloom(
                build_bloom(corpus, key_col, num_bits=num_bits, k=k, seed=seed),
                bloom_dir,
                num_bits=num_bits,
                k=k,
                seed=seed,
                n_keys=n,
                bound_out_dir=out_dir,
                corpus_dirs=",".join(sorted(set(corpus_dirs) | set(sidecar))) or None,
            )
            corpus.unpersist()
            from localmod_spark.operators.bloom import load_bloom

            return load_bloom(spark, bloom_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bloom, params = _load_or_heal(spark, batch_id)
        nb, kk, sd = params["num_bits"], params["k"], params["seed"]
        bound = params.get("bound_out_dir")
        if bound is not None and bound != out_dir:
            raise ValueError(
                f"bloom artifact {bloom_dir} is bound to admitted corpus "
                f"{bound!r}, not {out_dir!r} — its keys are not covered by "
                "this stream's verification corpus; use the bound out_dir "
                "or a fresh artifact"
            )
        recorded = tuple(d for d in (params.get("corpus_dirs") or "").split(",") if d)
        if (
            bound is None
            and int(params.get("n_keys") or 0) > 0
            and not corpus_dirs
        ):
            raise ValueError(
                f"bloom artifact {bloom_dir} covers {params['n_keys']} keys "
                "but is not bound to an admitted corpus and no corpus_dirs "
                "were given — its covered keys cannot be verified, so seen "
                "keys would be re-admitted; pass corpus_dirs for the corpus "
                "it was built over"
            )
        marker = f"{_query_id(spark)}/{batch_id}"
        batch_keys = batch_df.where(F.col(key_col).isNotNull()).dropDuplicates([key_col])
        flagged = register_stage_cache(
            bloom_maybe_contains(
                batch_keys, bloom, key_col, num_bits=nb, k=kk, seed=sd, out_col="_maybe"
            ).persist()
        )
        if flagged.where(F.col("_maybe")).count() == 0:
            # nothing to verify — the admitted corpus is never read
            admitted = flagged.drop("_maybe")
        else:
            corpus = _covered_corpus(spark, batch_id, recorded)
            verified = flagged.where(F.col("_maybe")).drop("_maybe")
            if corpus is not None:
                verified = verified.join(
                    corpus.distinct(), key_col, "left_anti"
                )
            admitted = flagged.where(~F.col("_maybe")).drop("_maybe").unionByName(verified)
        admitted = admitted.persist()
        try:
            n_admitted = admitted.count()  # materialize BEFORE mutating the bloom
            if n_admitted == 0:
                # nothing admitted: no dir (empty dirs would pollute the
                # corpus listing), no bloom change to record
                return
            landed = admitted
            if transform_fn is not None:
                # gate → score → land: the transform runs on admitted rows
                # only (already deduped), but the landed rows ARE the
                # future verification corpus, so the key column AND every
                # row must survive it — a filtering transform would let
                # filtered keys stay in the bloom yet vanish from the
                # corpus, re-admitting them on redelivery.  Filter
                # downstream of the landed dirs instead (keep/drop is a
                # column, not an existence question).
                # the persist is registered, so the finally's
                # release_stage_caches covers the raise paths below too
                landed = register_stage_cache(transform_fn(admitted).persist())
                if key_col not in landed.columns:
                    raise ValueError(
                        f"transform_fn dropped {key_col!r} — the landed rows "
                        "are the verification corpus and must keep the key"
                    )
                if landed.count() != n_admitted:
                    raise ValueError(
                        "transform_fn changed the row count — it must not "
                        "filter or fan out; the landed rows are the "
                        "verification corpus (emit keep/drop as a column)"
                    )
            landed.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"run={_query_id(spark)}", f"batch={batch_id}")
            )
            if params.get("last_batch") != marker:
                save_bloom(
                    extend_bloom(bloom, admitted, key_col, num_bits=nb, k=kk, seed=sd),
                    bloom_dir,
                    num_bits=nb,
                    k=kk,
                    seed=sd,
                    n_keys=int(params.get("n_keys") or 0) + n_admitted,
                    last_batch=marker,
                    bound_out_dir=out_dir,
                    corpus_dirs=",".join(sorted(set(corpus_dirs) | set(recorded))) or None,
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


def compact_ingest_corpus(
    spark,
    out_dir: str,
    dest_dir: str,
    bloom_dir: str,
    key_col: str = "text",
) -> dict:
    """Compact an ingest stream's accumulated ``run=*/batch=*`` dirs into
    ONE parquet dir and record it in the bloom artifact's covered
    ``corpus_dirs`` — the periodic maintenance that keeps a long-lived
    ingest from re-listing thousands of tiny per-batch dirs on every
    maybe-path verification.  Run ONLY with the stream stopped.

    Crash-safe order:

      1. rewrite every admitted row into ``dest_dir`` (overwrite);
      2. save the artifact with ``dest_dir`` folded into corpus_dirs and
         n_keys RECOUNTED exactly (count_distinct over the full recorded
         corpus — this also repairs any upper-bound drift the per-batch
         bookkeeping accumulated);
      3. delete the run dirs.

    Die after (1): dest exists but unrecorded, run dirs intact — the
    verification corpus is still complete and a re-run (with a FRESH
    dest_dir; reusing a recorded one is refused) re-copies the rows.
    Die after (2): the keys exist in BOTH the recorded dest and the run
    dirs — duplicates are harmless to an anti-join; a re-run deletes the
    leftovers.  An uncommitted tail batch whose dir gets compacted
    re-admits nothing on retry: its keys verify against dest, and its
    bits are folded into the filter here (step 2 extends before saving —
    the (3)-(4) ingest crash window leaves keys OUT of the bits, and
    compaction must not let them bypass verification as definitely-new).

    Returns {"compacted_dirs", "rows", "n_keys"}."""
    from localmod_spark.operators.bloom import extend_bloom, load_bloom, save_bloom
    from localmod_spark.plans.pipeline import _hadoop_fs

    bloom, params = load_bloom(spark, bloom_dir)
    bound = params.get("bound_out_dir")
    if bound is not None and bound != out_dir:
        raise ValueError(
            f"bloom artifact {bloom_dir} is bound to {bound!r}, not {out_dir!r}"
        )
    recorded_now = set(d for d in (params.get("corpus_dirs") or "").split(",") if d)
    fs, _ = _hadoop_fs(spark, out_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    # dest may live on a different filesystem than out_dir — resolve its
    # own FS for the existence probe
    dest_fs, _ = _hadoop_fs(spark, dest_dir)
    if dest_dir in recorded_now or dest_fs.exists(jpath(dest_dir)):
        # overwriting a recorded corpus dir would DESTROY previously
        # admitted rows while the bloom bits still cover their keys
        raise ValueError(
            f"compaction dest {dest_dir!r} already exists or is a recorded "
            "corpus dir — pass a fresh dest per compaction"
        )
    run_dirs = _ingest_batch_dirs(spark, out_dir)
    if not run_dirs:
        return {"compacted_dirs": 0, "rows": 0, "n_keys": params["n_keys"]}
    rows = spark.read.parquet(*run_dirs)
    rows.write.mode("overwrite").parquet(dest_dir)
    n_rows = spark.read.parquet(dest_dir).count()
    new_dirs = sorted(recorded_now | {dest_dir})
    n_keys = (
        spark.read.parquet(*new_dirs)
        .select(key_col)
        .where(F.col(key_col).isNotNull())
        .select(F.count_distinct(key_col).alias("n"))
        .first()["n"]
    )
    save_bloom(
        # fold the compacted keys' bits in: an uncommitted tail batch's
        # keys may be missing from the filter (ingest died between its
        # data write and its save) and must not probe definitely-new
        extend_bloom(
            bloom,
            spark.read.parquet(dest_dir),
            key_col,
            num_bits=params["num_bits"],
            k=params["k"],
            seed=params["seed"],
        ),
        bloom_dir,
        num_bits=params["num_bits"],
        k=params["k"],
        seed=params["seed"],
        n_keys=n_keys,
        last_batch=params.get("last_batch"),
        bound_out_dir=bound or out_dir,
        corpus_dirs=",".join(new_dirs),
    )
    for st in fs.listStatus(jpath(out_dir)):
        if st.isDirectory() and st.getPath().getName().startswith("run="):
            fs.delete(st.getPath(), True)
    return {"compacted_dirs": len(run_dirs), "rows": n_rows, "n_keys": n_keys}
