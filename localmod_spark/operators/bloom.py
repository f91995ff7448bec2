"""Bloom-filter membership sketch — the corpus side of EXACT
incremental dedup without an increment-time corpus scan.

At 10^12 turns the corpus's normalized-text hash set is too large to
broadcast and too expensive to rescan per ingest batch.  A Bloom filter
over the corpus keys is a few-hundred-MB artifact that answers
"definitely new" with zero false negatives; only the (tiny) "maybe
seen" remainder pays the exact verification join.  Most fresh crawl
data is novel, so the expensive join probe side shrinks by orders of
magnitude (cf. the broadcast-bloom runtime filters in Spark's own
InjectRuntimeFilter — same trick, made explicit and persistable).

Everything is JVM columnar — no UDF, no driver-side bitmap:

  * BUILD: each key sets k bit positions (xxhash64 with k seeds, mod
    m).  Bit positions fold to (word_ix, 1L << bit-in-word) rows and ONE
    ``bit_or`` groupBy collapses them to ≤ m/64 words.  The partial
    aggregation OR-merges map-side, so the shuffle carries at most
    #words rows per task regardless of corpus size — the classic
    mergeable-sketch shape (same discipline as operators/checks.py
    states).  The result is a DataFrame artifact (parquet-stageable,
    incrementally extendable by unioning new keys' words and re-OR-ing).
  * PROBE: each batch key joins its k word_ixs against the (broadcast)
    word table; it is "maybe in corpus" iff ALL k probed bits are set.
    A missing word row means the bit is 0 → definitely new.

False-positive rate ≈ (1 - e^{-k·n/m})^k; the default m = 2^23 bits
(1 MiB) holds ~1M keys at k=5 under 2% fpr — size ``num_bits`` to the
corpus (10^12 keys at 1% → ~1.2 TiB total, which is why production use
shards the filter by key range; ``num_bits`` stays a power of two so
the mod is a mask).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_WORD_BITS = 64
_DATA_SUBDIR = "words"
_PARAMS_SUBDIR = "_bloom_params"
_COVERED_SUBDIR = "_covered_dirs"


def _bit_positions(col, num_bits: int, k: int, seed: int):
    """The k bit positions for one key column (list of int columns)."""
    if k < 1:
        # k=0 would make EVERY probe vacuously "definitely new" and admit
        # known duplicates — fail loudly instead
        raise ValueError(f"k must be >= 1, got {k}")
    # pmod over a power of two == mask; spelled pmod for clarity and
    # for engines without bit ops on negative hashes
    return [
        F.pmod(F.xxhash64(col, F.lit(seed + j)), F.lit(num_bits)) for j in range(k)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 77,
) -> DataFrame:
    """Build the Bloom word table for ``df[key_col]``: one row per
    64-bit word that has at least one bit set — (word_ix: long,
    word: long).  Null keys are skipped (they cannot match anything)."""
    if num_bits % _WORD_BITS:
        raise ValueError(f"num_bits must be a multiple of {_WORD_BITS}")
    pos = F.explode(
        F.array(*_bit_positions(F.col(key_col), num_bits, k, seed))
    ).alias("_pos")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("_pos") / _WORD_BITS).cast("long").alias("word_ix"),
            F.expr(f"shiftleft(1L, cast(_pos % {_WORD_BITS} as int))").alias("_w"),
        )
        .groupBy("word_ix")
        .agg(F.bit_or("_w").alias("word"))
    )


def bloom_maybe_contains(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 77,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Annotate ``batch`` with ``out_col``: False ⇒ the key is
    DEFINITELY not in the corpus the filter was built over; True ⇒
    maybe (verify exactly).  Parameters must match :func:`build_bloom`.

    Plan: k probe rows per key → broadcast join to the word table →
    per-key AND-reduce (min over bit tests).  Null keys probe as
    ``maybe_seen = False``."""
    probes = batch.select(
        F.col(key_col).alias("_key"),
        F.explode(F.array(*_bit_positions(F.col(key_col), num_bits, k, seed))).alias(
            "_pos"
        ),
    ).select(
        "_key",
        (F.col("_pos") / _WORD_BITS).cast("long").alias("word_ix"),
        F.expr(f"shiftleft(1L, cast(_pos % {_WORD_BITS} as int))").alias("_mask"),
    )
    hit = (
        probes.join(broadcast(bloom), "word_ix", "left")
        .select(
            "_key",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0)
            .cast("long")
            .alias("_bit"),
        )
        .groupBy("_key")
        .agg((F.min("_bit") == 1).alias(out_col))
    )
    return batch.join(
        hit.withColumnRenamed("_key", key_col), key_col, "left"
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))


def incremental_exact_dedup(
    batch: DataFrame,
    corpus_keys: DataFrame,
    bloom: Optional[DataFrame] = None,
    key_col: str = "text",
    num_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 77,
) -> DataFrame:
    """Rows of ``batch`` whose ``key_col`` does NOT appear in
    ``corpus_keys`` — the exact-dedup admission gate for an ingest
    increment.  With ``bloom`` (built over the same corpus keys and
    parameters) the verification anti-join probes ONLY the bloom-maybe
    rows; bloom-definitely-new rows bypass it.  The result is
    EXACTLY the plain anti-join (false positives are verified away,
    false negatives are impossible) — the filter changes the plan, not
    the answer.
    """
    if bloom is None:
        return batch.join(corpus_keys.select(key_col).distinct(), key_col, "left_anti")
    from localmod_spark.cache_registry import register_stage_cache

    # both union branches reference this subtree; persist it so the
    # batch scan + probe join run once, not once per branch
    flagged = register_stage_cache(
        bloom_maybe_contains(
            batch, bloom, key_col, num_bits=num_bits, k=k, seed=seed, out_col="_maybe"
        ).persist()
    )
    definitely_new = flagged.where(~F.col("_maybe")).drop("_maybe")
    verified_new = (
        flagged.where(F.col("_maybe"))
        .drop("_maybe")
        .join(corpus_keys.select(key_col).distinct(), key_col, "left_anti")
    )
    return definitely_new.unionByName(verified_new)


def extend_bloom(
    bloom: DataFrame,
    new_keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 77,
) -> DataFrame:
    """Fold a new key batch into an existing word table (daily-ingest
    shape: the corpus filter is EXTENDED, never rebuilt).  Union the new
    batch's words and re-``bit_or`` — bitwise OR is associative, so the
    result EQUALS a fresh build over the union of both key sets
    (equality-tested).  Parameters must match the original build;
    persist the result with :func:`save_bloom` to keep them attached."""
    add = build_bloom(new_keys, key_col, num_bits=num_bits, k=k, seed=seed)
    return (
        bloom.unionByName(add).groupBy("word_ix").agg(F.bit_or("word").alias("word"))
    )


def bloom_stats(bloom: DataFrame, num_bits: int, k: int = 5) -> DataFrame:
    """One-row health check of a word table: words present, bits set,
    fill ratio, and the resulting false-positive estimate fill^k — the
    saturation signal that says "shard or grow ``num_bits``" long before
    the verification join degrades to a full corpus probe."""
    # coalesce: an EMPTY filter (day-0 corpus) must report 0.0, not NULL
    # — a `stats.est_fpr > threshold` alert on None never fires
    return bloom.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.coalesce(F.sum(F.bit_count("word")), F.lit(0)).alias("bits_set"),
    ).select(
        "n_words",
        "bits_set",
        F.round(F.col("bits_set") / F.lit(float(num_bits)), 6).alias("fill_ratio"),
        F.round(
            F.pow(F.col("bits_set") / F.lit(float(num_bits)), F.lit(k)), 6
        ).alias("est_fpr"),
    )


def save_bloom(
    bloom: DataFrame,
    path: str,
    num_bits: int,
    k: int,
    seed: int,
    n_keys: int = 0,
    last_batch: Optional[str] = None,
    bound_out_dir: Optional[str] = None,
    corpus_dirs: Optional[str] = None,
) -> None:
    """Persist the word table plus its build parameters as one artifact.

    Probing with mismatched (num_bits, k, seed) silently voids the
    zero-false-negative guarantee, so the parameters travel WITH the
    words and :func:`load_bloom` hands them back.  Crash discipline via
    the shared `plans/pipeline.save_marked_artifact` (tmp-write → marker
    delete → swap → marker last): safe for the load→extend→save-IN-PLACE
    lifecycle — the extended plan reads the artifact's own data dir, and
    a naive overwrite would both trip Spark's self-overwrite guard and
    torch the old filter on failure.  ``n_keys`` is the cumulative key
    count (caller maintained across :func:`extend_bloom` folds) for fpr
    bookkeeping.

    The three optional markers belong to the streaming-ingest lifecycle
    (``streaming.ingest_bloom_stream``) and must be PRESERVED by any
    other writer that extends a stream-managed artifact (the batch CLI
    does): ``last_batch`` is the "<query-id>/<batch-id>" idempotency
    marker — a foreachBatch retry whose marker already matches must NOT
    re-extend the n_keys bookkeeping (re-OR-ing the same bits is
    idempotent; the counter is not), and the query id makes markers
    from different checkpoints distinct (a bare batch id is only unique
    per checkpoint while the artifact outlives checkpoints).
    ``bound_out_dir`` pins the artifact to the one admitted-corpus
    directory its keys cover; ``corpus_dirs`` (comma-joined) records
    extra pre-existing corpora folded in at binding time.  The params
    dir is rewritten wholesale on every save, so added columns never
    mix schemas within one artifact.
    """
    from localmod_spark.plans.pipeline import save_marked_artifact

    spark = bloom.sparkSession
    params = spark.createDataFrame(
        [
            (
                int(num_bits),
                int(k),
                int(seed),
                int(n_keys),
                last_batch,
                bound_out_dir,
                corpus_dirs,
            )
        ],
        "num_bits long, k int, seed int, n_keys long, "
        "last_batch string, bound_out_dir string, corpus_dirs string",
    )
    # redundant sidecar OUTSIDE the marked-artifact dance: the params
    # marker is deleted-then-rewritten during the save, and a crash in
    # that window must not lose the covered-dirs record — the ingest
    # self-heal rebuilds coverage from it.  Maintained FIRST on every
    # save (a stale words/params pair next to a newer sidecar only ever
    # ADDS genuinely-covered dirs, safe for healing) and DELETED when
    # coverage is deliberately reset (corpus_dirs=None) so a from-scratch
    # rebuild can't resurrect discarded corpora.
    if corpus_dirs:
        spark.createDataFrame([(corpus_dirs,)], "dirs string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, _COVERED_SUBDIR))
    else:
        from localmod_spark.plans.pipeline import _hadoop_fs

        fs, _ = _hadoop_fs(spark, path)
        fs.delete(
            spark._jvm.org.apache.hadoop.fs.Path(os.path.join(path, _COVERED_SUBDIR)),
            True,
        )
    save_marked_artifact(
        spark,
        path,
        bloom,
        params,
        data_subdir=_DATA_SUBDIR,
        marker_subdir=_PARAMS_SUBDIR,
    )


def load_bloom(spark: SparkSession, path: str) -> Tuple[DataFrame, dict]:
    """Load a :func:`save_bloom` artifact → (word table, params dict).
    Raises on a missing/orphaned params marker (a half-written artifact
    must never be probed)."""
    try:
        rows = spark.read.parquet(os.path.join(path, _PARAMS_SUBDIR)).collect()
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            f"no readable bloom params at {path} — artifact absent or "
            "half-written (save_bloom writes params last); rebuild it"
        ) from e
    if len(rows) != 1:
        raise ValueError(f"bloom params at {path} must be one row, got {len(rows)}")
    params = rows[0].asDict()
    return spark.read.parquet(os.path.join(path, _DATA_SUBDIR)), params


def ensure_bloom(
    spark: SparkSession,
    path: str,
    key_col: str = "text",
    num_bits: int = 1 << 23,
    k: int = 5,
    seed: int = 77,
) -> Tuple[DataFrame, dict]:
    """Load the artifact at ``path``, creating an EMPTY one first if the
    path does not exist at all — the bootstrap for a fresh ingest stream.

    An empty filter is only correct when the corpus is genuinely empty
    (it answers "definitely new" for everything, and definitely-new rows
    BYPASS the exact verification), so this deliberately does NOT repair
    a half-written artifact: a dir that exists but fails to load keeps
    raising — rebuild it explicitly from the corpus keys instead."""
    from localmod_spark.plans.pipeline import _hadoop_fs

    fs, _ = _hadoop_fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    if not fs.exists(jpath(path)):
        empty = spark.createDataFrame([], f"{key_col} string")
        bloom = build_bloom(empty, key_col, num_bits=num_bits, k=k, seed=seed)
        save_bloom(bloom, path, num_bits=num_bits, k=k, seed=seed, n_keys=0)
    return load_bloom(spark, path)


def covered_dirs_sidecar(spark: SparkSession, path: str) -> Tuple[str, ...]:
    """The corpus_dirs recorded by the last save that had any — readable
    even when the params marker is mid-rewrite (heal path).  Empty tuple
    ONLY when the sidecar genuinely does not exist; any other read
    failure propagates (a torn/unreadable record silently mapped to ()
    would heal the filter WITHOUT its compacted corpora and re-admit
    their keys)."""
    from localmod_spark.plans.pipeline import _hadoop_fs

    side = os.path.join(path, _COVERED_SUBDIR)
    fs, _ = _hadoop_fs(spark, path)
    if not fs.exists(spark._jvm.org.apache.hadoop.fs.Path(side)):
        return ()
    rows = spark.read.parquet(side).collect()
    if not rows or not rows[0]["dirs"]:
        return ()
    return tuple(d for d in rows[0]["dirs"].split(",") if d)
