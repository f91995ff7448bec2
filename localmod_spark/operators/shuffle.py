"""Deterministic corpus shuffle + shard writer.

Training-data pipelines need a REPRODUCIBLE global shuffle: the order a
LM consumes documents in affects training, so the shuffle must be (a)
actually uniform, (b) identical on rerun and resume, and (c) independent
of how the input happened to be partitioned — none of which
``df.orderBy(rand())`` gives (rand() is partition-layout-dependent and
changes on every rerun).  Same discipline as ``operators/sampling``:
every decision keys on a content-stable hash of the row id.

Two independent digests of one md5 (engine-portable — DuckDB's md5
matches Spark's ``F.md5``, so the full permutation is SQL-oracleable):

  * ``shard``  = 32-bit digest (hex chars 17-24) mod ``n_shards`` —
    which output shard a row lands in; uniform, so shards are
    skew-free samples of the corpus and any multi-source input arrives
    INTERLEAVED in every shard (any prefix of a shard is an unbiased
    sample of the sources).
  * ``skey``   = 60-bit digest (hex chars 1-15) — the within-shard sort
    key.  60 bits keeps collision runs negligible at 10^12 rows
    (~expected 4·10^5 two-row ties, broken deterministically by id);
    a 32-bit key would create ~230-row id-ordered runs per hash value
    at that scale — a real shuffle-quality defect.

Scale shape: assigning shard+skey is a narrow projection; the writer is
ONE hash exchange on ``shard`` plus a per-task sort — no global range
sort, no sampled partitioner (``repartitionByRange`` samples range
boundaries, which is exactly the partitioning-dependent nondeterminism
this module exists to avoid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SHARD_COL = "shard"
SKEY_COL = "skey"


def _digest(id_col: str, seed: int) -> Column:
    return F.md5(F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(int(seed)))))


def shuffle_key_col(id_col: str = "doc_id", seed: int = 0) -> Column:
    """60-bit deterministic sort key (first 15 hex chars of the digest)."""
    return F.conv(F.substring(_digest(id_col, seed), 1, 15), 16, 10).cast("long")


def shard_col(id_col: str = "doc_id", n_shards: int = 16, seed: int = 0) -> Column:
    """Shard assignment from an INDEPENDENT 32-bit digest slice (hex chars
    17-24), so shard membership and within-shard order share no bits."""
    h = F.conv(F.substring(_digest(id_col, seed), 17, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(int(n_shards))).cast("int")


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    with_pos: bool = True,
) -> DataFrame:
    """Append ``shard`` and (optionally) ``pos`` — the row's 1-based
    position in its shard's deterministic order (skey asc, id asc).

    The (shard, pos) pair IS the shuffle contract: it depends only on
    (id, seed, n_shards) — never on input partitioning, never on rerun —
    so a resumed job, a differently-split input, or a different cluster
    size all produce the identical permutation (partitioning-invariance
    tested; the DuckDB oracle recomputes the whole mapping).  ``pos`` is
    one window exchange on ``shard``; skip it (``with_pos=False``) when
    only the physical layout matters — :func:`write_shuffle_shards` gets
    the order from the sort, not the row number."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    out = df.withColumn(SHARD_COL, shard_col(id_col, n_shards, seed)).withColumn(
        SKEY_COL, shuffle_key_col(id_col, seed)
    )
    if with_pos:
        w = Window.partitionBy(SHARD_COL).orderBy(F.col(SKEY_COL).asc(), F.col(id_col).asc())
        out = out.withColumn("pos", F.row_number().over(w))
    return out


def write_shuffle_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> None:
    """Materialize the shuffled corpus, hive-partitioned by ``shard`` with
    rows in shuffle order inside each shard's files.

    ONE exchange: hash-repartition on the shard id (several shards may
    share a task — the sort leads with ``shard`` so ``partitionBy`` still
    splits them into their own directories), then an executor-local sort.
    Rerun produces byte-identical shard contents (tested), which is what
    makes the written corpus a resumable pipeline stage rather than a
    one-shot artifact."""
    staged = shuffle_shards(df, n_shards, seed, id_col=id_col, with_pos=False)
    (
        staged.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(F.col(SHARD_COL), F.col(SKEY_COL), F.col(id_col))
        .drop(SKEY_COL)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(out_dir)
    )
