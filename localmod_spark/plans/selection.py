"""The production corpus-selection job: staged, checkpoint-resumable.

The interactive composition (``__spark_entry__._q_corpus_select``) builds
the whole validity → sketch → band → verify → cluster → select plan in
one session.  At 10^12 documents that is the wrong shape: sketching
dominates the cost, and a failure anywhere loses everything.  This plan
materializes each stage to parquet and commits a lineage row per stage
(same Hadoop-FS atomic tmp-rename ledger as ``plans/pipeline.py``), so

  * a re-run SKIPS completed stages — a crash after the signature stage
    never re-sketches the corpus;
  * each stage's input is a staged table, so its lineage is one scan
    (no UDF recompute across join branches by construction — stronger
    than the in-session ``persist``, which is storage-evictable);
  * downstream experiments (different thresholds, different token
    bands) restart from ``pairs/`` or ``clusters/`` instead of from raw
    text.

Stages (each a parquet dir under out_dir):
  valid/       validity-gated docs           (doc_id, lang, text)
  bands/       exploded MinHash band table   (doc_id, band_ix, band_hash)
  pairs/       Jaccard-verified dup pairs    (id_a, id_b, jaccard)
  clusters/    connected components          (doc_id, cluster)
  selected/    cluster representatives in the token band
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localmod_spark.plans.pipeline import _append_ledger_row, _hadoop_fs

STAGES = ("valid", "bands", "pairs", "clusters", "selected")


@dataclass
class SelectionResult:
    out_dir: str
    stages_run: List[str]
    stages_skipped: List[str]
    selected: DataFrame


def _stage_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_stages(spark: SparkSession, out_dir: str) -> set:
    path = _ledger_path(out_dir)
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return set()
    try:
        rows = (
            spark.read.parquet(path)
            .where(F.col("status") == "done")
            .select("stage")
            .distinct()
            .collect()
        )
        done = {r["stage"] for r in rows}
    except Exception as e:  # noqa: BLE001
        import warnings

        warnings.warn(f"selection ledger unreadable ({e!r}); recomputing all stages", stacklevel=2)
        return set()
    # a ledger row without its data dir (manual cleanup, partial copy) must
    # not be trusted — the stage reruns
    return {s for s in done if fs.exists(_hadoop_fs(spark, _stage_path(out_dir, s))[1])}


def run_selection(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    threshold: float = 0.9,
    num_hashes: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: Optional[int] = None,
    max_len: int = 400,
    token_band: Tuple[int, int] = (5, 1000),
    resume: bool = True,
) -> SelectionResult:
    """Run (or resume) the staged selection job; returns the selected
    DataFrame read back from its staged parquet.

    Stage semantics match the oracled ``corpus_select`` query exactly
    (equivalence-tested), so the staged job inherits its correctness
    gate.  ``max_bucket`` opts into the giant-bucket cap for the banding
    join (recall trade — see ``operators/dedup.minhash_candidates``)."""
    from localmod_spark.operators.dedup import (
        candidates_from_bands,
        dup_clusters,
        explode_minhash_bands,
        ngram_jaccard,
        with_minhash,
    )
    from localmod_spark.operators.validate import with_validity

    done = completed_stages(spark, out_dir) if resume else set()
    run: List[str] = []

    def _commit(stage: str, df: DataFrame) -> DataFrame:
        path = _stage_path(out_dir, stage)
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        staged = spark.read.parquet(path)
        _append_ledger_row(
            spark,
            _ledger_path(out_dir),
            {
                "wave": STAGES.index(stage),
                "stage": stage,
                "status": "done",
                "rows": staged.count(),
                "wall_ms": round((time.time() - t0) * 1000, 2),
            },
        )
        run.append(stage)
        return staged

    def _read(stage: str) -> DataFrame:
        return spark.read.parquet(_stage_path(out_dir, stage))

    if "valid" in done:
        valid = _read("valid")
    else:
        valid = _commit(
            "valid",
            with_validity(docs, max_len=max_len)
            .where(F.col("valid"))
            .select("doc_id", "lang", "text"),
        )

    if "bands" in done:
        band_tbl = _read("bands")
    else:
        sigs = with_minhash(
            valid, num_hashes=num_hashes, shingle_k=shingle_k, shingle_mode="word"
        )
        band_tbl = _commit(
            "bands", explode_minhash_bands(sigs, bands=bands, rows_per_band=rows_per_band)
        )

    if "pairs" in done:
        pairs = _read("pairs")
    else:
        cands = candidates_from_bands(band_tbl, max_bucket=max_bucket)
        pairs = _commit(
            "pairs",
            ngram_jaccard(valid, cands, n=shingle_k)
            .where(F.round("jaccard", 4) >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")),
        )

    if "clusters" in done:
        clusters = _read("clusters")
    else:
        clusters = _commit("clusters", dup_clusters(valid, pairs.select("id_a", "id_b")))

    if "selected" in done:
        selected = _read("selected")
    else:
        reps = clusters.where(F.col("doc_id") == F.col("cluster")).select("doc_id")
        n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
        lo, hi = token_band
        selected = _commit(
            "selected",
            valid.join(reps, "doc_id", "left_semi")
            .where((n_tokens >= lo) & (n_tokens <= hi))
            .select("doc_id", "lang", n_tokens.cast("long").alias("n_tokens")),
        )

    return SelectionResult(
        out_dir=out_dir,
        stages_run=run,
        stages_skipped=[s for s in STAGES if s in done],
        selected=selected,
    )
