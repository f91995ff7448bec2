"""Recall-preserving giant-bucket sharding (cap_mode="shard").

The contract under test: for every banding/ANN join that previously
handled a pathological bucket by DROPPING it (a recall loss), shard mode
must return exactly the uncapped pair/neighbor set — zero dropped pairs —
while no join task's bucket cell exceeds the configured bound.
"""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from localmod_spark.operators.dedup import (
    candidates_from_bands,
    cross_dedup_pairs,
    simhash_candidates,
)
from localmod_spark.operators.similarity import ann_join_topk


def _band_table(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, band_ix int, band_hash long")


@pytest.fixture()
def planted_bands(spark):
    """Band 0: one wide bucket (300 ids) + one normal bucket (ids 1000-1003).
    Band 1: ids 0-9 co-bucket again (pairs among them share 2 bands)."""
    rows = [(i, 0, 777) for i in range(300)]
    rows += [(i, 0, 888) for i in range(1000, 1004)]
    rows += [(i, 1, 999) for i in range(10)]
    return _band_table(spark, rows)


def _pair_set(df):
    return {(r.id_a, r.id_b, r.n_bands_shared) for r in df.collect()}


def test_shard_mode_returns_exactly_the_uncapped_pair_set(spark, planted_bands):
    uncapped = _pair_set(candidates_from_bands(planted_bands))
    sharded = _pair_set(
        candidates_from_bands(planted_bands, max_bucket=50, cap_mode="shard")
    )
    dropped = _pair_set(
        candidates_from_bands(planted_bands, max_bucket=50, cap_mode="drop")
    )
    assert sharded == uncapped
    # non-vacuous: the wide bucket dominates and drop mode loses it
    # (band 1's 45 pairs are already among the wide bucket's C(300,2))
    assert len(uncapped) == 300 * 299 // 2 + 6
    assert {(a, b) for a, b, _ in dropped} < {(a, b) for a, b, _ in sharded}
    # cross-path n_bands_shared: ids 0-9 share band 0 (wide → sharded
    # path) AND band 1 (normal path) — the union must aggregate to 2
    assert all(n == 2 for a, b, n in sharded if a < 10 and b < 10)
    assert {(a, b) for a, b, _ in dropped} == {
        (a, b) for a, b, _ in sharded if (a >= 1000) or (a < 10 and b < 10)
    }


def test_shard_assignment_bounds_every_cell(spark, planted_bands):
    """No join task sees an unbounded bucket: every (bucket, shard) holds
    ≤ ~2×max_bucket rows (hash-uniform split of w=300 into k=6), so a
    cell (two shards) is ≤ ~4×max_bucket — bounded by the knob, not by
    the data.  The shard formula is recomputed here independently."""
    max_bucket = 50
    k = 6  # ceil(300/50)
    shard_sizes = (
        planted_bands.where((F.col("band_ix") == 0) & (F.col("band_hash") == 777))
        .select(F.pmod(F.xxhash64(F.col("doc_id"), F.lit(909)), F.lit(k)).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(shard_sizes) == k
    assert max(r["count"] for r in shard_sizes) <= 2 * max_bucket


def test_shard_mode_observation_counters(spark, planted_bands):
    obs = Observation("shard_cap")
    out = candidates_from_bands(
        planted_bands, max_bucket=50, cap_mode="shard", observation=obs
    )
    n = out.count()
    assert n > 0
    m = obs.get
    assert m["sharded_buckets"] == 1
    assert m["max_bucket_width"] == 300
    assert m["replica_rows"] == pytest.approx(300 * 5)  # w·(k−1) extra replicas


def test_shard_mode_rejects_unknown_mode(spark, planted_bands):
    with pytest.raises(ValueError, match="cap_mode"):
        candidates_from_bands(planted_bands, max_bucket=50, cap_mode="split")


@pytest.mark.slow
def test_shard_mode_10k_row_bucket_stress(spark):
    """The VERDICT stress case: a 10^4-row bucket.  Shard mode must emit
    exactly C(10^4, 2) pairs (count equality to the closed form — set
    equality at this size is proven by the smaller planted test) with
    task inputs bounded at ~2×max_bucket rows per cell."""
    w, max_bucket = 10_000, 2_500
    bands = _band_table(spark, [(i, 0, 31337) for i in range(w)])
    n = candidates_from_bands(bands, max_bucket=max_bucket, cap_mode="shard").count()
    assert n == w * (w - 1) // 2


def test_simhash_shard_restores_pigeonhole_guarantee(spark):
    """150 identical signatures collapse into one bucket per band; drop
    mode loses every pair, shard mode returns the full uncapped set —
    the pigeonhole recall guarantee holds unconditionally again."""
    rows = [(i, 0x0F0F0F0F0F0F0F0F) for i in range(150)]
    rows += [(1000, 0x7000000000000000), (1001, 0x7000000000000001)]  # hamming 1
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    kw = dict(n_bands=4, max_hamming=3, stage="none")
    uncapped = {(r.id_a, r.id_b, r.hamming) for r in simhash_candidates(df, **kw).collect()}
    sharded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_candidates(df, max_bucket=30, cap_mode="shard", **kw).collect()
    }
    dropped = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_candidates(df, max_bucket=30, cap_mode="drop", **kw).collect()
    }
    assert sharded == uncapped
    assert len(uncapped) == 150 * 149 // 2 + 1
    assert (1000, 1001, 1) in sharded
    assert dropped == {(1000, 1001, 1)}  # drop mode keeps only the narrow bucket


def test_cross_dedup_shard_keeps_all_corpus_matches(spark):
    """Incremental-dedup shape: the wide bucket lives on the CORPUS side;
    shard mode scatters corpus rows across shard-keyed cells and
    replicates the (small) batch side — every (new, old) candidate of
    the uncapped join survives."""
    corpus_bands = _band_table(
        spark, [(i, 0, 42) for i in range(120)] + [(500, 1, 77)]
    )
    new_bands = _band_table(
        spark, [(9001, 0, 42), (9002, 0, 42), (9003, 1, 77), (9004, 2, 1234)]
    )
    def pairs(**kw):
        return {
            (r.id_a, r.id_b)
            for r in cross_dedup_pairs(
                None, corpus_bands, new_bands=new_bands, **kw
            ).collect()
        }

    uncapped = pairs()
    sharded = pairs(max_bucket=40, cap_mode="shard")
    dropped = pairs(max_bucket=40, cap_mode="drop")
    assert sharded == uncapped
    assert len(uncapped) == 2 * 120 + 1
    assert dropped == {(9003, 500)}


def test_ann_join_shard_equals_uncapped_neighbors(spark):
    """A degenerate embedding bucket (60 near-identical vectors) is
    sharded, not dropped: the per-query top-k equals the uncapped run's
    exactly (ids, cosines and ranks)."""
    import math

    dim = 8
    rows = []
    for i in range(60):  # one dominant direction → one bucket
        v = [1.0, 0.5, 0.25, 0.0, 0.0, 0.0, 0.0, 1e-4 * i]
        rows.append((i, v))
    for i in range(60, 80):  # spread directions
        ang = (i - 60) / 20 * math.pi
        rows.append((i, [math.cos(ang), math.sin(ang), -1.0, 0.5, 0.0, 0.1, -0.2, 0.3]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where(F.col("vec_id").isin(0, 30, 65))
    kw = dict(dim=dim, k=5, n_planes=6, hamming=1)

    def res(**extra):
        return {
            (r.query_id, r.vec_id, r.cosine, r.rk)
            for r in ann_join_topk(queries, corpus, **kw, **extra).collect()
        }

    uncapped = res()
    sharded = res(max_bucket=20, cap_mode="shard")
    dropped = res(max_bucket=20, cap_mode="drop")
    assert sharded == uncapped and uncapped
    assert dropped != uncapped  # the degenerate bucket was genuinely wide


def test_selection_plan_accepts_shard_mode(spark, tmp_path):
    """run_selection(cap_mode='shard') must equal the uncapped run's
    selected set on planted duplicates, and its pairs-stage ledger row
    records sharded metrics, not dropped ones."""
    import json

    from localmod_spark.plans.selection import run_selection

    base = "the alpine meadow study spans decades of careful fieldwork records"
    rows = [(i, "en", base) for i in range(8)]  # 8 identical docs → wide-ish bucket
    rows += [(100, "en", "a completely different document about quarterly finance and audits")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    res = run_selection(
        spark, docs, str(tmp_path / "sel"), max_bucket=3, cap_mode="shard"
    )
    kept = sorted(r.doc_id for r in res.selected.collect())
    assert kept == [0, 100]  # all 8 dups collapse to min-id despite the cap
    ledger = (
        spark.read.option("mergeSchema", "true")
        .parquet(str(tmp_path / "sel" / "_lineage"))
        .where(F.col("stage") == "pairs")
        .collect()
    )
    metrics = json.loads(ledger[0]["metrics"])
    assert metrics.get("sharded_buckets", 0) > 0
    assert "dropped_buckets" not in metrics


def test_shard_mode_with_no_wide_buckets_is_plain_path(spark):
    """cap_mode='shard' over a corpus where nothing exceeds the cap must
    equal the uncapped join AND still report real observation values
    (max_bucket_width from ALL buckets, zero sharded) — parity with drop
    mode's metrics, not nulls."""
    rows = [(i, 0, 100 + i % 7) for i in range(70)]  # widest bucket = 10
    bands = _band_table(spark, rows)
    obs = Observation("no_wide")
    sharded = candidates_from_bands(bands, max_bucket=50, cap_mode="shard", observation=obs)
    got = _pair_set(sharded)
    assert got == _pair_set(candidates_from_bands(bands))
    m = obs.get
    assert m["sharded_buckets"] == 0
    assert m["max_bucket_width"] == 10
    assert m["replica_rows"] == 0.0


def test_lsh_embedding_dups_shard_keeps_all_pairs(spark):
    """The embedding-LSH self-join gets the same giant-bucket guards:
    50 duplicate vectors collapse into one signature bucket — shard mode
    returns the full uncapped near-dup pair set, drop mode loses it."""
    from localmod_spark.operators.similarity import lsh_embedding_dups

    dim = 8
    rows = [(i, [1.0, 0.5, -0.25, 0.0, 0.75, 0.0, 0.0, 0.0]) for i in range(50)]
    rows += [(100, [0.0, -1.0, 0.5, 0.25, 0.0, 0.1, 0.0, 0.2]),
             (101, [0.0, -1.0, 0.5, 0.25, 0.0, 0.1, 0.0, 0.2])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(dim=dim, threshold=0.99, n_planes=6)

    def pairs(**extra):
        return {
            (r.id_a, r.id_b)
            for r in lsh_embedding_dups(emb, **kw, **extra).collect()
        }

    uncapped = pairs()
    sharded = pairs(max_bucket=10, cap_mode="shard")
    dropped = pairs(max_bucket=10, cap_mode="drop")
    assert sharded == uncapped
    assert len(uncapped) == 50 * 49 // 2 + 1
    assert dropped == {(100, 101)}
