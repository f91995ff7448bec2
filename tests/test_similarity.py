"""Similarity-search operators: exact top-k, LSH and IVF approximate paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from localmod_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
    with_ivf_list,
    with_lsh_bucket,
)

DIM = 16
N = 300


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(DIM)]) for i in range(N)]
    # plant a near-duplicate of vec 0 at id 999
    base = np.array(rows[0][1])
    rows.append((999, [float(x) for x in base + rng.randn(DIM) * 0.01]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()


def test_exact_topk_finds_planted_neighbor(emb):
    top = cosine_topk(emb, 0, k=5).collect()
    assert top[0].vec_id == 999 and top[0].cosine > 0.99
    # descending order
    scores = [r.cosine for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ivf_assignment_and_probe(emb):
    listed = with_ivf_list(emb, dim=DIM, n_lists=8)
    lists = listed.select("ivf_list").distinct().collect()
    assert all(0 <= r.ivf_list < 8 for r in lists)
    # the planted near-dup lands in the query's list → probe finds it
    top = ivf_topk(listed, 0, k=3, n_probe=2, dim=DIM, n_lists=8).collect()
    assert top and top[0].vec_id == 999


def test_ivf_probe_prunes(emb, spark):
    listed = with_ivf_list(emb, dim=DIM, n_lists=8).persist()
    total = listed.count()
    top = ivf_topk(listed, 0, k=3, n_probe=1, dim=DIM, n_lists=8)
    # scored candidates come from 1 of 8 lists — far fewer than the table
    probed_list = listed.where(F.col("vec_id") == 0).select("ivf_list").first()[0]
    probed_n = listed.where(F.col("ivf_list") == probed_list).count()
    assert probed_n < total * 0.6
    assert len(top.collect()) <= 3
    listed.unpersist()


def test_lsh_bucket_probe_recall_on_planted_dup(emb):
    bucketed = with_lsh_bucket(emb, dim=DIM, n_planes=6)
    top = lsh_topk(bucketed, 0, k=3).collect()
    # near-identical vectors share all hyperplane signs → same bucket
    assert top and top[0].vec_id == 999


def test_lsh_multiprobe_expands_candidates(emb, spark):
    """hamming=1 probes the query bucket plus each one-bit-flip bucket:
    strictly more candidates, and every exact-bucket hit is retained."""
    from pyspark.sql import functions as F
    from localmod_spark.operators.similarity import with_lsh_bucket

    bucketed = with_lsh_bucket(emb, dim=DIM, n_planes=6).persist()
    exact = lsh_topk(bucketed, 0, k=50, hamming=0).collect()
    multi = lsh_topk(bucketed, 0, k=50, hamming=1).collect()
    assert {r.vec_id for r in exact} <= {r.vec_id for r in multi}
    assert len(multi) >= len(exact)
    # the probed set is still pruned: strictly fewer rows than the corpus
    qb = bucketed.where(F.col("vec_id") == 0).select("lsh_bucket").first()[0]
    xor = F.col("lsh_bucket").bitwiseXOR(F.lit(qb))
    probed = bucketed.where((xor == 0) | ((xor != 0) & (xor.bitwiseAND(xor - 1) == 0))).count()
    assert probed < bucketed.count()
    bucketed.unpersist()
