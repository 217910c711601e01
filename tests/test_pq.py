"""Product quantization: codebook training, encoding, ADC search,
reconstruction-error properties."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.pipeline import pq, similarity


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(4, 16)) * 10
    rows = [
        (i, (centers[i % 4] + rng.normal(size=16)).astype(float).tolist())
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_encode_shape_and_range(spark, clustered):
    cb = pq.pq_train(clustered, m=4, n_codes=8, lloyd_iters=1)
    assert cb.shape == (4, 8, 4)
    codes = pq.pq_encode(clustered, cb).collect()
    assert len(codes) == 200
    for r in codes:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)


def test_training_reduces_reconstruction_error(spark, clustered):
    cb0 = pq.pq_train(clustered, m=4, n_codes=8, lloyd_iters=0)
    cb3 = pq.pq_train(clustered, m=4, n_codes=8, lloyd_iters=3)
    e0 = pq.quantization_error(clustered, cb0)
    e3 = pq.quantization_error(clustered, cb3)
    assert e3 < e0


def test_pq_encode_deterministic(spark, clustered):
    cb = pq.pq_train(clustered, m=4, n_codes=8, lloyd_iters=2)
    a = sorted(map(tuple, pq.pq_encode(clustered, cb).collect()))
    cb2 = pq.pq_train(clustered, m=4, n_codes=8, lloyd_iters=2)
    b = sorted(map(tuple, pq.pq_encode(clustered, cb2).collect()))
    assert np.allclose(cb, cb2)
    assert a == b


def test_pq_topk_recall_at_10(spark, clustered):
    """Recall@10 (the standard PQ metric — Jégou et al. report
    recall@R, since raw ADC recall@1 is low by design): the exact L2
    nearest neighbor appears in the ADC top-10 for >= 70% of queries."""
    queries = clustered.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        r.query_id: r.nn_id
        for r in similarity.l2_topk(clustered, queries, k=1).collect()
    }
    cb = pq.pq_train(clustered, m=8, n_codes=16, lloyd_iters=2)
    approx: dict[int, set] = {}
    for r in pq.pq_topk(clustered, queries, cb, k=10).collect():
        approx.setdefault(r.query_id, set()).add(r.nn_id)
    hits = sum(nn in approx.get(q, set()) for q, nn in exact.items())
    assert hits / len(exact) >= 0.7, hits / len(exact)


def test_pq_topk_same_cluster_neighbors(spark, clustered):
    """Every ADC top-5 neighbor of a query lies in the query's true
    cluster (clusters are 10σ apart — PQ cannot confuse them)."""
    queries = clustered.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cb = pq.pq_train(clustered, m=8, n_codes=16, lloyd_iters=2)
    for r in pq.pq_topk(clustered, queries, cb, k=5).collect():
        assert r.nn_id % 4 == r.query_id % 4


def test_query_guard_rejects_oversized_query_sets(spark, clustered):
    import spark_tensors_spark.pipeline.similarity as S

    orig = S.MAX_DRIVER_QUERY_ROWS
    S.MAX_DRIVER_QUERY_ROWS = 10
    try:
        queries = clustered.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        with pytest.raises(ValueError, match="query set exceeds"):
            similarity.cosine_topk(clustered, queries, k=1).collect()
    finally:
        S.MAX_DRIVER_QUERY_ROWS = orig


def test_ivfpq_recall_at_10(spark, clustered):
    """IVF-PQ composition: recall@10 vs exact L2 top-1 on separable
    clusters (measured 0.835 at these params; pinned conservatively)."""
    queries = clustered.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        r.query_id: r.nn_id
        for r in similarity.l2_topk(clustered, queries, k=1).collect()
    }
    approx: dict[int, set] = {}
    res = pq.ivfpq_topk(
        clustered, queries, k=10, n_cells=4, nprobe=2, m=4, n_codes=8,
        lloyd_iters=2,
    )
    for r in res.collect():
        approx.setdefault(r.query_id, set()).add(r.nn_id)
    hits = sum(nn in approx.get(q, set()) for q, nn in exact.items())
    assert hits / len(exact) >= 0.7, hits / len(exact)


def test_ivfpq_rank_contract(spark, clustered):
    """Per query: <=k rows, rk contiguous from 1, adc_dist
    non-decreasing in rk and non-negative."""
    queries = clustered.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    rows = pq.ivfpq_topk(
        clustered, queries, k=5, n_cells=4, nprobe=2, m=4, n_codes=8,
        lloyd_iters=1,
    ).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == 20
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)
        assert all(d >= 0 for d in dists)
        assert all(r.nn_id != q for r in rs)
