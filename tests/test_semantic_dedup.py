"""Semantic dedup (pipeline/dedup.semantic_dedup): brute-force parity
on random integer vectors, keep/remove partition invariants, and the
min-id-survives guarantee."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.pipeline.dedup import semantic_dedup
from spark_tensors_spark.pipeline.similarity import (
    kmeans_assign,
    pseudo_centroids,
)

K, DIM = 4, 8


def _codes(rng, n):
    return rng.integers(-40, 41, size=(n, DIM))


def _spark_df(spark, mat):
    pdf = pd.DataFrame(
        {"vec_id": range(len(mat)), "codes": [list(map(int, r)) for r in mat]}
    )
    return spark.createDataFrame(pdf, "vec_id long, codes array<int>")


def _brute(mat, cents, tau):
    """Python oracle: assignment by exact squared L2 (ties -> smaller
    cluster), removal if ANY smaller-id same-cluster vec has cos>=tau."""
    d2 = ((mat[:, None, :].astype(np.int64) - cents[None, :, :]) ** 2).sum(2)
    assign = d2.argmin(1)  # argmin takes first max == smaller id
    n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    removed = {}
    for j in range(len(mat)):
        ks = [
            i for i in range(j)
            if assign[i] == assign[j] and float(n[i] @ n[j]) >= tau
        ]
        if ks:
            removed[j] = (int(assign[j]), min(ks), len(ks))
    return assign, removed


@pytest.mark.parametrize("seed", [7, 42])
def test_matches_bruteforce(spark, seed):
    rng = np.random.default_rng(seed)
    mat = _codes(rng, 60)
    # plant explicit near-dups: exact copies and scaled copies
    mat[10] = mat[3]
    mat[11] = np.clip(mat[3] * 2, -40, 40)
    cents = pseudo_centroids(K, DIM).astype(int)
    tau = 0.8
    out = {
        r.removed_id: (r.cluster_id, r.kept_id, r.n_dups)
        for r in semantic_dedup(
            _spark_df(spark, mat), cents, threshold=tau
        ).collect()
    }
    _assign, want = _brute(mat, cents, tau)
    assert out == want
    assert 10 in out  # the planted exact copy was removed


def test_min_id_of_every_group_survives(spark):
    rng = np.random.default_rng(1)
    mat = _codes(rng, 40)
    for j in (5, 6, 7):
        mat[j] = mat[4]  # one 4-member dup group
    cents = pseudo_centroids(K, DIM).astype(int)
    res = semantic_dedup(_spark_df(spark, mat), cents, threshold=0.99)
    removed = {r.removed_id for r in res.collect()}
    assert {5, 6, 7} <= removed and 4 not in removed
    # every removed vec points at a smaller surviving-or-not id; the
    # group minimum is never removed (no smaller qualifying neighbour)
    for r in res.collect():
        assert r.kept_id < r.removed_id


def test_assignment_tie_breaks_to_smaller_cluster(spark):
    # a vector equidistant to two centroids must take the smaller id
    cents = np.array([[2, 0], [0, 2]])
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "codes": [[1, 1]]}),
        "vec_id long, codes array<int>",
    )
    got = kmeans_assign(df, cents).collect()[0].cluster_id
    assert got == 0


def test_max_cluster_guard_is_a_subset_of_unguarded(spark):
    """The skew guard (LSH sub-bucketing of oversized clusters) may
    only LOSE candidate pairs, never invent them: every guarded
    removal must appear unguarded, with a kept_id that is a real
    qualifying smaller-id neighbour (kept_id >= the unguarded min)."""
    rng = np.random.default_rng(123)
    mat = _codes(rng, 120)
    cents = pseudo_centroids(K, DIM)
    df = _spark_df(spark, mat)
    tau = 0.35

    unguarded = {
        r.removed_id: (r.cluster_id, r.kept_id, r.n_dups)
        for r in semantic_dedup(df, cents, threshold=tau).collect()
    }
    guarded_rows = semantic_dedup(
        df, cents, threshold=tau, max_cluster=8, sub_planes=3
    ).collect()
    # with 120 vecs over 4 clusters, max_cluster=8 forces the
    # sub-bucket path on every oversized cluster
    assert len(guarded_rows) <= len(unguarded)
    for r in guarded_rows:
        assert r.removed_id in unguarded
        cl, kept_min, ndups = unguarded[r.removed_id]
        assert r.cluster_id == cl
        assert r.kept_id >= kept_min
        assert r.n_dups <= ndups
        # kept_id must be a genuine qualifying neighbour
        a, b = mat[r.kept_id], mat[r.removed_id]
        na = a / np.linalg.norm(a)
        nb = b / np.linalg.norm(b)
        assert float(na @ nb) >= tau
        assert r.kept_id < r.removed_id


def test_max_cluster_guard_noop_when_clusters_small(spark):
    """A max_cluster larger than every cluster must change nothing."""
    rng = np.random.default_rng(5)
    mat = _codes(rng, 60)
    cents = pseudo_centroids(K, DIM)
    df = _spark_df(spark, mat)
    base = sorted(
        (r.cluster_id, r.removed_id, r.kept_id, r.n_dups)
        for r in semantic_dedup(df, cents, threshold=0.35).collect()
    )
    guarded = sorted(
        (r.cluster_id, r.removed_id, r.kept_id, r.n_dups)
        for r in semantic_dedup(
            df, cents, threshold=0.35, max_cluster=10_000
        ).collect()
    )
    assert base == guarded
