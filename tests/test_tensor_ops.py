"""Tensor materialization ops: blockify, frontal slices, spectral init."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.kg.tensor import (
    blockify,
    spectral_init,
    to_coo,
    with_block_ids,
)


@pytest.fixture(scope="module")
def coo(spark):
    rows = [
        (0, 1, 0, 1.0), (1, 2, 0, 1.0), (2, 3, 0, 1.0),
        (3, 0, 1, 1.0), (0, 2, 1, 1.0), (1, 3, 1, 1.0),
    ]
    return spark.createDataFrame(rows, "i long, j long, k long, v double")


def test_block_ids_deterministic(coo):
    b = with_block_ids(coo, shape=(4, 4, 2), blocks=(2, 2, 1))
    got = {(r.i, r.j, r.k): r.block_id for r in b.collect()}
    # bs = (2,2,2); block = i//2 + (j//2)*2 + (k//2)*4
    for (i, j, k), blk in got.items():
        assert blk == i // 2 + (j // 2) * 2 + (k // 2) * 4


def test_blockify_partitions(coo):
    b = blockify(coo, shape=(4, 4, 2), blocks=(2, 2, 1))
    assert "block_id" in b.columns
    assert b.count() == 6


def test_spectral_init_eigenvectors(spark, coo):
    """Fallback eigh path: vectors are orthonormal eigenvectors of the
    symmetrized slice sum."""
    vecs = spectral_init(coo, rank=2)
    assert vecs.shape == (4, 2)
    np.testing.assert_allclose(vecs.T @ vecs, np.eye(2), atol=1e-8)
    # residual check: S v = λ v for recovered columns
    rows = coo.collect()
    s = np.zeros((4, 4))
    for r in rows:
        s[r.i, r.j] += r.v
        s[r.j, r.i] += r.v
    for c in range(2):
        v = vecs[:, c]
        lam = v @ s @ v
        np.testing.assert_allclose(s @ v, lam * v, atol=1e-8)


def test_spectral_init_matches_reference_semantics(spark):
    """init_nvecs (`util.py:80-90`) on a known matrix: top eigenvector
    of a symmetric 2-block structure."""
    rows = [(0, 1, 0, 1.0), (1, 0, 1, 1.0)]
    coo = spark.createDataFrame(rows, "i long, j long, k long, v double")
    vecs = spectral_init(coo, rank=1)
    # S = [[0,2],[2,0]] → top eigenvector ∝ [1,1]/√2
    np.testing.assert_allclose(np.abs(vecs[:, 0]), [2**-0.5, 2**-0.5],
                               atol=1e-8)
