"""PCA operator contract: parity vs direct numpy PCA on the collected
table, orthonormal axes, descending spectrum, projection variance =
eigenvalue, exact reconstruction at full rank."""

from __future__ import annotations

import numpy as np
import pytest

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.pipeline import pca
from tests.conftest import SF_SMOKE

DIMS = 64


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])


@pytest.fixture(scope="module")
def model(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return pca.fit_pca(emb, dims=DIMS, k=8)


def test_moments_match_numpy(spark, emb_np, model):
    """The distributed moment pass reproduces np.cov's eigenspectrum."""
    cov = np.cov(emb_np, rowvar=False)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    assert model.n_rows == emb_np.shape[0]
    np.testing.assert_allclose(model.eigenvalues, w, rtol=1e-9, atol=1e-9)


def test_components_orthonormal(model):
    k = model.components.shape[0]
    np.testing.assert_allclose(
        model.components @ model.components.T, np.eye(k), atol=1e-9
    )


def test_spectrum_descending_and_ratio(model):
    assert np.all(np.diff(model.eigenvalues) <= 1e-12)
    assert np.all(model.explained_ratio >= 0)
    assert model.explained_ratio.sum() <= 1.0 + 1e-9
    # deterministic sign convention: max-|x| entry of each axis positive
    for row in model.components:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projection_variance_is_eigenvalue(spark, emb_np, model):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    proj = (
        pca.project_pca(emb, model)
        .orderBy("vec_id")
        .collect()
    )
    p = np.array([np.asarray(r.proj) for r in proj])
    # direct projection parity
    expected = (emb_np - model.mean) @ model.components.T
    np.testing.assert_allclose(p, expected, atol=1e-9)
    np.testing.assert_allclose(
        p.var(axis=0, ddof=1), model.eigenvalues, rtol=1e-9
    )


def test_full_rank_reconstruction(spark, emb_np):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    full = pca.fit_pca(emb, dims=DIMS, k=DIMS)
    p = (emb_np - full.mean) @ full.components.T
    recon = p @ full.components + full.mean
    np.testing.assert_allclose(recon, emb_np, atol=1e-8)


def test_whitening_unit_covariance(spark, emb_np):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    model = pca.fit_pca(emb, dims=DIMS, k=16)
    rows = pca.whiten_pca(emb, model).orderBy("vec_id").collect()
    w = np.array([np.asarray(r.white) for r in rows])
    cov = np.cov(w, rowvar=False)
    np.testing.assert_allclose(cov, np.eye(16), atol=1e-6)
    assert abs(w.mean()) < 1e-9


def test_eigen_spectrum_golden(spark):
    """The PCA eigensolve spectrum emb_pca_topvar returned before r10
    (it is now the ORACLED exact top-variance-dimension selection; the
    eigensolve itself is not SQL-expressible).  Same computation, same
    normalization, same r9 digest — the driver-solve contract is
    unchanged."""
    import hashlib

    import pandas as pd

    from tests.oracle_harness import normalize

    emb = load_table(spark, SF_SMOKE, "embeddings")
    model = pca.fit_pca(emb, dims=64, k=8)
    rows = pd.DataFrame(
        {
            "pc": range(8),
            "eigenvalue": [
                round(float(v), 4) + 0.0 for v in model.eigenvalues
            ],
            "explained_ratio": [
                round(float(v), 4) + 0.0 for v in model.explained_ratio
            ],
        }
    )
    df = spark.createDataFrame(
        rows, "pc int, eigenvalue double, explained_ratio double"
    )
    cols, out = normalize(df.columns, [tuple(r) for r in df.collect()])
    got = hashlib.md5(repr((cols, out)).encode()).hexdigest()
    assert (len(out), got) == (8, "7a76b50ea0fb182ad8d460acf33b667d")
