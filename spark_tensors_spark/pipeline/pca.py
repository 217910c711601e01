"""PCA over the embedding column — the dimensionality-reduction /
whitening step of an embedding curation pipeline.

Scale shape (the only one that survives 100 TB):

- **Moment pass**: ``mapInPandas`` reduces every Arrow batch to ONE
  fixed-size partial — row count, per-dimension sum, and the d×d Gram
  upper triangle (a BLAS matmul per batch; corpus rows never leave
  their partition).  The shuffle carries #batches·(d²/2+d+1) rows —
  independent of corpus size (same pattern as
  ``quantize.int8_gram_matrix``, which puts the integer form of this
  statistic under the DuckDB value oracle).
- **Driver solve**: covariance = (G − n·μμᵀ)/(n−1) is d×d (64×64 = 32
  KB here) — eigendecomposition is a driver scalar job by design, like
  every production PCA (Spark MLlib's RowMatrix.computePrincipalComponents
  does exactly this for d ≤ 65535).
- **Projection pass**: components ride to executors in the task
  closure (k×d floats), applied as one numpy matmul per Arrow batch.

Eigenvectors are sign-normalized (largest-|component| entry made
positive) so results are deterministic across LAPACK builds.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel(NamedTuple):
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes
    eigenvalues: np.ndarray  # (k,) descending
    explained_ratio: np.ndarray  # (k,) eigenvalue / total variance
    n_rows: int


def moment_table(
    emb: DataFrame,
    dims: int,
    vec_col: str,
    diag_only: bool = False,
    exact_int: bool = False,
) -> DataFrame:
    """The distributed moment pass as a DataFrame: per Arrow batch ONE
    fixed-size partial (count, per-dim sum, Gram upper triangle) packed
    into (slot, val) rows, folded by one groupBy-sum.  Slot layout:
    −1 = row count; 0 ≤ slot < d = Σ x_slot; slot ≥ d encodes the Gram
    upper triangle at i·d+j+d.  This is the statistic `fit_pca`'s
    driver solve consumes — and on integer-valued vectors every val is
    an exact integer, which is how emb_pca_moments puts this pass under
    the DuckDB value oracle.

    ``diag_only`` keeps ONLY the Gram diagonal (slots i·d+i+d): a
    consumer that needs per-dimension variances and not covariances
    (emb_pca_topvar) pays O(d) compute per row and an O(d) partial
    instead of O(d²) — at 100 TB the d² BLAS per batch and the
    (d²/2)-row shuffle are the whole cost of this pass.  Emitted slot
    values are identical to the full pass (same sums, same layout).

    ``exact_int``: for INTEGER-valued vectors, accumulate partials in
    int64 and aggregate on a LONG column — a float64 SUM is exact only
    while every partial and the total stay below 2⁵³ (on int8 codes
    that bound is crossed near 5.6e11 rows, squarely inside the 100 TB
    regime this module targets); the long path is exact to 2⁶³
    (ADVICE r10).  Float-valued inputs must keep the default."""
    d = int(dims)
    acc_dtype = np.int64 if exact_int else np.float64

    def part(batches):
        n = 0
        s = np.zeros(d, dtype=acc_dtype)
        g = (
            np.zeros(d, dtype=acc_dtype)
            if diag_only
            else np.zeros((d, d), dtype=acc_dtype)
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(
                [np.asarray(v[:d], dtype=acc_dtype) for v in pdf[vec_col]]
            )
            n += m.shape[0]
            s += m.sum(axis=0)
            if diag_only:
                g += (m * m).sum(axis=0)
            else:
                g += m.T @ m
        if n:
            if diag_only:
                gram_idx = np.arange(d) * d + np.arange(d) + d
                gram_val = g
            else:
                iu = np.triu_indices(d)
                gram_idx = iu[0] * d + iu[1] + d
                gram_val = g[iu]
            idx = np.concatenate(([-1], np.arange(d), gram_idx))
            val = np.concatenate(
                ([acc_dtype(n)], s, gram_val)
            ).astype(acc_dtype)
            yield pd.DataFrame({"slot": idx.astype("int64"), "val": val})

    val_type = "long" if exact_int else "double"
    return (
        emb.select(vec_col)
        .mapInPandas(part, f"slot long, val {val_type}")
        .groupBy("slot")
        .agg(F.sum("val").alias("v"))
    )


def _moments(emb: DataFrame, dims: int, vec_col: str):
    """One distributed pass → (n, sum_vec (d,), gram (d,d)) floats."""
    d = int(dims)
    tot = moment_table(emb, dims, vec_col).collect()
    vals = {r.slot: r.v for r in tot}
    n = int(round(vals[-1]))
    s = np.array([vals[i] for i in range(d)])
    g = np.zeros((d, d))
    iu = np.triu_indices(d)
    for i, j in zip(*iu):
        g[i, j] = g[j, i] = vals[int(i) * d + int(j) + d]
    return n, s, g


def fit_pca(
    emb: DataFrame,
    dims: int,
    k: int,
    vec_col: str = "embedding",
) -> PCAModel:
    """Fit a k-component PCA with one distributed moment pass and a
    driver-side symmetric eigensolve of the d×d covariance."""
    n, s, g = _moments(emb, dims, vec_col)
    if n < 2:
        raise ValueError(f"PCA needs ≥2 rows, got {n}")
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    eigenvalues = np.maximum(w[order], 0.0)
    comps = v[:, order].T  # (k, d)
    # deterministic sign: make the largest-|x| entry of each axis positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    total = float(np.maximum(w, 0.0).sum())
    ratio = eigenvalues / total if total > 0 else np.zeros_like(eigenvalues)
    return PCAModel(mean, comps, eigenvalues, ratio, n)


def project_pca(
    emb: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, proj array<double>) — centered projection onto the model's
    principal axes; components travel in the task closure (k×d floats),
    one BLAS matmul per Arrow batch."""
    mean = model.mean
    comps_t = model.components.T  # (d, k)
    d = mean.shape[0]

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(
                [np.asarray(v[:d], dtype=np.float64) for v in pdf[vec_col]]
            )
            proj = (m - mean) @ comps_t
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "proj": list(proj)}
            )

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(part, "id long, proj array<double>")
        .withColumnsRenamed({"id": id_col})
    )


def whiten_pca(
    emb: DataFrame,
    model: PCAModel,
    eps: float = 1e-9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PCA whitening: project onto the principal axes and scale each
    coordinate by 1/√(eigenvalue+eps), so the output coordinates have
    unit variance and zero covariance — the standard preprocessing
    before cosine retrieval or clustering on anisotropic embeddings.
    Same closure-broadcast one-matmul-per-batch shape as
    :func:`project_pca`."""
    scale = 1.0 / np.sqrt(model.eigenvalues + eps)
    mean = model.mean
    w_t = (model.components * scale[:, None]).T  # (d, k)
    d = mean.shape[0]

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(
                [np.asarray(v[:d], dtype=np.float64) for v in pdf[vec_col]]
            )
            proj = (m - mean) @ w_t
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "white": list(proj)}
            )

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(part, "id long, white array<double>")
        .withColumnsRenamed({"id": id_col})
    )
