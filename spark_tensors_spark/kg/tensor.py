"""Sparse 3-way tensor materialization (SURVEY §1.1, F19/A10/F15).

The reference started a COO blockification (`rdfio.py:12-35` custom
``ThreeWayTensorPartitioner``, `rdfio.py:73-78` — unfinished: ``blockify``
computes one index then stops).  Here the COO tensor is just the encoded
triples DataFrame with a value column, block ids are a computed column,
and locality comes from ``repartition(block_id)`` — Catalyst handles the
exchange; no custom Partitioner class is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_coo(encoded: DataFrame, value: float = 1.0) -> DataFrame:
    """Encoded triples → COO tensor entries (i=s_id, j=o_id, k=p_id, v).

    Mode convention follows the reference's frontal-slice layout: one
    slice per relation (`util.py:72-77` ``to_tensor``).
    """
    return encoded.select(
        F.col("s_id").alias("i"),
        F.col("o_id").alias("j"),
        F.col("p_id").alias("k"),
        F.lit(float(value)).alias("v"),
    )


def with_block_ids(
    coo: DataFrame,
    shape: tuple[int, int, int],
    blocks: tuple[int, int, int],
) -> DataFrame:
    """Add the linearized block id of `rdfio.py:27-35` (fixed semantics —
    the original relied on Python-2 integer ``/``):

        block = (i div bs1) + (j div bs2)*pn1 + (k div bs3)*pn1*pn2

    where bs = ceil(shape/blocks), pn = blocks.
    """
    pn1, pn2, _pn3 = blocks
    bs = [-(-dim // b) for dim, b in zip(shape, blocks)]  # ceil div
    # floor, not cast: explicit floor matches every engine's semantics for
    # non-negative ids (DuckDB CAST rounds half-even; Spark CAST truncates)
    block = (
        F.floor(F.col("i") / bs[0])
        + F.floor(F.col("j") / bs[1]) * pn1
        + F.floor(F.col("k") / bs[2]) * pn1 * pn2
    )
    return coo.withColumn("block_id", block)


def blockify(
    coo: DataFrame,
    shape: tuple[int, int, int],
    blocks: tuple[int, int, int],
) -> DataFrame:
    """Co-locate tensor entries by block: computed block id + a single
    hash exchange.  Finishes what `rdfio.py:73-78` left unfinished, with
    built-in repartitioning instead of a custom RDD Partitioner.
    """
    return with_block_ids(coo, shape, blocks).repartition("block_id")


def spectral_init(coo: DataFrame, rank: int):
    """F16 ``init_nvecs`` (`util.py:80-90`): top-`rank` eigenvectors of
    S = Σ_k (T_k + T_kᵀ).

    The symmetrization + slice-sum is pure SQL (a union with swapped
    indices and one hash aggregate — distributed, nothing driver-side
    until the final sparse matrix), then `scipy.sparse.linalg.eigsh`
    runs on the driver: S has one entry per (i,j) pair of the KG —
    FB15k-scale MBs.  Beyond that, the same aggregate feeds MLlib's
    ``RowMatrix.computeSVD`` (documented scale path, SURVEY §2.7 F16).
    """
    import numpy as np

    sym = (
        coo.select("i", "j", "v")
        .unionAll(
            coo.select(
                F.col("j").alias("i"), F.col("i").alias("j"), F.col("v")
            )
        )
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    pdf = sym.toPandas()
    n = int(max(pdf["i"].max(), pdf["j"].max())) + 1
    try:  # sparse Lanczos when scipy is available (the at-scale path)
        from scipy.sparse import coo_matrix
        from scipy.sparse.linalg import eigsh

        s = coo_matrix(
            (pdf["v"].to_numpy(dtype=np.float64), (pdf["i"], pdf["j"])),
            shape=(n, n),
        ).tocsr()
        _vals, vecs = eigsh(s, k=min(rank, n - 1))
        return vecs  # (n, rank)
    except ImportError:
        if n > 20000:
            raise NotImplementedError(
                "dense eigh fallback capped at n=20000; install scipy "
                "for the sparse Lanczos path"
            ) from None
        dense = np.zeros((n, n))
        dense[pdf["i"].to_numpy(), pdf["j"].to_numpy()] = pdf[
            "v"
        ].to_numpy(dtype=np.float64)
        vals, vecs = np.linalg.eigh(dense)
        top = np.argsort(vals)[::-1][:rank]
        return vecs[:, top]


def frontal_slices(coo: DataFrame):
    """Iterator of (relation id k, scipy.sparse.lil_matrix) — the
    reference's ``to_tensor`` layout (`util.py:72-77`), materialized one
    relation at a time via grouped Arrow batches (never the whole tensor
    on the driver).

    Requires scipy; import is gated so the engine core has no scipy
    dependency.
    """
    import numpy as np
    from scipy.sparse import lil_matrix

    dims = coo.agg(
        F.max("i").alias("mi"), F.max("j").alias("mj")
    ).collect()[0]
    n_i, n_j = int(dims["mi"]) + 1, int(dims["mj"]) + 1

    ks = [r["k"] for r in coo.select("k").distinct().orderBy("k").collect()]
    for k in ks:
        rows = coo.filter(F.col("k") == k).select("i", "j", "v").toPandas()
        m = lil_matrix((n_i, n_j))
        m[rows["i"].to_numpy(), rows["j"].to_numpy()] = rows["v"].to_numpy(
            dtype=np.float64
        )
        yield k, m
