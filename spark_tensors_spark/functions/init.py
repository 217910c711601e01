"""Embedding initializers + norm constraints (SURVEY F11/F12).

Reference: `param.py:7-31` (init_unif 1/√fan_in bound; init_nunif Glorot
√6/√(fan_in+fan_out); init_randn), `TransE.scala:52-54` (Xavier),
`param.py:108-121` (normalize / normless1 constraints — the column-expr
versions live in ``functions.columns``).

Determinism: the reference seeds a global NumPy RNG (`kge/hole.py:216`),
which is partitioning-dependent in a distributed run.  Here every element
is a **counter-based hash** of (seed, id, j) — the same embedding matrix
materializes on any cluster layout, and re-running a lost partition
regenerates identical values (required for Spark task retries).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def _hash_uniform(seed: int, ids: np.ndarray, dim: int) -> np.ndarray:
    """U[0,1) matrix (len(ids) × dim) via a splitmix64-style finalizer —
    pure function of (seed, id, j)."""
    i = ids.astype(np.uint64)[:, None]
    j = np.arange(dim, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        x = i * _M1 + j * _M2 + np.uint64(seed % (1 << 63)) * _M3
        x ^= x >> np.uint64(30)
        x *= _M2
        x ^= x >> np.uint64(27)
        x *= _M3
        x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def init_matrix_np(
    seed: int, ids: np.ndarray, dim: int, kind: str, fan_out: int | None = None
) -> np.ndarray:
    """Batch initializer for the given row ids."""
    u = _hash_uniform(seed, ids, dim)
    if kind == "unif":
        bnd = 1.0 / math.sqrt(dim)
        return (u * 2 - 1) * bnd
    if kind == "nunif":
        bnd = math.sqrt(6) / math.sqrt(dim + (fan_out or dim))
        return (u * 2 - 1) * bnd
    if kind == "randn":
        # Box-Muller over paired uniforms; second uniform from shifted seed
        u2 = _hash_uniform(seed + 0x5EED, ids, dim)
        r = np.sqrt(-2.0 * np.log(np.clip(u, 1e-300, None)))
        return r * np.cos(2 * np.pi * u2)
    raise ValueError(f"unknown init kind: {kind}")


def init_embeddings(
    spark: SparkSession,
    n: int,
    dim: int,
    kind: str = "nunif",
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame(id bigint, vec array<double>) with deterministic init.

    Rows are generated distributed via ``spark.range`` (no driver-side
    matrix); each partition materializes its own rows from the hash, so
    the embedding table scales to any N without driver memory.
    """
    rng = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mat = init_matrix_np(seed, ids, dim, kind)
            yield pd.DataFrame({"id": ids, "vec": list(mat)})

    return rng.mapInPandas(gen, "id long, vec array<double>")
