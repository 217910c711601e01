"""Distributed PARAFAC / CP decomposition via ALS (CP-ALS).

The reference *declares* PARAFAC as a target — "PARAFAC (via
GigaTensor/HaTen2)" (`README.md:4-8`) — but implements it nowhere
(SURVEY §0).  This module supplies it Spark-first, following the
GigaTensor insight (KDD 2012, cited by the reference README): the
bottleneck MTTKRP (matricized tensor times Khatri-Rao product) never
materializes the Khatri-Rao product; it is a join + segment-sum over the
sparse COO table.

Model: X[i,j,k] ≈ Σ_r A[i,r]·B[j,r]·C[k,r]  (rank-R CP)

Each ALS step for factor A:
    M = MTTKRP(X, B, C):  M[i] = Σ_{(i,j,k,v)} v · (B[j] ∘ C[k])
    G = (BᵀB) ∘ (CᵀC)                       (R×R, driver)
    A = M @ pinv(G)

Spark mapping of MTTKRP (the only data-scale step):
    coo ⋈ B on j ⋈ C on k            — hash equi-joins (AQE broadcasts
                                       the factor side when it fits)
    zip_with(bv, cv, *) · v          — JVM columnar elementwise product
    posexplode → groupBy(i, pos) sum — partial+final hash agg; nothing
                                       wider than (i, R) ever shuffles
Gram matrices are R×R (R ≤ 64) → computed driver-side from the factor
matrices, which stay driver-held numpy (entities × R floats — MBs at
reference scale; the same join-update scale path as the KGE trainer
applies beyond that, SURVEY §4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_tensors_spark.functions.init import _hash_uniform


def _factor_df(spark: SparkSession, mat: np.ndarray, id_name: str) -> DataFrame:
    pdf = pd.DataFrame(
        {id_name: np.arange(len(mat)), "vec": [r.tolist() for r in mat]}
    )
    return spark.createDataFrame(pdf, f"{id_name} long, vec array<double>")


def mttkrp_wide(
    coo: DataFrame,
    factor_b: DataFrame,
    factor_c: DataFrame,
    rank: int,
    mode_col: str = "i",
    b_col: str = "j",
    c_col: str = "k",
    val_col: str = "v",
    broadcast_factors: bool = True,
) -> DataFrame:
    """M[i] = Σ v · (B[j] ∘ C[k]) as one array row per mode id.

    Declarative join + per-component column sums: Catalyst broadcasts
    the small factor tables, each of the `rank` components aggregates as
    its own column inside ONE hash aggregate (map-side combine, no
    explode) — the pre-agg posexplode form shuffled `rank×nnz` rows,
    this shuffles `nnz` array rows.

    ``broadcast_factors=False`` drops the broadcast hints for the
    DataFrame-factor scale path (`JoinMergeCPALS`), where a factor can
    be too large to broadcast — AQE then picks shuffle vs broadcast
    from runtime sizes.
    """
    b = factor_b.select(F.col(b_col), F.col("vec").alias("_bv"))
    c = factor_c.select(F.col(c_col), F.col("vec").alias("_cv"))
    if broadcast_factors:
        b, c = F.broadcast(b), F.broadcast(c)
    joined = coo.join(b, b_col).join(c, c_col)
    prod = joined.select(
        F.col(mode_col),
        F.col(val_col),
        F.zip_with("_bv", "_cv", lambda x, y: x * y).alias("_bc"),
    )
    agg = prod.groupBy(mode_col).agg(
        *[
            F.sum(F.col(val_col) * F.get("_bc", r)).alias(f"_m{r}")
            for r in range(rank)
        ]
    )
    return agg.select(
        mode_col,
        F.array(*[F.col(f"_m{r}") for r in range(rank)]).alias("m"),
    )


def mttkrp(
    coo: DataFrame,
    factor_b: DataFrame,
    factor_c: DataFrame,
    mode_col: str = "i",
    b_col: str = "j",
    c_col: str = "k",
    val_col: str = "v",
    rank: int | None = None,
    broadcast_factors: bool = True,
) -> DataFrame:
    """(i, pos, m) row form of :func:`mttkrp_wide` (the oracle-checked
    public shape); the explode happens AFTER aggregation, on the
    (distinct-mode × rank) result, never on the nnz-sized input."""
    if rank is None:
        rank = len(factor_b.select("vec").first()["vec"])
    wide = mttkrp_wide(
        coo, factor_b, factor_c, rank, mode_col, b_col, c_col, val_col,
        broadcast_factors=broadcast_factors,
    )
    return wide.select(
        mode_col, F.posexplode("m").alias("pos", "m")
    )


def _collect_mttkrp(
    m_wide: DataFrame, n_rows: int, rank: int, mode_col: str
) -> np.ndarray:
    out = np.zeros((n_rows, rank))
    pdf = m_wide.toPandas()
    if len(pdf):
        out[pdf[mode_col].to_numpy()] = np.stack(pdf["m"].to_numpy())
    return out


class CPALS:
    """Rank-R CP decomposition of a COO DataFrame(i, j, k, v).

    Deterministic hash-seeded init; `fit` runs ALS sweeps and records
    the Frobenius fit per sweep (fit = 1 − ‖X − X̂‖/‖X‖, computed
    distributed against the sparse entries plus the closed-form
    ‖X̂‖² = 1ᵀ(AᵀA ∘ BᵀB ∘ CᵀC)1)."""

    def __init__(
        self,
        spark: SparkSession,
        n_i: int,
        n_j: int,
        n_k: int,
        rank: int = 8,
        seed: int = 42,
    ):
        self.spark = spark
        self.rank = rank
        self.n_i, self.n_j, self.n_k = n_i, n_j, n_k
        self.A = _hash_uniform(seed, np.arange(n_i), rank)
        self.B = _hash_uniform(seed + 1, np.arange(n_j), rank)
        self.C = _hash_uniform(seed + 2, np.arange(n_k), rank)
        self.fit_history: list[float] = []
        # ids actually referenced by the fitted COO (set by fit):
        # MTTKRP's joins are inner, so only these factor rows ever
        # contribute — shipping the full id space is pure overhead
        self._ids: dict[str, np.ndarray] = {}
        self._frame_cache: dict[tuple, DataFrame] = {}
        # bumped on each factor update — the frame-cache key (id(mat)
        # would be unsafe: the allocator can reuse a freed array's id)
        self._version = {"i": 0, "j": 0, "k": 0}

    def _sub_factor(self, mat: np.ndarray, mode: str, id_name: str) -> DataFrame:
        # memoized per factor VERSION: within a sweep each factor frame
        # is consumed by two MTTKRPs + the fit job, and only its own
        # update invalidates it — rebuilding the pandas→JVM frame every
        # consumer was a third of the driver-side sweep cost
        key = (mode, id_name, self._version[mode])
        hit = self._frame_cache.get(key)
        if hit is not None:
            return hit
        ids = self._ids.get(mode)
        if ids is None:
            ids = np.arange(len(mat))
        pdf = pd.DataFrame(
            {id_name: ids, "vec": [mat[i].tolist() for i in ids]}
        )
        df = self.spark.createDataFrame(
            pdf, f"{id_name} long, vec array<double>"
        )
        self._frame_cache = {
            k: v for k, v in self._frame_cache.items()
            if k[0] != mode
        }
        self._frame_cache[key] = df
        return df

    # -- one ALS sweep: update A, then B, then C ----------------------

    @staticmethod
    def _ridge(gram: np.ndarray) -> np.ndarray:
        """Tiny Tikhonov term: once a factor collapses to the true rank
        the gram goes singular and raw pinv solutions wobble."""
        return gram + 1e-9 * np.trace(gram) * np.eye(len(gram))

    def _update(self, coo: DataFrame, mode: str) -> None:
        if mode == "i":
            fb, fc = self._sub_factor(self.B, "j", "j"), self._sub_factor(self.C, "k", "k")
            m = _collect_mttkrp(
                mttkrp_wide(coo, fb, fc, self.rank, "i", "j", "k"),
                self.n_i, self.rank, "i",
            )
            gram = (self.B.T @ self.B) * (self.C.T @ self.C)
            self.A = m @ np.linalg.pinv(self._ridge(gram))
        elif mode == "j":
            fa, fc = self._sub_factor(self.A, "i", "i"), self._sub_factor(self.C, "k", "k")
            m = _collect_mttkrp(
                mttkrp_wide(coo, fa, fc, self.rank, "j", "i", "k"),
                self.n_j, self.rank, "j",
            )
            gram = (self.A.T @ self.A) * (self.C.T @ self.C)
            self.B = m @ np.linalg.pinv(self._ridge(gram))
        else:
            fa, fb = self._sub_factor(self.A, "i", "i"), self._sub_factor(self.B, "j", "j")
            m = _collect_mttkrp(
                mttkrp_wide(coo, fa, fb, self.rank, "k", "i", "j"),
                self.n_k, self.rank, "k",
            )
            gram = (self.A.T @ self.A) * (self.B.T @ self.B)
            self.C = m @ np.linalg.pinv(self._ridge(gram))
        self._version[mode] += 1

    def _fit_value(self, coo: DataFrame, norm_x_sq: float) -> float:
        """1 − √(‖X‖² − 2⟨X, X̂⟩ + ‖X̂‖²)/‖X‖ over sparse entries."""
        fa = self._sub_factor(self.A, "i", "i")
        fb = self._sub_factor(self.B, "j", "j")
        fc = self._sub_factor(self.C, "k", "k")
        scored = (
            coo.join(F.broadcast(fa.withColumnRenamed("vec", "_av")), "i")
            .join(F.broadcast(fb.withColumnRenamed("vec", "_bv")), "j")
            .join(F.broadcast(fc.withColumnRenamed("vec", "_cv")), "k")
            .select(
                "v",
                F.aggregate(
                    F.zip_with(
                        F.zip_with("_av", "_bv", lambda x, y: x * y),
                        "_cv",
                        lambda xy, z: xy * z,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("xhat"),
            )
        )
        row = scored.agg(
            F.sum(F.col("v") * F.col("xhat")).alias("inner")
        ).first()
        inner = float(row["inner"] or 0.0)
        gram_all = (
            (self.A.T @ self.A) * (self.B.T @ self.B) * (self.C.T @ self.C)
        )
        norm_hat_sq = float(gram_all.sum())
        resid_sq = max(norm_x_sq - 2 * inner + norm_hat_sq, 0.0)
        return 1.0 - np.sqrt(resid_sq) / max(np.sqrt(norm_x_sq), 1e-12)

    # ----------------------------------------------------------- export

    def save(self, path: str) -> None:
        """Checkpoint: one parquet per factor + JSON sidecar (same S6/S7
        mapping as the KGE trainer)."""
        import json
        import os

        for name, mat in (("A", self.A), ("B", self.B), ("C", self.C)):
            pdf = pd.DataFrame(
                {"id": np.arange(len(mat)),
                 "vec": [r.tolist() for r in mat]}
            )
            self.spark.createDataFrame(
                pdf, "id long, vec array<double>"
            ).write.mode("overwrite").parquet(
                os.path.join(path, f"factor_{name}.parquet")
            )
        with open(os.path.join(path, "model.json"), "w") as fh:
            json.dump(
                {
                    "rank": self.rank,
                    "n_i": self.n_i, "n_j": self.n_j, "n_k": self.n_k,
                    "fit_history": self.fit_history,
                },
                fh,
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "CPALS":
        import json
        import os

        with open(os.path.join(path, "model.json")) as fh:
            meta = json.load(fh)
        m = cls(
            spark, meta["n_i"], meta["n_j"], meta["n_k"],
            rank=meta["rank"],
        )
        m.fit_history = list(meta["fit_history"])
        for name in ("A", "B", "C"):
            mat = getattr(m, name)
            for r in spark.read.parquet(
                os.path.join(path, f"factor_{name}.parquet")
            ).collect():
                mat[r["id"]] = np.asarray(r["vec"])
        return m

    def fit(self, coo: DataFrame, sweeps: int = 5) -> "CPALS":
        coo = coo.select("i", "j", "k", "v").cache()
        stats = coo.agg(
            F.sum(F.col("v") * F.col("v")).alias("nsq"),
            F.collect_set("i").alias("ri"),
            F.collect_set("j").alias("rj"),
            F.collect_set("k").alias("rk"),
        ).first()
        norm_x_sq = float(stats["nsq"])
        self._ids = {
            "i": np.array(sorted(stats["ri"])),
            "j": np.array(sorted(stats["rj"])),
            "k": np.array(sorted(stats["rk"])),
        }
        for _ in range(sweeps):
            self._update(coo, "i")
            self._update(coo, "j")
            self._update(coo, "k")
            self.fit_history.append(self._fit_value(coo, norm_x_sq))
        coo.unpersist()
        return self


def gram_upper_table(df: DataFrame, rank: int) -> DataFrame:
    """(a, b, g): the R(R+1)/2 upper-triangle entries of Σ_rows
    vec·vecᵀ — the SAME single wide aggregate
    :meth:`JoinMergeCPALS._gram` collects (driver state = R×R floats),
    exposed as a DataFrame so the declared normal-equation query
    (`tns_als_normal_eq`) can gate it under the DuckDB oracle.  One
    scan-side hash aggregate; the melt is a `stack` projection over
    the single result row."""
    pairs = [(a, b) for a in range(rank) for b in range(a, rank)]
    aggs = [
        F.sum(F.get("vec", a) * F.get("vec", b)).alias(f"g_{a}_{b}")
        for a, b in pairs
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"{a}, {b}, g_{a}_{b}" for a, b in pairs)
    return one.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (a, b, g)")
    ).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("g"),
    )


def _uniform_factor_df(
    spark: SparkSession, n: int, rank: int, seed: int, id_name: str
) -> DataFrame:
    """Distributed U[0,1) factor init — the SAME counter-hash values as
    the driver path's `_hash_uniform(seed, arange(n), rank)`, generated
    per partition from `spark.range` (no driver matrix, retry-safe)."""
    rng = spark.range(
        0, n, 1, min(spark.sparkContext.defaultParallelism, max(n, 1))
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mat = _hash_uniform(seed, ids, rank)
            yield pd.DataFrame({id_name: ids, "vec": list(mat)})

    return rng.mapInPandas(gen, f"{id_name} long, vec array<double>")


class JoinMergeCPALS:
    """CP-ALS with DataFrame-resident factors — the 100 TB path for the
    last driver-held state in the tensor layer (SCALE.md cliff #3).

    Where :class:`CPALS` keeps A/B/C as numpy on the driver (right at
    reference scale: entities × R floats are MBs), this trainer keeps
    each factor as a DataFrame(id, vec) that never passes through the
    driver.  Per mode update, everything that touches data scale stays
    distributed:

    - MTTKRP: the same `mttkrp_wide` join+agg (`broadcast_factors=False`
      so AQE sizes the joins at runtime);
    - Gram matrices: ONE hash aggregate per factor producing the R(R+1)/2
      upper-triangle sums — the only driver state is R×R floats;
    - solve: the R×R Hadamard gram is inverted on the driver (same ridge
      + pinv as the driver path) and applied as a codegen array
      expression in a LEFT JOIN merge — rows of the mode with no
      nonzeros become zero rows, exactly like the driver path's
      zero-filled MTTKRP;
    - factor frames are eagerly `localCheckpoint`ed per update
      (plan-growth control, same as `JoinMergeKGETrainer`).

    Parity: fit trajectory matches :class:`CPALS` to ~1e-9 on the same
    tensor/seed (tests/test_parafac.py) — differences are only float
    summation order inside grams/matmuls.
    """

    def __init__(
        self,
        spark: SparkSession,
        n_i: int,
        n_j: int,
        n_k: int,
        rank: int = 8,
        seed: int = 42,
    ):
        self.spark = spark
        self.rank = rank
        self.n_i, self.n_j, self.n_k = n_i, n_j, n_k
        self.A_df = _uniform_factor_df(spark, n_i, rank, seed, "i").localCheckpoint()
        self.B_df = _uniform_factor_df(spark, n_j, rank, seed + 1, "j").localCheckpoint()
        self.C_df = _uniform_factor_df(spark, n_k, rank, seed + 2, "k").localCheckpoint()
        self.fit_history: list[float] = []

    # ------------------------------------------------------------ pieces

    def _gram(self, df: DataFrame) -> np.ndarray:
        """(R×R) Σ_rows vec·vecᵀ via one distributed aggregate — the
        R(R+1)/2 upper-triangle sums collect as a single row."""
        r = self.rank
        aggs = [
            F.sum(F.get("vec", a) * F.get("vec", b)).alias(f"g_{a}_{b}")
            for a in range(r)
            for b in range(a, r)
        ]
        row = df.agg(*aggs).first()
        g = np.zeros((r, r))
        for a in range(r):
            for b in range(a, r):
                g[a, b] = g[b, a] = float(row[f"g_{a}_{b}"] or 0.0)
        return g

    def _solve_merge(
        self, factor_df: DataFrame, m_wide: DataFrame, ginv: np.ndarray,
        id_name: str,
    ) -> DataFrame:
        """factor_new = M @ ginv as a LEFT-JOIN array expression; ids
        with no MTTKRP row (no nonzeros in their slice) become zero rows
        — identical to the driver path's zero-filled collect."""
        r = self.rank
        joined = factor_df.select(id_name).join(m_wide, id_name, "left")
        has_m = F.col("m").isNotNull()
        cols = []
        for col_r in range(r):
            acc = F.lit(0.0)
            for s in range(r):
                acc = acc + F.get("m", s) * F.lit(float(ginv[s, col_r]))
            cols.append(F.when(has_m, acc).otherwise(F.lit(0.0)))
        return joined.select(
            id_name, F.array(*cols).alias("vec")
        ).localCheckpoint()

    def _update(self, coo: DataFrame, mode: str) -> None:
        if mode == "i":
            m = mttkrp_wide(coo, self.B_df, self.C_df, self.rank,
                            "i", "j", "k", broadcast_factors=False)
            gram = self._gram(self.B_df) * self._gram(self.C_df)
            old = self.A_df
            self.A_df = self._solve_merge(
                old, m, np.linalg.pinv(CPALS._ridge(gram)), "i"
            )
        elif mode == "j":
            m = mttkrp_wide(coo, self.A_df, self.C_df, self.rank,
                            "j", "i", "k", broadcast_factors=False)
            gram = self._gram(self.A_df) * self._gram(self.C_df)
            old = self.B_df
            self.B_df = self._solve_merge(
                old, m, np.linalg.pinv(CPALS._ridge(gram)), "j"
            )
        else:
            m = mttkrp_wide(coo, self.A_df, self.B_df, self.rank,
                            "k", "i", "j", broadcast_factors=False)
            gram = self._gram(self.A_df) * self._gram(self.B_df)
            old = self.C_df
            self.C_df = self._solve_merge(
                old, m, np.linalg.pinv(CPALS._ridge(gram)), "k"
            )

    def _fit_value(self, coo: DataFrame, norm_x_sq: float) -> float:
        scored = (
            coo.join(self.A_df.withColumnRenamed("vec", "_av"), "i")
            .join(self.B_df.withColumnRenamed("vec", "_bv"), "j")
            .join(self.C_df.withColumnRenamed("vec", "_cv"), "k")
            .select(
                "v",
                F.aggregate(
                    F.zip_with(
                        F.zip_with("_av", "_bv", lambda x, y: x * y),
                        "_cv",
                        lambda xy, z: xy * z,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("xhat"),
            )
        )
        row = scored.agg(F.sum(F.col("v") * F.col("xhat")).alias("inner")).first()
        inner = float(row["inner"] or 0.0)
        norm_hat_sq = float(
            (self._gram(self.A_df) * self._gram(self.B_df)
             * self._gram(self.C_df)).sum()
        )
        resid_sq = max(norm_x_sq - 2 * inner + norm_hat_sq, 0.0)
        return 1.0 - np.sqrt(resid_sq) / max(np.sqrt(norm_x_sq), 1e-12)

    # ------------------------------------------------------------ fit

    def fit(self, coo: DataFrame, sweeps: int = 5) -> "JoinMergeCPALS":
        coo = coo.select("i", "j", "k", "v").cache()
        norm_x_sq = float(
            coo.agg(F.sum(F.col("v") * F.col("v")).alias("n")).first()["n"]
        )
        for _ in range(sweeps):
            self._update(coo, "i")
            self._update(coo, "j")
            self._update(coo, "k")
            self.fit_history.append(self._fit_value(coo, norm_x_sq))
        coo.unpersist()
        return self

    def factors(self) -> tuple[DataFrame, DataFrame, DataFrame]:
        return (
            self.A_df.select(F.col("i").alias("id"), "vec"),
            self.B_df.select(F.col("j").alias("id"), "vec"),
            self.C_df.select(F.col("k").alias("id"), "vec"),
        )
