"""Declared queries for the PARAFAC/CP layer (train/parafac.py).

``tns_mttkrp`` pins the distributed MTTKRP kernel against a DuckDB
oracle: the factor matrices are *deterministic rationals* computable in
pure SQL on both engines (``((id·a + r·b) mod m)/m``), so the join +
explode + hash-agg pipeline is value-checked end-to-end at rank 8.

``tns_cp_als_fit`` runs real CP-ALS sweeps (hash-seeded init) over the
KG COO tensor and returns the fit trajectory — iterative least squares
is not SQL-expressible, so it is a rows-only check; convergence
properties are pinned by tests/test_parafac.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_tensors_spark.queries.kg import TRIPLES_CTE, _encoded
from spark_tensors_spark.train.parafac import CPALS, mttkrp

RANK = 8


def _int_factor(df: DataFrame, id_col: str, a: int, b: int, m: int) -> DataFrame:
    """vec[r] = (id·a + r·b) mod m as double — INTEGER-valued so the
    MTTKRP sums are exact in IEEE double on both engines (< 2⁵³); the
    single final division keeps rounding deterministic (a fractional
    factor would make the 6-dp round depend on accumulation order)."""
    return df.select(
        F.col(id_col),
        F.expr(
            f"transform(sequence(0, {RANK - 1}), "
            f"r -> CAST(({id_col} * {a} + r * {b}) % {m} AS DOUBLE))"
        ).alias("vec"),
    )


def _coo(spark: SparkSession, sf_dir: str) -> DataFrame:
    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    return enc.select(
        F.col("s_id").alias("i"),
        F.col("o_id").alias("j"),
        F.col("p_id").alias("k"),
        F.lit(1.0).alias("v"),
    )


def tns_mttkrp(spark: SparkSession, sf_dir: str) -> DataFrame:
    _raw, ent, rel, _enc = _encoded(spark, sf_dir)
    coo = _coo(spark, sf_dir)
    fb = _int_factor(ent.select(F.col("id").alias("j")), "j", 31, 17, 97)
    fc = _int_factor(rel.select(F.col("id").alias("k")), "k", 37, 23, 89)
    out = mttkrp(coo, fb, fc, "i", "j", "k")
    return out.select(
        "i", "pos", F.round(F.col("m") / (97.0 * 89.0), 6).alias("m")
    ).orderBy("i", "pos")


def tns_mttkrp_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME MTTKRP forced through the non-broadcast join path that
    `JoinMergeCPALS` uses at factor sizes past the broadcast ceiling
    (AQE sizes the joins at runtime) — identical values under the
    identical oracle, different physical plan.  Safe to value-compare
    across plans because the factor components are INTEGER-valued:
    every partial sum is exact in IEEE double, so the shuffle-join's
    different accumulation order cannot change a single bit."""
    _raw, ent, rel, _enc = _encoded(spark, sf_dir)
    coo = _coo(spark, sf_dir)
    fb = _int_factor(ent.select(F.col("id").alias("j")), "j", 31, 17, 97)
    fc = _int_factor(rel.select(F.col("id").alias("k")), "k", 37, 23, 89)
    out = mttkrp(coo, fb, fc, "i", "j", "k", broadcast_factors=False)
    return out.select(
        "i", "pos", F.round(F.col("m") / (97.0 * 89.0), 6).alias("m")
    ).orderBy("i", "pos")


TNS_MTTKRP_SQL = (
    TRIPLES_CTE
    + f""",
coo AS (
    SELECT s_id AS i, o_id AS j, p_id AS k, 1.0 AS v FROM triples_encoded
),
ranks AS (SELECT unnest(range({RANK})) AS pos)
SELECT c.i,
       r.pos,
       ROUND(SUM(c.v * ((c.j * 31 + r.pos * 17) % 97)
                     * ((c.k * 37 + r.pos * 23) % 89)) / (97.0 * 89.0), 6) AS m
FROM coo c CROSS JOIN ranks r
GROUP BY c.i, r.pos
ORDER BY i, pos
"""
)


def tns_cp_als_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 ALS sweeps, rank 4, over the KG COO tensor → fit per sweep.

    Fixed 20k-nonzero budget (hash-ordered sample): the smoke checks the
    ALS machinery, not corpus-scaling throughput."""
    _raw, ent, rel, _enc = _encoded(spark, sf_dir)
    n_ent = ent.count()
    n_rel = rel.count()
    coo = (
        _coo(spark, sf_dir)
        .orderBy(F.xxhash64("i", "j", "k"))
        .limit(20000)
    )
    model = CPALS(
        spark, n_i=n_ent, n_j=n_ent, n_k=n_rel, rank=4, seed=42
    ).fit(coo, sweeps=2)
    pdf = pd.DataFrame(
        {
            "sweep": range(1, len(model.fit_history) + 1),
            "fit": [round(f, 6) for f in model.fit_history],
        }
    )
    return spark.createDataFrame(pdf, "sweep long, fit double")


def tns_als_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ALS half-sweep's NORMAL-EQUATION table for the mode-A
    update: the upper triangles of Gᴮ = BᵀB and Gᶜ = CᵀC (each via the
    single R(R+1)/2-column aggregate `JoinMergeCPALS._gram` uses —
    here `gram_upper_table`) and their Hadamard product G = Gᴮ∘Gᶜ, the
    LHS the solve inverts.  On the INTEGER pseudo-factors every sum is
    exact (< 2⁵³) and BIGINT-castable, so DuckDB recomputes the whole
    table symbolically (emb_gram_int8 doctrine); only the ridge+pinv
    solve stays golden (tns_cp_als_fit)."""
    from spark_tensors_spark.train.parafac import gram_upper_table

    _raw, ent, rel, _enc = _encoded(spark, sf_dir)
    fb = _int_factor(ent.select(F.col("id").alias("j")), "j", 31, 17, 97)
    fc = _int_factor(rel.select(F.col("id").alias("k")), "k", 37, 23, 89)
    gb = gram_upper_table(fb, RANK).select(
        "a", "b", F.col("g").cast("long").alias("g_b")
    )
    gc = gram_upper_table(fc, RANK).select(
        "a", "b", F.col("g").cast("long").alias("g_c")
    )
    return (
        gb.join(gc, ["a", "b"])
        .select(
            "a", "b", "g_b", "g_c",
            (F.col("g_b") * F.col("g_c")).alias("g"),
        )
        .orderBy("a", "b")
    )


TNS_ALS_NORMAL_EQ_SQL = (
    TRIPLES_CTE
    + f""",
ranks AS (SELECT unnest(range({RANK})) AS a),
rpairs AS (
    SELECT r1.a AS a, r2.a AS b FROM ranks r1 JOIN ranks r2 ON r2.a >= r1.a
),
gb AS (
    SELECT p.a, p.b,
           CAST(SUM(((e.id * 31 + p.a * 17) % 97)
                  * ((e.id * 31 + p.b * 17) % 97)) AS BIGINT) AS g_b
    FROM entity_dict e CROSS JOIN rpairs p GROUP BY p.a, p.b
),
gc AS (
    SELECT p.a, p.b,
           CAST(SUM(((r.id * 37 + p.a * 23) % 89)
                  * ((r.id * 37 + p.b * 23) % 89)) AS BIGINT) AS g_c
    FROM relation_dict r CROSS JOIN rpairs p GROUP BY p.a, p.b
)
SELECT gb.a, gb.b, gb.g_b, gc.g_c,
       CAST(gb.g_b * gc.g_c AS BIGINT) AS g
FROM gb JOIN gc ON gb.a = gc.a AND gb.b = gc.b
ORDER BY gb.a, gb.b
"""
)


QUERIES = {
    "tns_mttkrp": tns_mttkrp,
    "tns_mttkrp_shuffle": tns_mttkrp_shuffle,
    "tns_als_normal_eq": tns_als_normal_eq,
    "tns_cp_als_fit": tns_cp_als_fit,
}

ORACLES = {
    "tns_mttkrp": TNS_MTTKRP_SQL,
    "tns_mttkrp_shuffle": TNS_MTTKRP_SQL,
    "tns_als_normal_eq": TNS_ALS_NORMAL_EQ_SQL,
}
