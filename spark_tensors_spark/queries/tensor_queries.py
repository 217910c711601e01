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


def cp_als_float_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 ALS sweeps, rank 4, over the KG COO tensor → fit per sweep.

    Fixed 20k-nonzero budget (hash-ordered sample): the smoke checks the
    ALS machinery, not corpus-scaling throughput.  NOT a declared query
    since r13 (iterative float least squares is not DuckDB-expressible;
    the declared slot now gates the EXACT objective trajectory below) —
    this trajectory stays golden-pinned in tests/test_parafac.py."""
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


# formula pseudo-factors for the exact objective trajectory (encoded
# ids; same doctrine as tns_cp_als_step_exact): A0 is the "init", B/C
# are the fixed factors of the mode-A solve
_FIT_A0 = "(({i} * 41 + {r} * 13) % 5)"
_FIT_B = "(({j} * 31 + {r} * 17) % 5)"
_FIT_C = "(({k} * 37 + {r} * 23) % 7)"


def tns_cp_als_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT CP-ALS objective trajectory — the convergence invariant of
    the ALS iteration under the full value oracle (r12 verdict item 6:
    this slot was the last rows-only gate row; the float fit that used
    to sit here is ``cp_als_float_fit``, still golden-pinned in
    tests/test_parafac.py).

    Two stages of the rank-2 mode-A update on the KG COO tensor with
    integer pseudo-factors (A₀, B, C — formulas of the encoded ids, so
    both engines recompute them symbolically):

      stage 0: the ALS objective at the initial A₀ —
               ‖X − ⟦A₀,B,C⟧‖² = nnz − 2⟨X,X̂₀⟩ + ‖X̂₀‖²,
               every term an exact BIGINT (⟨X,X̂₀⟩ one scan-side agg,
               ‖X̂₀‖² = Σ_{rr'} Ga₀∘Gb∘Gc from three gram aggregates);
      stage 1: the objective after the EXACT normal-equation solve
               A* = M·G⁻¹ (adjugate over det G, the same exact algebra
               tns_cp_als_step_exact gates row-wise) — at the optimum
               ‖X − ⟦A*,B,C⟧‖² = nnz − tr(A*ᵀM) = nnz − tr_num/det,
               with tr_num = Σ_i Σ_r M[i,r]·a_num[i,r] exact BIGINT.

    The compared columns are the exact integers (nnz, tr_num, tr_den)
    plus the IEEE residual nnz − tr_num/tr_den (int64→double casts and
    one division/subtraction, all correctly rounded ⇒ bit-identical
    cross-engine).  Least-squares optimality makes stage 1 ≤ stage 0 —
    the DESCENT of the iteration is what the driver now hash-verifies;
    magnitude bounds through sf1.0 are asserted in tests/test_parafac
    (tr_num ≲ 1e17, det ≲ 7e16, all inside int64 with a decade of
    margin).

    Plan shape at 100 TB: three scans of the COO table (⟨X,X̂₀⟩, M,
    and nothing else is data-sized), two |mode|-row gram aggregates,
    1-row G broadcast — no collect, no driver matrix."""
    _raw, ent, rel, _enc = _encoded(spark, sf_dir)
    coo = _coo(spark, sf_dir)

    a0 = [_FIT_A0.format(i="i", r=r) for r in range(2)]
    b = [_FIT_B.format(j="j", r=r) for r in range(2)]
    c = [_FIT_C.format(k="k", r=r) for r in range(2)]
    a0e = [_FIT_A0.format(i="id", r=r) for r in range(2)]
    be = [_FIT_B.format(j="id", r=r) for r in range(2)]
    ce = [_FIT_C.format(k="id", r=r) for r in range(2)]

    nnz_ip = coo.agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum(
            F.expr(
                f"CAST({a0[0]} * {b[0]} * {c[0]}"
                f" + {a0[1]} * {b[1]} * {c[1]} AS BIGINT)"
            )
        ).alias("ip0"),
    )

    def _gram(df: DataFrame, exprs: list, tag: str) -> DataFrame:
        return df.agg(
            *[
                F.sum(
                    F.expr(f"CAST({exprs[x]} * {exprs[y]} AS BIGINT)")
                ).alias(f"{tag}{x}{y}")
                for x, y in ((0, 0), (0, 1), (1, 1))
            ]
        )

    ga = _gram(ent.select("id"), a0e, "a")
    gb = _gram(ent.select("id"), be, "b")
    gc = _gram(rel.select("id"), ce, "c")
    g = (
        gb.crossJoin(gc)
        .select(
            (F.col("b00") * F.col("c00")).alias("g00"),
            (F.col("b01") * F.col("c01")).alias("g01"),
            (F.col("b11") * F.col("c11")).alias("g11"),
        )
        .withColumn(
            "det",
            F.col("g00") * F.col("g11") - F.col("g01") * F.col("g01"),
        )
    )
    # ‖X̂₀‖² = Σ_{rr'} (A₀ᵀA₀ ∘ BᵀB ∘ CᵀC)_{rr'}: diag once, off-diag ×2
    norm0 = ga.crossJoin(g).select(
        (
            F.col("a00") * F.col("g00")
            + F.lit(2) * F.col("a01") * F.col("g01")
            + F.col("a11") * F.col("g11")
        ).alias("norm0")
    )
    # M[i,r] then tr(A*ᵀM)·det = Σ_i m0·(m0·g11 − m1·g01)
    #                               + m1·(m1·g00 − m0·g01)
    m = coo.groupBy("i").agg(
        F.sum(F.expr(f"CAST({b[0]} * {c[0]} AS BIGINT)")).alias("m0"),
        F.sum(F.expr(f"CAST({b[1]} * {c[1]} AS BIGINT)")).alias("m1"),
    )
    tr1 = (
        m.crossJoin(F.broadcast(g))
        .select(
            (
                F.col("m0")
                * (F.col("m0") * F.col("g11") - F.col("m1") * F.col("g01"))
                + F.col("m1")
                * (F.col("m1") * F.col("g00") - F.col("m0") * F.col("g01"))
            ).alias("t")
        )
        .agg(F.sum("t").alias("tr1"))
    )
    stages = (
        nnz_ip.crossJoin(norm0)
        .crossJoin(tr1)
        .crossJoin(g.select("det"))
        .select(
            "nnz",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).cast("long").alias("stage"),
                        (
                            F.lit(2) * F.col("ip0") - F.col("norm0")
                        ).alias("tr_num"),
                        F.lit(1).cast("long").alias("tr_den"),
                    ),
                    F.struct(
                        F.lit(1).cast("long").alias("stage"),
                        F.col("tr1").alias("tr_num"),
                        F.col("det").alias("tr_den"),
                    ),
                )
            ).alias("s"),
        )
    )
    return stages.select(
        F.col("s.stage").alias("stage"),
        "nnz",
        F.col("s.tr_num").alias("tr_num"),
        F.col("s.tr_den").alias("tr_den"),
        (
            F.col("nnz").cast("double")
            - F.col("s.tr_num").cast("double")
            / F.col("s.tr_den").cast("double")
        ).alias("residual2"),
    ).orderBy("stage")


def _als_fit_sql() -> str:
    a0 = [_FIT_A0.format(i="s_id", r=r) for r in range(2)]
    b = [_FIT_B.format(j="o_id", r=r) for r in range(2)]
    c = [_FIT_C.format(k="p_id", r=r) for r in range(2)]
    a0e = [_FIT_A0.format(i="id", r=r) for r in range(2)]
    be = [_FIT_B.format(j="id", r=r) for r in range(2)]
    ce = [_FIT_C.format(k="id", r=r) for r in range(2)]
    return (
        TRIPLES_CTE
        + f""",
nnz_ip AS MATERIALIZED (
    SELECT CAST(COUNT(*) AS BIGINT) AS nnz,
           CAST(SUM({a0[0]} * {b[0]} * {c[0]}
                  + {a0[1]} * {b[1]} * {c[1]}) AS BIGINT) AS ip0
    FROM triples_encoded
),
ga AS (
    SELECT CAST(SUM({a0e[0]} * {a0e[0]}) AS BIGINT) AS a00,
           CAST(SUM({a0e[0]} * {a0e[1]}) AS BIGINT) AS a01,
           CAST(SUM({a0e[1]} * {a0e[1]}) AS BIGINT) AS a11
    FROM entity_dict
),
g AS MATERIALIZED (
    SELECT gb.b00 * gc.c00 AS g00,
           gb.b01 * gc.c01 AS g01,
           gb.b11 * gc.c11 AS g11,
           (gb.b00 * gc.c00) * (gb.b11 * gc.c11)
             - (gb.b01 * gc.c01) * (gb.b01 * gc.c01) AS det
    FROM (SELECT CAST(SUM({be[0]} * {be[0]}) AS BIGINT) AS b00,
                 CAST(SUM({be[0]} * {be[1]}) AS BIGINT) AS b01,
                 CAST(SUM({be[1]} * {be[1]}) AS BIGINT) AS b11
          FROM entity_dict) gb,
         (SELECT CAST(SUM({ce[0]} * {ce[0]}) AS BIGINT) AS c00,
                 CAST(SUM({ce[0]} * {ce[1]}) AS BIGINT) AS c01,
                 CAST(SUM({ce[1]} * {ce[1]}) AS BIGINT) AS c11
          FROM relation_dict) gc
),
norm0 AS (
    SELECT CAST(ga.a00 * g.g00 + 2 * ga.a01 * g.g01
              + ga.a11 * g.g11 AS BIGINT) AS norm0
    FROM ga, g
),
mw AS MATERIALIZED (
    SELECT s_id AS i,
           CAST(SUM({b[0]} * {c[0]}) AS BIGINT) AS m0,
           CAST(SUM({b[1]} * {c[1]}) AS BIGINT) AS m1
    FROM triples_encoded GROUP BY s_id
),
tr1 AS (
    SELECT CAST(SUM(m0 * (m0 * g.g11 - m1 * g.g01)
                  + m1 * (m1 * g.g00 - m0 * g.g01)) AS BIGINT) AS tr1
    FROM mw, g
),
stages AS (
    SELECT CAST(0 AS BIGINT) AS stage, nnz,
           CAST(2 * ip0 - norm0 AS BIGINT) AS tr_num,
           CAST(1 AS BIGINT) AS tr_den
    FROM nnz_ip, norm0
    UNION ALL
    SELECT CAST(1 AS BIGINT), nnz, tr1.tr1, g.det
    FROM nnz_ip, tr1, g
)
SELECT stage, nnz, tr_num, tr_den,
       CAST(nnz AS DOUBLE)
         - CAST(tr_num AS DOUBLE) / CAST(tr_den AS DOUBLE) AS residual2
FROM stages
ORDER BY stage
"""
    )


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


ALS_RANK = 2


def tns_cp_als_step_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE exact CP-ALS mode-A solve under the VALUE oracle — the full
    update A = MTTKRP(X,B,C) · G⁻¹, G = (BᵀB)∘(CᵀC), that
    `CPALS._update` / `JoinMergeCPALS._update` iterate (PARAFAC per the
    reference README claim, `README.md:4-8`), not just its MTTKRP/gram
    inputs (those are gated separately by tns_mttkrp /
    tns_als_normal_eq).  Rank 2 + integer pseudo-factors make the
    normal equations exactly solvable by the adjugate:
        A[i,·] = (M[i,·]·adj G) / det G
    — every numerator and det are exact BIGINT, and the single final
    division of two identical int64s (int64→double conversion and IEEE
    division are both correctly rounded and deterministic) is
    bit-identical across engines, so the SOLVE itself is hash-gated.
    The production path adds a tiny ridge before pinv
    (`CPALS._ridge`) for run-to-run robustness; on this provably
    nonsingular integer G the adjugate solve is the same linear map,
    and the ridge+pinv float path stays pinned by tns_cp_als_fit's
    golden trajectory + tests/test_parafac.py.

    Plan shape at 100 TB: one MTTKRP join+agg over the COO table (the
    only data-scale term), two R(R+1)/2-column gram aggregates, and a
    1-row broadcast of G onto the mode-sized result — no driver-held
    matrix, no collect."""
    from spark_tensors_spark.train.parafac import gram_upper_table, mttkrp_wide

    _raw, ent, rel, _enc = _encoded(spark, sf_dir)
    coo = _coo(spark, sf_dir)

    def _f(df, id_col, a, b, m):
        return df.select(
            F.col(id_col),
            F.expr(
                f"transform(sequence(0, {ALS_RANK - 1}), "
                f"r -> CAST(({id_col} * {a} + r * {b}) % {m} AS DOUBLE))"
            ).alias("vec"),
        )

    fb = _f(ent.select(F.col("id").alias("j")), "j", 31, 17, 5)
    fc = _f(rel.select(F.col("id").alias("k")), "k", 37, 23, 7)
    m = mttkrp_wide(coo, fb, fc, ALS_RANK, "i", "j", "k")
    gb = gram_upper_table(fb, ALS_RANK).select(
        "a", "b", F.col("g").cast("long").alias("g_b")
    )
    gc = gram_upper_table(fc, ALS_RANK).select(
        "a", "b", F.col("g").cast("long").alias("g_c")
    )
    def _cell(a: int, b: int):
        return F.max(
            F.when(
                (F.col("a") == a) & (F.col("b") == b),
                F.col("g_b") * F.col("g_c"),
            )
        )

    g_row = (
        gb.join(gc, ["a", "b"])
        .agg(
            _cell(0, 0).alias("g00"),
            _cell(0, 1).alias("g01"),
            _cell(1, 1).alias("g11"),
        )
        .select(
            "g00",
            "g01",
            "g11",
            (
                F.col("g00") * F.col("g11") - F.col("g01") * F.col("g01")
            ).alias("det"),
        )
    )
    m0 = F.element_at("m", 1).cast("long")
    m1 = F.element_at("m", 2).cast("long")
    rows = m.crossJoin(F.broadcast(g_row)).select(
        "i",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("r"),
                    m0.alias("m"),
                    (m0 * F.col("g11") - m1 * F.col("g01")).alias("a_num"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("r"),
                    m1.alias("m"),
                    (m1 * F.col("g00") - m0 * F.col("g01")).alias("a_num"),
                ),
            )
        ).alias("s"),
        "det",
    )
    return rows.select(
        "i",
        F.col("s.r").alias("r"),
        F.col("s.m").alias("m"),
        F.col("s.a_num").alias("a_num"),
        "det",
        (F.col("s.a_num").cast("double") / F.col("det").cast("double")).alias(
            "a_val"
        ),
    ).orderBy("i", "r")


def _als_step_sql() -> str:
    def b(r, rr="id"):
        return f"(({rr} * 31 + {r} * 17) % 5)"

    def c(r, rr="id"):
        return f"(({rr} * 37 + {r} * 23) % 7)"

    return (
        TRIPLES_CTE
        + f""",
coo AS (SELECT s_id AS i, o_id AS j, p_id AS k FROM triples_encoded),
ranks AS (SELECT unnest(range({ALS_RANK})) AS r),
mw AS MATERIALIZED (
    SELECT i,
           CAST(SUM({b(0, "j")} * {c(0, "k")}) AS BIGINT) AS m0,
           CAST(SUM({b(1, "j")} * {c(1, "k")}) AS BIGINT) AS m1
    FROM coo GROUP BY i
),
gb AS (
    SELECT CAST(SUM({b(0)} * {b(0)}) AS BIGINT) AS b00,
           CAST(SUM({b(0)} * {b(1)}) AS BIGINT) AS b01,
           CAST(SUM({b(1)} * {b(1)}) AS BIGINT) AS b11
    FROM entity_dict
),
gc AS (
    SELECT CAST(SUM({c(0)} * {c(0)}) AS BIGINT) AS c00,
           CAST(SUM({c(0)} * {c(1)}) AS BIGINT) AS c01,
           CAST(SUM({c(1)} * {c(1)}) AS BIGINT) AS c11
    FROM relation_dict
),
g AS (
    SELECT b00 * c00 AS g00, b01 * c01 AS g01, b11 * c11 AS g11,
           (b00 * c00) * (b11 * c11) - (b01 * c01) * (b01 * c01) AS det
    FROM gb, gc
)
SELECT mw.i,
       CAST(r.r AS BIGINT) AS r,
       CASE WHEN r.r = 0 THEN m0 ELSE m1 END AS m,
       CASE WHEN r.r = 0 THEN m0 * g11 - m1 * g01
            ELSE m1 * g00 - m0 * g01 END AS a_num,
       g.det AS det,
       CAST(CASE WHEN r.r = 0 THEN m0 * g11 - m1 * g01
                 ELSE m1 * g00 - m0 * g01 END AS DOUBLE)
           / CAST(g.det AS DOUBLE) AS a_val
FROM mw CROSS JOIN ranks r CROSS JOIN g
ORDER BY i, r
"""
    )


RANK3 = 3
RANK3_MOD = 23  # j-mode bounded to id%23==0: keeps det(G) (degree-3
# in the gram entries) inside BIGINT through sf1.0 — see docstring


def tns_cp_als_rank3_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CP-ALS mode-A solve at RANK 3 — removes the rank-2
    asterisk on tns_cp_als_step_exact: the 3×3 normal equations
    G = (BᵀB)∘(CᵀC) are solved by the cofactor adjugate,
        A[i,·] = (M[i,·]·adj G) / det G,
    where every adjugate entry (2×2 cofactor), det (cofactor
    expansion along row 0), and numerator is exact BIGINT, and the
    single final int64→double division is correctly rounded and
    bit-identical across engines — so the rank-3 SOLVE itself is
    hash-gated, same doctrine as the rank-2 query.

    Overflow discipline (why this fixture is bounded): det is
    degree-3 in the Hadamard-gram entries, so the j-mode is the
    id%{RANK3_MOD} entity subset and factor values are CENTERED
    ({{-2..2}} / {{-3..3}}): at sf0.1 det≈4.7e15, and the sf1.0
    extrapolation (~4.7e18) still fits int64 — checked numerically
    per scale before this query was declared.  G is provably
    nonsingular on this fixture at all three test scales.

    Plan shape: one MTTKRP join+agg over the sub-tensor (the only
    data-scale term), two 6-column gram aggregates, 1-row G broadcast
    onto the mode-sized result — no driver matrix, no collect."""
    from spark_tensors_spark.train.parafac import (
        gram_upper_table,
        mttkrp_wide,
    )

    _raw, ent, rel, enc = _encoded(spark, sf_dir)
    coo = enc.filter(F.col("o_id") % RANK3_MOD == 0).select(
        F.col("s_id").alias("i"),
        F.col("o_id").alias("j"),
        F.col("p_id").alias("k"),
        F.lit(1.0).alias("v"),
    )

    def _f(df, id_col, a, b, m, c):
        return df.select(
            F.col(id_col),
            F.expr(
                f"transform(sequence(0, {RANK3 - 1}), "
                f"r -> CAST(({id_col} * {a} + r * {b}) % {m} - {c}"
                f" AS DOUBLE))"
            ).alias("vec"),
        )

    fb = _f(
        ent.filter(F.col("id") % RANK3_MOD == 0)
        .select(F.col("id").alias("j")),
        "j", 31, 17, 5, 2,
    )
    fc = _f(rel.select(F.col("id").alias("k")), "k", 37, 23, 7, 3)
    m = mttkrp_wide(coo, fb, fc, RANK3, "i", "j", "k")
    gb = gram_upper_table(fb, RANK3).select(
        "a", "b", F.col("g").cast("long").alias("g_b")
    )
    gc = gram_upper_table(fc, RANK3).select(
        "a", "b", F.col("g").cast("long").alias("g_c")
    )

    def _cell(a: int, b: int):
        return F.max(
            F.when(
                (F.col("a") == a) & (F.col("b") == b),
                F.col("g_b") * F.col("g_c"),
            )
        )

    g = (
        gb.join(gc, ["a", "b"])
        .agg(
            _cell(0, 0).alias("g00"),
            _cell(0, 1).alias("g01"),
            _cell(0, 2).alias("g02"),
            _cell(1, 1).alias("g11"),
            _cell(1, 2).alias("g12"),
            _cell(2, 2).alias("g22"),
        )
        .select(
            (F.col("g11") * F.col("g22") - F.col("g12") * F.col("g12"))
            .alias("a00"),
            (F.col("g02") * F.col("g12") - F.col("g01") * F.col("g22"))
            .alias("a01"),
            (F.col("g01") * F.col("g12") - F.col("g02") * F.col("g11"))
            .alias("a02"),
            (F.col("g00") * F.col("g22") - F.col("g02") * F.col("g02"))
            .alias("a11"),
            (F.col("g01") * F.col("g02") - F.col("g00") * F.col("g12"))
            .alias("a12"),
            (F.col("g00") * F.col("g11") - F.col("g01") * F.col("g01"))
            .alias("a22"),
            "g00", "g01", "g02",
        )
        .select(
            "a00", "a01", "a02", "a11", "a12", "a22",
            (
                F.col("g00") * F.col("a00")
                + F.col("g01") * F.col("a01")
                + F.col("g02") * F.col("a02")
            ).alias("det"),
        )
    )
    m0 = F.element_at("m", 1).cast("long")
    m1 = F.element_at("m", 2).cast("long")
    m2 = F.element_at("m", 3).cast("long")
    rows = m.crossJoin(F.broadcast(g)).select(
        "i",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("r"),
                    m0.alias("m"),
                    (
                        m0 * F.col("a00")
                        + m1 * F.col("a01")
                        + m2 * F.col("a02")
                    ).alias("a_num"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("r"),
                    m1.alias("m"),
                    (
                        m0 * F.col("a01")
                        + m1 * F.col("a11")
                        + m2 * F.col("a12")
                    ).alias("a_num"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("r"),
                    m2.alias("m"),
                    (
                        m0 * F.col("a02")
                        + m1 * F.col("a12")
                        + m2 * F.col("a22")
                    ).alias("a_num"),
                ),
            )
        ).alias("s"),
        "det",
    )
    return rows.select(
        "i",
        F.col("s.r").alias("r"),
        F.col("s.m").alias("m"),
        F.col("s.a_num").alias("a_num"),
        "det",
        (
            F.col("s.a_num").cast("double") / F.col("det").cast("double")
        ).alias("a_val"),
    ).orderBy("i", "r")


def _als_rank3_sql() -> str:
    def b(r, rr="id"):
        return f"((({rr} * 31 + {r} * 17) % 5) - 2)"

    def c(r, rr="id"):
        return f"((({rr} * 37 + {r} * 23) % 7) - 3)"

    gcells = ", ".join(
        f"CAST(SUM({b(a)} * {b(bb)}) AS BIGINT) AS b{a}{bb}"
        for a, bb in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    )
    ccells = ", ".join(
        f"CAST(SUM({c(a)} * {c(bb)}) AS BIGINT) AS c{a}{bb}"
        for a, bb in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    )
    return (
        TRIPLES_CTE
        + f""",
coo AS (
    SELECT s_id AS i, o_id AS j, p_id AS k FROM triples_encoded
    WHERE o_id % {RANK3_MOD} = 0
),
ranks AS (SELECT unnest(range({RANK3})) AS r),
mw AS MATERIALIZED (
    SELECT i,
           CAST(SUM({b(0, "j")} * {c(0, "k")}) AS BIGINT) AS m0,
           CAST(SUM({b(1, "j")} * {c(1, "k")}) AS BIGINT) AS m1,
           CAST(SUM({b(2, "j")} * {c(2, "k")}) AS BIGINT) AS m2
    FROM coo GROUP BY i
),
gb AS (
    SELECT {gcells}
    FROM entity_dict WHERE id % {RANK3_MOD} = 0
),
gc AS (SELECT {ccells} FROM relation_dict),
gm AS (
    SELECT b00*c00 AS g00, b01*c01 AS g01, b02*c02 AS g02,
           b11*c11 AS g11, b12*c12 AS g12, b22*c22 AS g22
    FROM gb, gc
),
adj AS (
    SELECT g11*g22 - g12*g12 AS a00,
           g02*g12 - g01*g22 AS a01,
           g01*g12 - g02*g11 AS a02,
           g00*g22 - g02*g02 AS a11,
           g01*g02 - g00*g12 AS a12,
           g00*g11 - g01*g01 AS a22,
           g00*(g11*g22 - g12*g12)
               + g01*(g02*g12 - g01*g22)
               + g02*(g01*g12 - g02*g11) AS det
    FROM gm
)
SELECT mw.i,
       CAST(r.r AS BIGINT) AS r,
       CASE r.r WHEN 0 THEN m0 WHEN 1 THEN m1 ELSE m2 END AS m,
       CASE r.r WHEN 0 THEN m0*a00 + m1*a01 + m2*a02
                WHEN 1 THEN m0*a01 + m1*a11 + m2*a12
                ELSE m0*a02 + m1*a12 + m2*a22 END AS a_num,
       adj.det AS det,
       CAST(CASE r.r WHEN 0 THEN m0*a00 + m1*a01 + m2*a02
                     WHEN 1 THEN m0*a01 + m1*a11 + m2*a12
                     ELSE m0*a02 + m1*a12 + m2*a22 END AS DOUBLE)
           / CAST(adj.det AS DOUBLE) AS a_val
FROM mw CROSS JOIN ranks r CROSS JOIN adj
ORDER BY i, r
"""
    )


QUERIES = {
    "tns_mttkrp": tns_mttkrp,
    "tns_mttkrp_shuffle": tns_mttkrp_shuffle,
    "tns_als_normal_eq": tns_als_normal_eq,
    "tns_cp_als_step_exact": tns_cp_als_step_exact,
    "tns_cp_als_rank3_exact": tns_cp_als_rank3_exact,
    "tns_cp_als_fit": tns_cp_als_fit,
}

ORACLES = {
    "tns_mttkrp": TNS_MTTKRP_SQL,
    "tns_mttkrp_shuffle": TNS_MTTKRP_SQL,
    "tns_als_normal_eq": TNS_ALS_NORMAL_EQ_SQL,
    "tns_cp_als_step_exact": _als_step_sql(),
    "tns_cp_als_rank3_exact": _als_rank3_sql(),
    "tns_cp_als_fit": _als_fit_sql(),
}
