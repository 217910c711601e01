"""CP-ALS / MTTKRP: oracle parity, numpy equivalence, convergence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.queries import tensor_queries as tq
from spark_tensors_spark.train.parafac import CPALS, mttkrp, _factor_df
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection

SF = SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


def test_mttkrp_matches_oracle(spark, duck):
    ok, detail = compare(
        tq.QUERIES["tns_mttkrp"], tq.ORACLES["tns_mttkrp"], spark, SF,
        con=duck,
    )
    assert ok, detail


def test_mttkrp_matches_numpy(spark):
    """Distributed MTTKRP ≡ dense numpy einsum on a small random COO."""
    rng = np.random.default_rng(7)
    ni, nj, nk, rank, nnz = 6, 5, 4, 3, 40
    i = rng.integers(0, ni, nnz)
    j = rng.integers(0, nj, nnz)
    k = rng.integers(0, nk, nnz)
    v = rng.normal(size=nnz)
    B = rng.normal(size=(nj, rank))
    C = rng.normal(size=(nk, rank))

    dense = np.zeros((ni, nj, nk))
    for a, b, c, x in zip(i, j, k, v):
        dense[a, b, c] += x
    want = np.einsum("ijk,jr,kr->ir", dense, B, C)

    coo = spark.createDataFrame(
        [(int(a), int(b), int(c), float(x)) for a, b, c, x in zip(i, j, k, v)],
        "i long, j long, k long, v double",
    )
    out = mttkrp(
        coo, _factor_df(spark, B, "j"), _factor_df(spark, C, "k")
    ).collect()
    got = np.zeros((ni, rank))
    for r in out:
        got[r["i"], r["pos"]] = r["m"]
    assert np.allclose(got, want, atol=1e-9)


def test_cp_als_reconstructs_rank1(spark):
    """A rank-1 tensor is recovered (fit → ~1) in a few sweeps."""
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([0.5, 1.5])
    c = np.array([2.0, 1.0])
    rows = [
        (i, j, k, float(a[i] * b[j] * c[k]))
        for i in range(3)
        for j in range(2)
        for k in range(2)
    ]
    coo = spark.createDataFrame(rows, "i long, j long, k long, v double")
    model = CPALS(spark, 3, 2, 2, rank=2, seed=1).fit(coo, sweeps=4)
    assert model.fit_history[-1] > 0.999
    assert max(model.fit_history) > 0.999


def test_cp_als_fit_query_descends(spark):
    """The declared tns_cp_als_fit (exact since r13) states the ALS
    convergence INVARIANT under the value oracle: the stage-1 residual
    (after the exact normal-equation mode-A solve) can never exceed
    the stage-0 residual (the objective at the A₀ init) — least-squares
    optimality, engine-independent."""
    rows = {
        r.stage: r for r in tq.QUERIES["tns_cp_als_fit"](spark, SF).collect()
    }
    assert set(rows) == {0, 1}
    assert rows[1].residual2 <= rows[0].residual2
    assert rows[1].residual2 >= 0.0
    assert rows[0].nnz == rows[1].nnz > 0


def test_cp_als_fit_magnitudes_within_int64(spark):
    """Overflow discipline for the exact trajectory (same doctrine as
    tns_cp_als_rank3_exact): every BIGINT the query sums — tr_num,
    tr_den = det, and the stage-0 terms — must sit inside int64 with
    at least a DECADE of margin at the measured scale, so the sf1.0
    extrapolation (~10× each gram, ~10× the row count ⇒ ≤1000× on the
    worst product) stays sound.  Checked numerically, not just
    analytically."""
    rows = {
        r.stage: r for r in tq.QUERIES["tns_cp_als_fit"](spark, SF).collect()
    }
    bound = 2**63 - 1
    for r in rows.values():
        assert abs(r.tr_num) < bound // 1000, r
        assert 0 < r.tr_den < bound // 1000, r


def test_cp_als_float_fit_runs(spark):
    df = tq.cp_als_float_fit(spark, SF)
    rows = df.collect()
    assert len(rows) == 2
    assert all(-1.0 <= r["fit"] <= 1.0 for r in rows)


def test_cp_als_float_fit_golden(spark):
    """GOLDEN pin for the float ALS trajectory (kept when the declared
    slot moved to the exact objective in r13 — VERDICT r12 item 6):
    the whole pipeline is deterministic — hash-seeded init, xxhash64-
    ordered sample, exact normal-equation solves — so the 6-dp fits
    are pinned EXACTLY, not approximately."""
    got = [
        (r.sweep, r.fit)
        for r in tq.cp_als_float_fit(spark, SF).collect()
    ]
    assert got == [(1, 0.008597), (2, 0.011841)], got


def test_cp_als_golden_trajectory_synthetic(spark):
    """Machine-local golden trajectory on a fixed synthetic tensor:
    pins the full double-precision fit values (1e-9), catching any
    change to init, sweep order, or normal-equation assembly."""
    coo = spark.createDataFrame(
        [
            (i, j, k, float(1 + ((i * 7 + j * 3 + k * 5) % 4)))
            for i in range(6)
            for j in range(5)
            for k in range(3)
            if (i + j + k) % 2 == 0
        ],
        "i long, j long, k long, v double",
    )
    m = CPALS(spark, 6, 5, 3, rank=3, seed=7).fit(coo, sweeps=3)
    np.testing.assert_allclose(
        m.fit_history,
        [0.293762501, 0.37300286, 0.460423561],
        atol=2e-9,
    )


def _synthetic_coo(spark):
    return spark.createDataFrame(
        [
            (i, j, k, float(1 + ((i * 7 + j * 3 + k * 5) % 4)))
            for i in range(6)
            for j in range(5)
            for k in range(3)
            if (i + j + k) % 2 == 0
        ],
        "i long, j long, k long, v double",
    )


def test_joinmerge_cpals_matches_driver_path(spark):
    """The DataFrame-factor CP-ALS (SCALE cliff #3 closed) reproduces
    the driver path's fit trajectory AND final factors on the same
    tensor/seed: same counter-hash init, same MTTKRP, same ridge+pinv
    solve — only the physical location of the factors differs."""
    from spark_tensors_spark.train.parafac import JoinMergeCPALS

    coo = _synthetic_coo(spark)
    d = CPALS(spark, 6, 5, 3, rank=3, seed=7).fit(coo, sweeps=3)
    jm = JoinMergeCPALS(spark, 6, 5, 3, rank=3, seed=7).fit(coo, sweeps=3)
    np.testing.assert_allclose(
        jm.fit_history, d.fit_history, rtol=1e-9, atol=1e-12
    )
    a_df, _, _ = jm.factors()
    a_jm = {r.id: np.array(r.vec) for r in a_df.collect()}
    for i in range(6):
        np.testing.assert_allclose(a_jm[i], d.A[i], rtol=1e-9, atol=1e-12)


def test_joinmerge_cpals_never_collects_factors(spark, monkeypatch):
    """Scale guarantee: per sweep only 1-row aggregates (grams, fit
    inner product) reach the driver — factor tables never do."""
    from pyspark.sql.classic.dataframe import DataFrame as SparkDF

    from spark_tensors_spark.train.parafac import JoinMergeCPALS

    sizes = []
    orig = SparkDF.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(SparkDF, "collect", spy)
    JoinMergeCPALS(spark, 6, 5, 3, rank=2, seed=3).fit(
        _synthetic_coo(spark), sweeps=2
    )
    assert sizes and max(sizes) <= 1, sizes


def test_cpals_checkpoint_roundtrip(spark, tmp_path):
    rows = [(i % 3, i % 2, i % 2, float(i + 1)) for i in range(8)]
    coo = spark.createDataFrame(rows, "i long, j long, k long, v double")
    m = CPALS(spark, 3, 2, 2, rank=2, seed=4).fit(coo, sweeps=2)
    path = str(tmp_path / "cp_ckpt")
    m.save(path)
    back = CPALS.load(spark, path)
    np.testing.assert_allclose(back.A, m.A)
    np.testing.assert_allclose(back.B, m.B)
    np.testing.assert_allclose(back.C, m.C)
    assert back.fit_history == m.fit_history


def test_gram_upper_table_matches_trainer_gram(spark):
    """The DataFrame gram table (the declared tns_als_normal_eq path)
    and JoinMergeCPALS._gram agree entry-for-entry on the same factor
    frame."""
    import pandas as pd

    from spark_tensors_spark.train.parafac import (
        JoinMergeCPALS,
        gram_upper_table,
    )

    rng = np.random.default_rng(7)
    mat = rng.integers(-5, 6, size=(40, 3)).astype(float)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"i": range(40), "vec": [list(r) for r in mat]}
        )
    )
    got = {
        (r.a, r.b): r.g for r in gram_upper_table(df, 3).collect()
    }
    want = mat.T @ mat
    for a in range(3):
        for b in range(a, 3):
            assert got[(a, b)] == want[a, b]
    # and the trainer's collected gram sees the same matrix
    t = JoinMergeCPALS(spark, n_i=1, n_j=1, n_k=1, rank=3, seed=0)
    np.testing.assert_allclose(t._gram(df), want)


def test_als_rank3_solves_normal_equations_exactly(spark):
    """The rank-3 adjugate solve must satisfy the normal equations in
    EXACT integer arithmetic: for every mode row i, G·a_numᵀ = det·m
    (adj G is the true matrix inverse times det, so this holds with no
    float tolerance at all) — verified by rebuilding G from the same
    pseudo-factor formulas in numpy and multiplying back."""
    import numpy as np

    from spark_tensors_spark.queries.kg import _encoded

    df = tq.QUERIES["tns_cp_als_rank3_exact"](spark, SF).collect()
    _raw, ent, _rel, _enc = _encoded(spark, SF)
    n_ent = ent.count()
    ids23 = np.arange(0, n_ent, tq.RANK3_MOD)
    B = ((ids23[:, None] * 31 + np.arange(3)[None, :] * 17) % 5) - 2
    C = ((np.arange(3)[:, None] * 37 + np.arange(3)[None, :] * 23) % 7) - 3
    G = (B.T @ B) * (C.T @ C)
    det = int(round(np.linalg.det(G)))
    rows = {}
    for r in df:
        rows.setdefault(r["i"], [None, None, None, None, None, None])
        rows[r["i"]][r["r"]] = r["a_num"]
        rows[r["i"]][3 + r["r"]] = r["m"]
        assert r["det"] == det
        assert r["a_val"] == r["a_num"] / det
    assert len(rows) > 0
    for i, v in rows.items():
        a_num = np.array(v[:3], dtype=object)
        m = np.array(v[3:], dtype=object)
        lhs = G.astype(object) @ a_num
        assert np.array_equal(lhs, det * m), (i, lhs, det * m)
