"""Property tests for the numeric kernels (SURVEY §5.2 item 3).

NumPy-level: fast, no Spark. The Spark UDF wrappers are exercised in
test_sampling_eval.py / the Q20 oracle query.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_tensors_spark.functions.init import _hash_uniform, init_matrix_np
from spark_tensors_spark.functions.kernels import (
    cconv_np,
    ccorr_naive_np,
    ccorr_np,
    complex_np,
    distmult_np,
    fourier_embed_np,
    hole_np,
    rescal_np,
    similarity_np,
    transe_np,
)

RNG = np.random.default_rng(42)


def _rand(b=8, d=16):
    return RNG.standard_normal((b, d))


def test_ccorr_equals_naive():
    a, b = _rand(), _rand()
    np.testing.assert_allclose(ccorr_np(a, b), ccorr_naive_np(a, b), atol=1e-9)


def test_cconv_commutes():
    a, b = _rand(), _rand()
    np.testing.assert_allclose(cconv_np(a, b), cconv_np(b, a), atol=1e-9)


def test_ccorr_is_cconv_of_involution():
    """ccorr(a,b) = cconv(ā, b) where ā[i] = a[-i mod d]."""
    a, b = _rand(), _rand()
    a_inv = np.roll(a[:, ::-1], 1, axis=1)
    np.testing.assert_allclose(ccorr_np(a, b), cconv_np(a_inv, b), atol=1e-9)


def test_transe_zero_translation_is_perfect():
    h = _rand()
    np.testing.assert_allclose(
        transe_np(h, np.zeros_like(h), h), np.zeros(len(h)), atol=1e-12
    )
    assert (transe_np(_rand(), _rand(), _rand()) <= 0).all()


def test_rescal_identity_reduces_to_dot():
    s, o = _rand(), _rand()
    d = s.shape[1]
    w = np.tile(np.eye(d).ravel(), (len(s), 1))
    np.testing.assert_allclose(
        rescal_np(s, w, o), (s * o).sum(axis=1), atol=1e-9
    )


def test_hole_equals_explicit_sum():
    r, s, o = _rand(), _rand(), _rand()
    np.testing.assert_allclose(
        hole_np(r, s, o), (r * ccorr_naive_np(s, o)).sum(axis=1), atol=1e-9
    )


@pytest.mark.parametrize(
    "mode",
    ["cosine", "dot", "polynomial", "sigmoid", "rbf", "euclidean", "l1",
     "exponential", "gesd", "aesd"],
)
def test_similarity_zoo_shapes_and_ranges(mode):
    a, b = _rand(), _rand()
    s = similarity_np(a, b, mode, gamma=0.5, c=1.0, d=2)
    assert s.shape == (len(a),)
    assert np.isfinite(s).all()
    same = similarity_np(a, a, mode, gamma=0.5, c=1.0, d=2)
    if mode == "cosine":
        np.testing.assert_allclose(same, 1.0, atol=1e-9)
    if mode in ("euclidean", "rbf", "exponential"):
        np.testing.assert_allclose(same, 1.0, atol=1e-9)
        assert (s <= 1.0 + 1e-12).all()
    if mode == "l1":
        np.testing.assert_allclose(same, 0.0, atol=1e-9)


def test_similarity_invalid_mode():
    with pytest.raises(ValueError):
        similarity_np(_rand(), _rand(), "nope")


def test_hash_uniform_deterministic_and_uniform():
    ids = np.arange(1000)
    u1 = _hash_uniform(7, ids, 8)
    u2 = _hash_uniform(7, ids, 8)
    np.testing.assert_array_equal(u1, u2)
    assert ((u1 >= 0) & (u1 < 1)).all()
    assert abs(u1.mean() - 0.5) < 0.01
    assert not np.array_equal(u1, _hash_uniform(8, ids, 8))


def test_init_kinds_bounds():
    ids = np.arange(500)
    d = 16
    unif = init_matrix_np(1, ids, d, "unif")
    assert (np.abs(unif) <= 1 / np.sqrt(d)).all()
    nunif = init_matrix_np(1, ids, d, "nunif")
    assert (np.abs(nunif) <= np.sqrt(6) / np.sqrt(2 * d)).all()
    randn = init_matrix_np(1, ids, d, "randn")
    assert abs(randn.mean()) < 0.05 and abs(randn.std() - 1) < 0.05
    # order-independence: subset rows equal full-matrix rows
    sub = init_matrix_np(1, ids[100:200], d, "unif")
    np.testing.assert_array_equal(sub, unif[100:200])


def test_distmult_is_diagonal_rescal():
    """DistMult == RESCAL with W = diag(r)."""
    r, s, o = _rand(), _rand(), _rand()
    d = r.shape[1]
    w = np.stack([np.diag(row).ravel() for row in r])
    np.testing.assert_allclose(
        distmult_np(r, s, o), rescal_np(s, w, o), atol=1e-9
    )
    # symmetric in s/o (the model's signature property)
    np.testing.assert_allclose(
        distmult_np(r, s, o), distmult_np(r, o, s), atol=1e-12
    )


def test_complex_real_embeddings_reduce_to_distmult():
    """Zero imaginary halves → ComplEx degenerates to DistMult."""
    r, s, o = _rand(), _rand(), _rand()
    z = np.zeros_like(r)
    cat = lambda x: np.concatenate([x, z], axis=-1)  # noqa: E731
    np.testing.assert_allclose(
        complex_np(cat(r), cat(s), cat(o)), distmult_np(r, s, o), atol=1e-9
    )


def test_complex_antisymmetric_part():
    """With a purely imaginary relation, swapping s/o flips the sign —
    the antisymmetry ComplEx adds over DistMult."""
    m = 8
    z = np.zeros((4, m))
    ri = np.concatenate([z, RNG.standard_normal((4, m))], axis=-1)
    s = RNG.standard_normal((4, 2 * m))
    o = RNG.standard_normal((4, 2 * m))
    np.testing.assert_allclose(
        complex_np(ri, s, o), -complex_np(ri, o, s), atol=1e-9
    )


def test_hole_complex_equivalence():
    """Hayashi & Shimbo (2017): HolE(r,s,o) = ComplEx(F(r)/d, F(s), F(o))
    where F(e) = concat(Re(fft(e)), Im(fft(e)))."""
    r, s, o = _rand(), _rand(), _rand()
    d = r.shape[1]
    np.testing.assert_allclose(
        hole_np(r, s, o),
        complex_np(fourier_embed_np(r) / d, fourier_embed_np(s),
                   fourier_embed_np(o)),
        atol=1e-9,
    )


# ------------------------------------------------------- hypothesis

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


def _vec(n):
    return arrays(
        np.float64, (2, n),
        elements=st.floats(-100, 100, allow_nan=False, width=32),
    )


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 64).flatmap(_vec), st.integers(2, 64).flatmap(_vec))
def test_hyp_ccorr_equals_naive(a, b):
    if a.shape[1] != b.shape[1]:
        b = np.resize(b, a.shape)
    np.testing.assert_allclose(
        ccorr_np(a, b), ccorr_naive_np(a, b), atol=1e-6
    )


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 64).flatmap(_vec))
def test_hyp_cconv_commutes_and_identity(ab):
    a, b = ab[0:1], ab[1:2]
    np.testing.assert_allclose(cconv_np(a, b), cconv_np(b, a), atol=1e-6)
    # δ-impulse is the cconv identity
    delta = np.zeros_like(a)
    delta[0, 0] = 1.0
    np.testing.assert_allclose(cconv_np(a, delta), a, atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 32).flatmap(_vec))
def test_hyp_hole_score_shift_structure(ab):
    """HolE with r = δ reduces to plain dot(s, o)."""
    s, o = ab[0:1], ab[1:2]
    delta = np.zeros_like(s)
    delta[0, 0] = 1.0
    np.testing.assert_allclose(
        hole_np(delta, s, o), (s * o).sum(axis=1), atol=1e-5
    )
