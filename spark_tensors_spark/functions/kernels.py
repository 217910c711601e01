"""Arrow pandas-UDF numeric kernels (SURVEY §2.7 F1–F9).

Each kernel exists twice:
  - ``*_np``   — a pure-NumPy batch function over 2-D arrays (unit- and
                 property-testable without Spark);
  - ``*_udf`` — a scalar Arrow ``pandas_udf`` wrapping it, operating on
                 ``array<float>`` columns in vectorized batches.

Reference math: circular convolution/correlation `util.py:8-50`
(O(d log d) FFT form — the O(d²) outer-product fallback in
`base.py:346-348` is the property-test oracle); TransE `TransE.scala:38-41`;
RESCAL bilinear `holek.py:127-150`; HolE `hole.py:19-20` (kbc);
similarity zoo `kge/hole.py:66-119`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------- numpy core


def _stack(s: pd.Series) -> np.ndarray:
    return np.stack(s.to_numpy()).astype(np.float64, copy=False)


def cconv_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Circular convolution, batched rows: ifft(fft(a)·fft(b)).real."""
    return np.fft.ifft(np.fft.fft(a, axis=-1) * np.fft.fft(b, axis=-1)).real


def ccorr_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Circular correlation: ifft(conj(fft(a))·fft(b)).real."""
    return np.fft.ifft(
        np.conj(np.fft.fft(a, axis=-1)) * np.fft.fft(b, axis=-1)
    ).real


def ccorr_naive_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """O(d²) reference: ccorr(a,b)[k] = Σ_i a[i]·b[(i+k) mod d].

    Property-test oracle for :func:`ccorr_np` (the reference keeps the
    same pair: FFT `util.py:30-50` vs outer-product `base.py:346-348`).
    """
    d = a.shape[-1]
    idx = (np.arange(d)[:, None] + np.arange(d)[None, :]) % d  # [i, k]
    return np.einsum("bi,bik->bk", a, b[:, idx])


def transe_np(h: np.ndarray, r: np.ndarray, t: np.ndarray, norm: int = 2):
    """−‖h + r − t‖ (`TransE.scala:38-41`; L2 default)."""
    diff = h + r - t
    if norm == 1:
        return -np.abs(diff).sum(axis=-1)
    return -np.sqrt((diff * diff).sum(axis=-1))


def rescal_np(s: np.ndarray, w_flat: np.ndarray, o: np.ndarray):
    """Bilinear sᵀ W o with W given row-flattened (d²,) per row
    (`holek.py:127-150` `base.py:338-354` semantics)."""
    b, d = s.shape
    w = w_flat.reshape(b, d, d)
    return np.einsum("bd,bde,be->b", s, w, o)


def hole_np(r: np.ndarray, s: np.ndarray, o: np.ndarray):
    """HolE score rᵀ·ccorr(s,o) (kbc `hole.py:19-20`, pre-sigmoid)."""
    return (r * ccorr_np(s, o)).sum(axis=-1)


def distmult_np(r: np.ndarray, s: np.ndarray, o: np.ndarray):
    """DistMult trilinear score Σ_j r_j·s_j·o_j (Yang et al. 2015).

    The symmetric-bilinear special case of RESCAL (W diagonal) — the
    natural completion of the reference's scoring family
    (`holek.py:127-150` bilinear, `hole.py:19-20` holographic)."""
    return (r * s * o).sum(axis=-1)


def complex_np(r: np.ndarray, s: np.ndarray, o: np.ndarray):
    """ComplEx score Re⟨r, s, conj(o)⟩ (Trouillon et al. 2016).

    Embeddings are stored as real arrays of even length 2m: the first m
    entries are the real parts, the last m the imaginary parts.
    Equivalence to HolE (Hayashi & Shimbo 2017):
    ``hole_np(r,s,o) == complex_np(F(r)/d, F(s), F(o))`` where ``F``
    maps e → concat(Re(fft(e)), Im(fft(e))) — property-pinned in
    tests/test_kernels.py."""
    m = r.shape[-1] // 2
    rr, ri = r[..., :m], r[..., m:]
    sr, si = s[..., :m], s[..., m:]
    or_, oi = o[..., :m], o[..., m:]
    # Re((rr+i·ri)(sr+i·si)(or−i·oi)) summed over components
    return (
        rr * sr * or_ + rr * si * oi + ri * sr * oi - ri * si * or_
    ).sum(axis=-1)


def fourier_embed_np(e: np.ndarray) -> np.ndarray:
    """The HolE→ComplEx embedding map: concat(Re(fft(e)), Im(fft(e)))."""
    fe = np.fft.fft(e, axis=-1)
    return np.concatenate([fe.real, fe.imag], axis=-1)


def similarity_np(
    a: np.ndarray,
    b: np.ndarray,
    mode: str,
    gamma: float = 1.0,
    c: float = 0.0,
    d: int = 2,
):
    """Similarity zoo (`kge/hole.py:66-119` docstring contract)."""
    dot = (a * b).sum(axis=-1)
    if mode == "cosine":
        return dot / np.sqrt((a * a).sum(-1) * (b * b).sum(-1))
    if mode == "dot":
        return dot
    l2 = np.sqrt(((a - b) ** 2).sum(-1))
    if mode == "polynomial":
        return (gamma * dot + c) ** d
    if mode == "sigmoid":
        return np.tanh(gamma * dot + c)
    if mode == "rbf":
        return np.exp(-gamma * l2**2)
    if mode == "euclidean":
        return 1.0 / (1.0 + l2)
    if mode == "l1":
        return -np.abs(a - b).sum(-1)
    if mode == "exponential":
        return np.exp(-gamma * l2)
    if mode == "gesd":
        return (1.0 / (1.0 + l2)) * (1.0 / (1.0 + np.exp(-gamma * (dot + c))))
    if mode == "aesd":
        return 0.5 / (1.0 + l2) + 0.5 / (1.0 + np.exp(-gamma * (dot + c)))
    raise ValueError(f"Invalid similarity: {mode}")


# ------------------------------------------------------------- pandas UDFs
# UDF objects are built lazily: pandas_udf() parses its DDL return type
# against the active SparkSession, which doesn't exist at import time.

from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=None)
def _udf(name: str):
    if name == "cconv":
        def f(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(list(cconv_np(_stack(a), _stack(b))))
        return pandas_udf(f, "array<double>")
    if name == "ccorr":
        def f(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(list(ccorr_np(_stack(a), _stack(b))))
        return pandas_udf(f, "array<double>")
    if name == "transe":
        def f(h: pd.Series, r: pd.Series, t: pd.Series) -> pd.Series:
            return pd.Series(transe_np(_stack(h), _stack(r), _stack(t)))
        return pandas_udf(f, "double")
    if name == "rescal":
        def f(s: pd.Series, w: pd.Series, o: pd.Series) -> pd.Series:
            return pd.Series(rescal_np(_stack(s), _stack(w), _stack(o)))
        return pandas_udf(f, "double")
    if name == "hole":
        def f(r: pd.Series, s: pd.Series, o: pd.Series) -> pd.Series:
            return pd.Series(hole_np(_stack(r), _stack(s), _stack(o)))
        return pandas_udf(f, "double")
    if name == "distmult":
        def f(r: pd.Series, s: pd.Series, o: pd.Series) -> pd.Series:
            return pd.Series(distmult_np(_stack(r), _stack(s), _stack(o)))
        return pandas_udf(f, "double")
    if name == "complex":
        def f(r: pd.Series, s: pd.Series, o: pd.Series) -> pd.Series:
            return pd.Series(complex_np(_stack(r), _stack(s), _stack(o)))
        return pandas_udf(f, "double")
    raise KeyError(name)


def cconv_udf(a, b):
    return _udf("cconv")(a, b)


def ccorr_udf(a, b):
    return _udf("ccorr")(a, b)


def transe_udf(h, r, t):
    return _udf("transe")(h, r, t)


def rescal_udf(s, w, o):
    return _udf("rescal")(s, w, o)


def hole_udf(r, s, o):
    return _udf("hole")(r, s, o)


def distmult_udf(r, s, o):
    return _udf("distmult")(r, s, o)


def complex_udf(r, s, o):
    return _udf("complex")(r, s, o)


def similarity_udf(mode: str, gamma: float = 1.0, c: float = 0.0, d: int = 2):
    """Factory: a scalar pandas UDF computing the chosen similarity.

    One family covers the whole zoo (`kge/hole.py:66-119`); parameters are
    captured in the closure so the hot path stays a two-column kernel.
    """

    def _sim(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(similarity_np(_stack(a), _stack(b), mode, gamma, c, d))

    return pandas_udf(_sim, "double")
