"""Pure column-expression vector math (JVM-side, whole-stage codegen).

These cover the kernels that don't need NumPy: dot / norms / cosine /
losses over ``array<float|double>`` columns via ``zip_with`` +
``aggregate`` higher-order functions.  No Python boundary — at 100 TB
these run inside Tungsten codegen next to the scan.

Reference semantics: dot `Functions.scala:42-46`; L2 score
`Functions.scala:33-40`; max-margin loss `Functions.scala:9-19`;
logistic loss kbc `hole.py:25-26`; unit-norm projection `param.py:108-121`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<double>")


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ (`Functions.scala:42-46`)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_col(a: Column | str) -> Column:
    return F.sqrt(dot_col(a, a))


def l2_distance_col(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x - y)
    return F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l1_distance_col(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / √(dot(a,a)·dot(b,b)) (`kge/hole.py:98-99` semantics)."""
    return dot_col(a, b) / F.sqrt(dot_col(a, a) * dot_col(b, b))


def transe_score_col(
    h: Column | str, r: Column | str, t: Column | str
) -> Column:
    """TransE score −‖h + r − t‖₂ (`TransE.scala:38-41`,
    `Functions.scala:33-40`) as a pure column expression."""
    hr = F.zip_with(_to_double(h), _to_double(r), lambda x, y: x + y)
    diff = F.zip_with(hr, _to_double(t), lambda x, y: x - y)
    return -F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def margin_loss_col(
    pos: Column | str, neg: Column | str, margin: float
) -> Column:
    """max(neg − pos + margin, 0) (`Functions.scala:9-19`)."""
    pos = F.col(pos) if isinstance(pos, str) else pos
    neg = F.col(neg) if isinstance(neg, str) else neg
    return F.greatest(F.lit(0.0), neg - pos + F.lit(float(margin)))


def logistic_loss_col(y: Column | str, score: Column | str) -> Column:
    """log(1 + exp(−y·score)) = logaddexp(0, −y·s) (kbc `hole.py:25-26`),
    guarded for large |x| (exp overflow → use −x + log1p(exp(x)))."""
    y = F.col(y) if isinstance(y, str) else y
    score = F.col(score) if isinstance(score, str) else score
    x = -y * score
    # stable: for x > 30, log1p(exp(x)) ≈ x; below, direct formula
    return F.when(x > 30.0, x).otherwise(F.log1p(F.exp(F.least(x, F.lit(30.0)))))


def normalize_col(v: Column | str) -> Column:
    """Unit-L2 row normalization (`param.py:108-112` ``normalize``).

    The norm binds through ``array_repeat`` + ``zip_with`` so it is
    evaluated ONCE per row — referencing it inside a per-element
    ``transform`` lambda re-runs the aggregate for every element
    (O(d²), the scalar_quantize_int8 r14 finding)."""
    v = _to_double(v)
    n = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return F.zip_with(
        v, F.array_repeat(n, F.size(v)), lambda x, nn: x / nn
    )


def normless1_col(v: Column | str) -> Column:
    """Project rows with ‖x‖² > 1 onto the unit ball, leave others
    untouched (`param.py:115-121` ``normless1``); the squared norm
    binds once via ``array_repeat`` (see :func:`normalize_col`)."""
    v = _to_double(v)
    sq = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    scaled = F.zip_with(
        v, F.array_repeat(F.sqrt(sq), F.size(v)), lambda x, nn: x / nn
    )
    return F.when(sq > 1.0, scaled).otherwise(v)


def hash_embedding_col(
    id_col: Column | str, dim: int, seed: int = 0,
    mod: int = 97, shift: int = 48,
) -> Column:
    """Deterministic integer pseudo-embedding of an id: component j is
    ``(id·31 + j·17 + seed) % mod − shift``.

    Pure BIGINT arithmetic → bit-identical on any engine (the same
    trick as the Q19 pseudo-score, `queries/kg.py`); used to put the
    trilinear scoring *plans* under the DuckDB oracle without relying
    on float transcendentals."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (c * 31 + j.cast("long") * 17 + F.lit(seed)) % mod - shift,
    )


def trilinear_score_col(
    er: Column | str, es: Column | str, eo: Column | str
) -> Column:
    """DistMult score Σ_j r_j·s_j·o_j over three array columns —
    zip_with + aggregate, whole-stage codegen (no Python).  Works for
    integer or double arrays (result type follows the inputs)."""
    er = F.col(er) if isinstance(er, str) else er
    es = F.col(es) if isinstance(es, str) else es
    eo = F.col(eo) if isinstance(eo, str) else eo
    rs = F.zip_with(er, es, lambda x, y: x * y)
    rso = F.zip_with(rs, eo, lambda x, y: x * y)
    return F.aggregate(rso, F.element_at(rso, 1) * 0, lambda a, x: a + x)


def complex_score_col(
    rr: Column, ri: Column,
    sr: Column, si: Column,
    or_: Column, oi: Column,
) -> Column:
    """ComplEx score Re⟨r, s, conj(o)⟩ over split real/imaginary array
    columns: Σ_j rr·sr·or + rr·si·oi + ri·sr·oi − ri·si·or.  Same
    codegen-only construction as :func:`trilinear_score_col`."""
    return (
        trilinear_score_col(rr, sr, or_)
        + trilinear_score_col(rr, si, oi)
        + trilinear_score_col(ri, sr, oi)
        - trilinear_score_col(ri, si, or_)
    )


def pad_sequences_col(
    seq: Column | str,
    maxlen: int,
    value=0,
    padding: str = "post",
    truncating: str = "post",
) -> Column:
    """Keras-parity ``pad_sequences`` over an array column — F17, the
    reference's batch padding (`kge/hole.py:277-285`:
    ``pad_sequences(data, maxlen, padding='post', truncating='post',
    value=0)``).  Pure column expression (slice / array_repeat /
    concat), so at 100 TB it runs inside whole-stage codegen next to
    the scan — no Python boundary, no shuffle.

    ``truncating='post'`` keeps the first ``maxlen`` items,
    ``'pre'`` keeps the last ``maxlen``; ``padding`` appends
    (``'post'``) or prepends (``'pre'``) ``value`` up to ``maxlen``.
    A NULL array stays NULL (keras raises instead; at scale a NULL row
    must not poison the batch).  The keras ``maxlen=None``
    (longest-in-batch) mode is a global agg, not a row expression —
    compute ``F.max(F.size(c))`` and pass it in.
    """
    if padding not in ("post", "pre") or truncating not in ("post", "pre"):
        raise ValueError("padding/truncating must be 'post' or 'pre'")
    if maxlen <= 0:
        raise ValueError("maxlen must be positive")
    c = F.col(seq) if isinstance(seq, str) else seq
    if truncating == "post":
        kept = F.slice(c, 1, maxlen)
    else:
        kept = F.when(
            F.size(c) > maxlen, F.slice(c, -maxlen, maxlen)
        ).otherwise(c)
    fill = F.array_repeat(
        F.lit(value), F.greatest(F.lit(0), F.lit(maxlen) - F.size(c))
    )
    return F.concat(kept, fill) if padding == "post" else F.concat(fill, kept)
