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
    """Unit-L2 row normalization (`param.py:108-112` ``normalize``)."""
    v = _to_double(v)
    n = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return F.transform(v, lambda x: x / n)


def normless1_col(v: Column | str) -> Column:
    """Project rows with ‖x‖² > 1 onto the unit ball, leave others
    untouched (`param.py:115-121` ``normless1``)."""
    v = _to_double(v)
    sq = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return F.when(sq > 1.0, F.transform(v, lambda x: x / F.sqrt(sq))).otherwise(v)
