"""Batch score + closed-form gradient kernels for the three KGE models
(SURVEY M3; math re-derived, not ported: TransE `TransE.scala:38-41`
margin formulation; RESCAL bilinear `holek.py:136-150`; HolE
`hole.py:19-85` kbc).

All functions are pure NumPy over index arrays + the two parameter
matrices, so they run identically inside Arrow batches on executors and
in unit tests (including numerical gradient checks).

Gradient conventions: each function returns
``(loss_vector, [(param_name, ids, grads)])`` where grads are the
*sum* contributions per occurrence; the trainer's segment-sum divides by
multiplicity (`util.py:53-60` mean-normalization semantics, A6).
"""

from __future__ import annotations

import numpy as np

from spark_tensors_spark.functions.kernels import cconv_np, ccorr_np


def transe_pairwise_g(
    S: np.ndarray,
    Rv: np.ndarray,
    O: np.ndarray,
    N: np.ndarray,
    margin: float = 1.0,
):
    """Gathered-array TransE pairwise kernel: inputs are the per-row
    embedding rows themselves (no index lookup), so the same math runs
    whether vectors arrived via broadcast-matrix indexing (driver path)
    or a distributed join-gather (join-merge path).

    Returns ``(loss, [(slot, grads)])`` with slots s/o/o_neg/p.
    """
    dp = S + Rv - O
    dn = S + Rv - N
    npos = np.sqrt((dp * dp).sum(-1)) + 1e-12
    nneg = np.sqrt((dn * dn).sum(-1)) + 1e-12
    loss = margin + npos - nneg
    viol = loss > 0
    loss = np.maximum(loss, 0.0)

    gp = dp / npos[:, None]  # ∂‖·‖/∂(h+r−t⁺)
    gn = dn / nneg[:, None]
    w = viol[:, None].astype(np.float64)
    grad_h = (gp - gn) * w
    return loss, [
        ("s", grad_h),
        ("o", -gp * w),
        ("o_neg", gn * w),
        ("p", grad_h),
    ]


def transe_pairwise(
    E: np.ndarray,
    R: np.ndarray,
    s: np.ndarray,
    p: np.ndarray,
    o: np.ndarray,
    o_neg: np.ndarray,
    margin: float = 1.0,
):
    """Pairwise margin loss on L2 distances:
    loss = max(0, margin + ‖h+r−t⁺‖ − ‖h+r−t⁻‖).

    Gradients flow only through margin violations (P4 filter,
    kbc `hole.py:56-58` shape).
    """
    loss, slots = transe_pairwise_g(E[s], R[p], E[o], E[o_neg], margin)
    g = dict(slots)
    return loss, [
        ("E", s, g["s"]),
        ("E", o, g["o"]),
        ("E", o_neg, g["o_neg"]),
        ("R", p, g["p"]),
    ]


def _logistic(y: np.ndarray, score: np.ndarray):
    """loss = log1p(exp(−y·score)); dloss/dscore = −y·σ(−y·score)."""
    x = -y * score
    loss = np.where(x > 30, x, np.log1p(np.exp(np.minimum(x, 30))))
    g = -y / (1.0 + np.exp(-x))
    return loss, g


def rescal_pointwise_g(
    S: np.ndarray, Wp: np.ndarray, O: np.ndarray, y: np.ndarray
):
    """Gathered-array pointwise RESCAL (Wp is the (b, d, d) slice
    stack)."""
    score = np.einsum("bd,bde,be->b", S, Wp, O)
    loss, g = _logistic(y, score)
    gs = g[:, None] * np.einsum("bde,be->bd", Wp, O)
    go = g[:, None] * np.einsum("bd,bde->be", S, Wp)
    gw = g[:, None, None] * S[:, :, None] * O[:, None, :]
    return loss, [("s", gs), ("o", go), ("p", gw)]


def rescal_pointwise(
    E: np.ndarray,
    W: np.ndarray,  # (n_rel, d, d)
    s: np.ndarray,
    p: np.ndarray,
    o: np.ndarray,
    y: np.ndarray,
):
    """Pointwise logistic RESCAL: score = sᵀ W_p o."""
    loss, slots = rescal_pointwise_g(E[s], W[p], E[o], y)
    g = dict(slots)
    return loss, [("E", s, g["s"]), ("E", o, g["o"]), ("W", p, g["p"])]


def hole_pointwise_g(
    S: np.ndarray, Rp: np.ndarray, O: np.ndarray, y: np.ndarray
):
    """Gathered-array pointwise HolE.

    ∂score/∂r = ccorr(s,o); ∂/∂s = ccorr(r,o); ∂/∂o = cconv(s,r)
    (derived from the index algebra of circular correlation).
    """
    sc = (Rp * ccorr_np(S, O)).sum(-1)
    loss, g = _logistic(y, sc)
    gr = g[:, None] * ccorr_np(S, O)
    gs = g[:, None] * ccorr_np(Rp, O)
    go = g[:, None] * cconv_np(S, Rp)
    return loss, [("s", gs), ("o", go), ("p", gr)]


def hole_pointwise(
    E: np.ndarray,
    R: np.ndarray,
    s: np.ndarray,
    p: np.ndarray,
    o: np.ndarray,
    y: np.ndarray,
):
    """Pointwise logistic HolE: score = r·ccorr(s,o)."""
    loss, slots = hole_pointwise_g(E[s], R[p], E[o], y)
    g = dict(slots)
    return loss, [("E", s, g["s"]), ("E", o, g["o"]), ("R", p, g["p"])]


def rescal_pairwise_g(
    S: np.ndarray,
    Wp: np.ndarray,  # (b, d, d)
    O: np.ndarray,
    On: np.ndarray,
    margin: float = 0.2,
):
    """Gathered-array pairwise margin-ranking RESCAL — the reference's
    actual RESCAL objective (`kge/hole.py:145-147`, margin 0.2 config at
    `:459`): loss = max(0, margin − score⁺ + score⁻), score = sᵀ W_p o.
    Gradients flow only through margin violations."""
    sc_p = np.einsum("bd,bde,be->b", S, Wp, O)
    sc_n = np.einsum("bd,bde,be->b", S, Wp, On)
    loss = margin - sc_p + sc_n
    viol = loss > 0
    loss = np.maximum(loss, 0.0)
    w = viol.astype(np.float64)
    w1 = w[:, None]
    gs = w1 * (
        np.einsum("bde,be->bd", Wp, On) - np.einsum("bde,be->bd", Wp, O)
    )
    go = -w1 * np.einsum("bd,bde->be", S, Wp)
    gon = w1 * np.einsum("bd,bde->be", S, Wp)
    gw = w[:, None, None] * S[:, :, None] * (On - O)[:, None, :]
    return loss, [("s", gs), ("o", go), ("o_neg", gon), ("p", gw)]


def rescal_pairwise(
    E: np.ndarray,
    W: np.ndarray,  # (n_rel, d, d)
    s: np.ndarray,
    p: np.ndarray,
    o: np.ndarray,
    o_neg: np.ndarray,
    margin: float = 0.2,
):
    loss, slots = rescal_pairwise_g(E[s], W[p], E[o], E[o_neg], margin)
    g = dict(slots)
    return loss, [
        ("E", s, g["s"]),
        ("E", o, g["o"]),
        ("E", o_neg, g["o_neg"]),
        ("W", p, g["p"]),
    ]


def hole_pairwise_g(
    S: np.ndarray,
    Rp: np.ndarray,
    O: np.ndarray,
    On: np.ndarray,
    margin: float = 0.2,
):
    """Gathered-array pairwise margin-ranking HolE (same objective
    family as the reference's margin config): loss = max(0, margin −
    sc⁺ + sc⁻), sc = r·ccorr(s,o); gradient index algebra as in
    :func:`hole_pointwise_g`."""
    sc_p = (Rp * ccorr_np(S, O)).sum(-1)
    sc_n = (Rp * ccorr_np(S, On)).sum(-1)
    loss = margin - sc_p + sc_n
    viol = loss > 0
    loss = np.maximum(loss, 0.0)
    w1 = viol.astype(np.float64)[:, None]
    gr = w1 * (ccorr_np(S, On) - ccorr_np(S, O))
    gs = w1 * (ccorr_np(Rp, On) - ccorr_np(Rp, O))
    go = -w1 * cconv_np(S, Rp)
    gon = w1 * cconv_np(S, Rp)
    return loss, [("s", gs), ("o", go), ("o_neg", gon), ("p", gr)]


def hole_pairwise(
    E: np.ndarray,
    R: np.ndarray,
    s: np.ndarray,
    p: np.ndarray,
    o: np.ndarray,
    o_neg: np.ndarray,
    margin: float = 0.2,
):
    loss, slots = hole_pairwise_g(E[s], R[p], E[o], E[o_neg], margin)
    g = dict(slots)
    return loss, [
        ("E", s, g["s"]),
        ("E", o, g["o"]),
        ("E", o_neg, g["o_neg"]),
        ("R", p, g["p"]),
    ]


def transe_score_all(E: np.ndarray, S: np.ndarray, R: np.ndarray):
    """(b, N) TransE scores of every entity as object — for
    ``kg.eval.rank_against_all_entities``."""
    return -np.sqrt(
        ((S[:, None, :] + R[:, None, :] - E[None, :, :]) ** 2).sum(-1)
    )


def score_all_fn(model: str):
    """The (E, S, R) → (b, N) all-entities scorer for ``model``, shared
    by every ranking path (`KGETrainer.evaluate`,
    `JoinMergeKGETrainer.evaluate`, `kg.eval.rank_against_all_entities*`)
    so the closure and table-streaming rankers score with IDENTICAL
    float ops (bit-parity across paths depends on it).

    RESCAL's R is the gathered (b, d, d) slice stack; HolE scores
    r·ccorr(s, e) per candidate via the production FFT kernel
    (`hole.py:19-20` semantics)."""
    if model == "transe":
        return transe_score_all
    if model == "rescal":

        def rescal_all(E_, S_, R_):
            return np.einsum("bd,bde,ne->bn", S_, R_, E_)

        return rescal_all
    if model == "hole":
        from spark_tensors_spark.functions.kernels import ccorr_np

        def hole_all(E_, S_, R_):
            return np.stack(
                [
                    (
                        R_[i]
                        * ccorr_np(np.tile(S_[i], (len(E_), 1)), E_)
                    ).sum(-1)
                    for i in range(len(S_))
                ]
            )

        return hole_all
    raise ValueError(f"unknown model: {model!r}")
