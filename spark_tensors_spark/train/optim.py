"""Optimizers (SURVEY F13): sparse-row updates on driver-held matrices.

Reference: SGD/AdaGrad `param.py:84-105`; Adam lr 0.001 wd 1e-4
`TransE.scala:98`.  The trainer aggregates per-id mean gradients on the
cluster (A6 segment-sum) and applies them here — parameter state lives
on the driver (FB15k-scale matrices are MBs; the 100 TB path keeps
embeddings as a DataFrame and turns `step` into a join-merge write,
SURVEY §4.3).
"""

from __future__ import annotations

import numpy as np


class SGD:
    def __init__(self, lr: float = 0.1, weight_decay: float = 0.0):
        self.lr = lr
        self.wd = weight_decay

    def step(
        self,
        param: np.ndarray,
        ids: np.ndarray,
        grads: np.ndarray,
        name: str | None = None,
    ):
        if self.wd:
            grads = grads + self.wd * param[ids]
        param[ids] -= self.lr * grads


class AdaGrad:
    """`param.py:92-105` semantics: per-element accumulated g², update
    lr·g/√(Σg²) with 1e-8 floor.

    State is keyed by the caller-supplied ``name`` (stable across
    processes and parameter re-allocation); ``id(param)`` is only a
    fallback for anonymous use and can collide after GC reuse.
    """

    def __init__(self, lr: float = 0.1, eps: float = 1e-8):
        self.lr = lr
        self.eps = eps
        self._acc: dict[object, np.ndarray] = {}

    def step(
        self,
        param: np.ndarray,
        ids: np.ndarray,
        grads: np.ndarray,
        name: str | None = None,
    ):
        key = name if name is not None else id(param)
        if key not in self._acc:
            self._acc[key] = np.zeros_like(param)
        acc = self._acc[key]
        acc[ids] += grads * grads
        param[ids] -= self.lr * grads / (np.sqrt(acc[ids]) + self.eps)


class RMSprop:
    """RMSprop (SURVEY F13; the reference's Keras path exposes it beside
    Adagrad, `holek.py:30`).  Keras-default semantics: exponentially
    decayed mean of g² (rho 0.9), update lr·g/√(ms+eps) — like AdaGrad
    but with a leaky accumulator, so the effective lr does not decay to
    zero over long runs.  State keyed by ``name`` (see AdaGrad)."""

    def __init__(self, lr: float = 0.001, rho: float = 0.9,
                 eps: float = 1e-7):
        self.lr = lr
        self.rho = rho
        self.eps = eps
        self._ms: dict[object, np.ndarray] = {}

    def step(
        self,
        param: np.ndarray,
        ids: np.ndarray,
        grads: np.ndarray,
        name: str | None = None,
    ):
        key = name if name is not None else id(param)
        if key not in self._ms:
            self._ms[key] = np.zeros_like(param)
        ms = self._ms[key]
        ms[ids] = self.rho * ms[ids] + (1 - self.rho) * grads * grads
        param[ids] -= self.lr * grads / (np.sqrt(ms[ids]) + self.eps)


class Adam:
    """Adam with bias correction (TransE reference config: lr 0.001,
    weight decay 1e-4, `TransE.scala:98`).

    The timestep ``t`` is tracked per parameter key, not shared: one
    optimizer stepping E, R, W each epoch must bias-correct each
    parameter by ITS OWN update count (a shared counter advances 3× per
    epoch and over-corrects).  State is keyed by ``name`` when given —
    ``id(param)`` can be recycled by the allocator after GC.
    """

    def __init__(
        self,
        lr: float = 0.001,
        beta1: float = 0.9,
        beta2: float = 0.999,
        eps: float = 1e-8,
        weight_decay: float = 0.0001,
    ):
        self.lr, self.b1, self.b2, self.eps, self.wd = (
            lr, beta1, beta2, eps, weight_decay,
        )
        self._m: dict[object, np.ndarray] = {}
        self._v: dict[object, np.ndarray] = {}
        self._t: dict[object, int] = {}

    def step(
        self,
        param: np.ndarray,
        ids: np.ndarray,
        grads: np.ndarray,
        name: str | None = None,
    ):
        key = name if name is not None else id(param)
        if key not in self._m:
            self._m[key] = np.zeros_like(param)
            self._v[key] = np.zeros_like(param)
            self._t[key] = 0
        self._t[key] += 1
        t = self._t[key]
        if self.wd:
            grads = grads + self.wd * param[ids]
        m, v = self._m[key], self._v[key]
        m[ids] = self.b1 * m[ids] + (1 - self.b1) * grads
        v[ids] = self.b2 * v[ids] + (1 - self.b2) * grads * grads
        mh = m[ids] / (1 - self.b1**t)
        vh = v[ids] / (1 - self.b2**t)
        param[ids] -= self.lr * mh / (np.sqrt(vh) + self.eps)
