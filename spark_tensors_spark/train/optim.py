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

    def step(self, param: np.ndarray, ids: np.ndarray, grads: np.ndarray):
        if self.wd:
            grads = grads + self.wd * param[ids]
        param[ids] -= self.lr * grads


class AdaGrad:
    """`param.py:92-105` semantics: per-element accumulated g², update
    lr·g/√(Σg²) with 1e-8 floor."""

    def __init__(self, lr: float = 0.1, eps: float = 1e-8):
        self.lr = lr
        self.eps = eps
        self._acc: dict[int, np.ndarray] = {}

    def step(self, param: np.ndarray, ids: np.ndarray, grads: np.ndarray):
        key = id(param)
        if key not in self._acc:
            self._acc[key] = np.zeros_like(param)
        acc = self._acc[key]
        acc[ids] += grads * grads
        param[ids] -= self.lr * grads / (np.sqrt(acc[ids]) + self.eps)


class Adam:
    """Adam with bias correction (TransE reference config: lr 0.001,
    weight decay 1e-4, `TransE.scala:98`)."""

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
        self._m: dict[int, np.ndarray] = {}
        self._v: dict[int, np.ndarray] = {}
        self._t = 0

    def step(self, param: np.ndarray, ids: np.ndarray, grads: np.ndarray):
        key = id(param)
        if key not in self._m:
            self._m[key] = np.zeros_like(param)
            self._v[key] = np.zeros_like(param)
        self._t += 1
        if self.wd:
            grads = grads + self.wd * param[ids]
        m, v = self._m[key], self._v[key]
        m[ids] = self.b1 * m[ids] + (1 - self.b1) * grads
        v[ids] = self.b2 * v[ids] + (1 - self.b2) * grads * grads
        mh = m[ids] / (1 - self.b1**self._t)
        vh = v[ids] / (1 - self.b2**self._t)
        param[ids] -= self.lr * mh / (np.sqrt(vh) + self.eps)
