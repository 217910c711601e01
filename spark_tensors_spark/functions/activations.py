"""Activation functions + gradients (SURVEY F10).

Reference: `actfun.py:6-73` defines (f, g_given_f) pairs — Linear,
Sigmoid, Tanh, ReLU, Softplus — where the gradient is expressed in
terms of the *output* f (the autodiff-free trick its trainers rely on);
`Functions.scala:21-31` has the MXNet sigmoid/relu; `base.py:571-580`
adds a clipped sigmoid.

Two surfaces, same math:
  - column expressions (JVM codegen) for scan-side scoring;
  - numpy pairs for inside Arrow-batch gradient kernels.
Both are property-tested against each other (tests/test_activations.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

_CLIP = 50.0  # exp overflow guard (base.py:571-580 clips at |x|<=50)


# ---------------------------------------------------------------- numpy

def linear_np(x):
    return x


def linear_grad_np(f):
    return np.ones_like(f)


def sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -_CLIP, _CLIP)))


def sigmoid_grad_np(f):
    return f * (1.0 - f)


def tanh_np(x):
    return np.tanh(x)


def tanh_grad_np(f):
    return 1.0 - f * f


def relu_np(x):
    return np.maximum(x, 0.0)


def relu_grad_np(f):
    return (f > 0).astype(np.float64)


def softplus_np(x):
    # log1p(exp(x)) with the standard max-trick for large x
    return np.where(x > _CLIP, x, np.log1p(np.exp(np.clip(x, -_CLIP, _CLIP))))


def softplus_grad_np(f):
    # g(f) = 1 − exp(−f)  (actfun.py:70-73 form, in terms of output)
    return 1.0 - np.exp(-f)


NUMPY_PAIRS = {
    "linear": (linear_np, linear_grad_np),
    "sigmoid": (sigmoid_np, sigmoid_grad_np),
    "tanh": (tanh_np, tanh_grad_np),
    "relu": (relu_np, relu_grad_np),
    "softplus": (softplus_np, softplus_grad_np),
}


# --------------------------------------------------------------- columns

def sigmoid_col(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_clip_col(x)))


def tanh_col(x: Column) -> Column:
    return F.tanh(x)


def relu_col(x: Column) -> Column:
    return F.greatest(F.lit(0.0), x)


def softplus_col(x: Column) -> Column:
    return F.when(x > _CLIP, x).otherwise(F.log1p(F.exp(_clip_col(x))))


def _clip_col(x: Column) -> Column:
    return F.greatest(F.lit(-_CLIP), F.least(F.lit(_CLIP), x))


COLUMN_FNS = {
    "linear": lambda c: c,
    "sigmoid": sigmoid_col,
    "tanh": tanh_col,
    "relu": relu_col,
    "softplus": softplus_col,
}
