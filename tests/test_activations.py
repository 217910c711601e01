"""F10 activations: column exprs ≡ numpy; gradients-from-output ≡
numeric derivatives (the actfun.py g_given_f contract)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.functions import activations as A

X = np.array([-60.0, -5.0, -1.0, -1e-8, 0.0, 1e-8, 0.5, 3.0, 60.0])


@pytest.mark.parametrize("name", sorted(A.NUMPY_PAIRS))
def test_column_matches_numpy(spark, name):
    fn_np, _ = A.NUMPY_PAIRS[name]
    col_fn = A.COLUMN_FNS[name]
    df = spark.createDataFrame([(float(x),) for x in X], "x double")
    got = np.array(
        [r.y for r in df.select(col_fn(F.col("x")).alias("y"))
         .orderBy("x").collect()]
    )
    want = fn_np(np.sort(X))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name", ["sigmoid", "tanh", "softplus"])
def test_grad_given_output_matches_numeric(name):
    """g(f(x)) ≈ df/dx — the reference expresses gradients in terms of
    the forward output (`actfun.py` g_given_f)."""
    fn, grad = A.NUMPY_PAIRS[name]
    xs = np.linspace(-4, 4, 81)
    h = 1e-6
    numeric = (fn(xs + h) - fn(xs - h)) / (2 * h)
    np.testing.assert_allclose(grad(fn(xs)), numeric, atol=1e-5)


def test_relu_grad_subgradient():
    _, grad = A.NUMPY_PAIRS["relu"]
    f = A.relu_np(np.array([-2.0, 0.0, 3.0]))
    np.testing.assert_array_equal(grad(f), [0.0, 0.0, 1.0])


def test_overflow_guard():
    assert A.sigmoid_np(np.array([1e6]))[0] == pytest.approx(1.0)
    assert A.softplus_np(np.array([1e6]))[0] == 1e6
    assert np.isfinite(A.sigmoid_np(np.array([-1e6]))[0])
