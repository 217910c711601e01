"""Mergeable fixed-bin histogram sketch (functions/sketches.py):
fold parity (whole == merge of parts, any split), clamping, and
quantile read-out semantics against a plain-Python oracle."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from spark_tensors_spark.functions.sketches import (
    histogram_sketch,
    merge_histogram_sketches,
    quantiles_from_histogram,
)

LO, WIDTH, BINS = 0.0, 8.0, 80


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "part", "v"]),
        "g long, part long, v double",
    )


def _hist(df):
    return {
        (r.g, r.hist_bin): r.cnt
        for r in df.collect()
    }


ROWS = [
    (1, 0, 0.0), (1, 0, 7.99), (1, 0, 8.0), (1, 1, 15.5),
    (1, 1, 700.0), (1, 1, -3.0),  # clamp high + low
    (2, 0, 3.3), (2, 1, 3.3), (2, 1, 640.0), (2, 0, 99.9),
]


def _py_bin(v):
    return min(BINS - 1, max(0, math.floor((v - LO) / WIDTH)))


def test_sketch_matches_python_oracle(spark):
    got = _hist(histogram_sketch(_df(spark, ROWS), "v", ["g"]))
    want: dict = {}
    for g, _p, v in ROWS:
        key = (g, _py_bin(v))
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_fold_parity_any_split(spark):
    df = _df(spark, ROWS)
    whole = _hist(histogram_sketch(df, "v", ["g"]))
    # per-part sketches merged == whole-table sketch, exactly
    parts = histogram_sketch(df, "v", ["g", "part"])
    merged = _hist(merge_histogram_sketches(parts, ["g"]))
    assert merged == whole


def test_quantile_readout(spark):
    df = _df(spark, ROWS)
    sk = histogram_sketch(df, "v", ["g"])
    out = {
        (r.g, r.p): (r.n_total, r.hist_bin, r.upper_edge)
        for r in quantiles_from_histogram(sk, ["g"], [50, 90, 99]).collect()
    }
    # python oracle: smallest bin with cum >= ceil(p*N/100)
    by_g: dict = {}
    for g, _p, v in ROWS:
        by_g.setdefault(g, []).append(_py_bin(v))
    for g, bins in by_g.items():
        n = len(bins)
        bins.sort()
        for p in (50, 90, 99):
            target = (n * p + 99) // 100
            b = bins[target - 1]
            assert out[(g, p)] == (n, b, LO + (b + 1) * WIDTH)


def test_quantile_from_merged_equals_from_whole(spark):
    df = _df(spark, ROWS)
    whole = histogram_sketch(df, "v", ["g"])
    merged = merge_histogram_sketches(
        histogram_sketch(df, "v", ["g", "part"]), ["g"]
    )
    a = sorted(
        map(tuple, quantiles_from_histogram(whole, ["g"], [50, 99]).collect())
    )
    b = sorted(
        map(tuple, quantiles_from_histogram(merged, ["g"], [50, 99]).collect())
    )
    assert a == b


def test_null_values_get_a_null_bin_not_bin_zero(spark):
    """Spark's greatest() skips NULLs, so an unguarded clamp would
    silently funnel NULL values into bin 0 (inflating its count and
    every quantile) — the sketch must keep them in a NULL bin."""
    rows = [(1, 0, 0.5), (1, 0, None), (1, 1, None), (1, 1, 700.0)]
    df = _df(spark, rows)
    h = _hist(histogram_sketch(df, "v", ["g"], LO, WIDTH, BINS))
    assert h[(1, 0)] == 1          # only the real 0.5 lands in bin 0
    assert h[(1, BINS - 1)] == 1   # clamp-high unaffected
    assert h[(1, None)] == 2       # NULLs preserved, not clamped
