"""Incremental aggregate maintenance (operators/incremental.py):
batch-fold equals direct aggregation, regardless of how the data is
split into batches."""

from __future__ import annotations

import pandas as pd

from spark_tensors_spark.operators.incremental import (
    merge_agg_snapshot,
    partial_agg,
)

AGGS = {
    "n": ("count", "v"),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "v"]), "k long, v long"
    )


def _collect(df):
    return {
        r.k: (r.n, r.s, r.lo, r.hi)
        for r in df.collect()
    }


def test_fold_equals_direct(spark):
    all_rows = [(1, 5), (1, 7), (2, 3), (2, -1), (3, 10)]
    direct = _collect(partial_agg(_df(spark, all_rows), ["k"], AGGS))
    # three different splits, same result
    for cut1, cut2 in [(1, 3), (2, 4), (0, 5)]:
        snap = None
        for part in (all_rows[:cut1], all_rows[cut1:cut2],
                     all_rows[cut2:]):
            if not part:
                continue
            snap = merge_agg_snapshot(snap, _df(spark, part), ["k"], AGGS)
        assert _collect(snap) == direct, (cut1, cut2)
    assert direct == {
        1: (2, 12, 5, 7), 2: (2, 2, -1, 3), 3: (1, 10, 10, 10)
    }


def test_disjoint_and_overlapping_groups(spark):
    snap = merge_agg_snapshot(None, _df(spark, [(1, 1), (2, 2)]),
                              ["k"], AGGS)
    # batch with one shared group, one new group
    snap = merge_agg_snapshot(snap, _df(spark, [(2, 8), (9, 4)]),
                              ["k"], AGGS)
    assert _collect(snap) == {
        1: (1, 1, 1, 1),      # carried over untouched
        2: (2, 10, 2, 8),     # merged
        9: (1, 4, 4, 4),      # inserted
    }


def test_randomized_fold_parity(spark):
    import random

    rng = random.Random(3)
    for trial in range(5):
        rows = [(rng.randint(1, 6), rng.randint(-50, 50))
                for _ in range(rng.randint(5, 40))]
        direct = _collect(partial_agg(_df(spark, rows), ["k"], AGGS))
        # random batch sizes
        snap, i = None, 0
        while i < len(rows):
            j = i + rng.randint(1, 10)
            snap = merge_agg_snapshot(snap, _df(spark, rows[i:j]),
                                      ["k"], AGGS)
            i = j
        assert _collect(snap) == direct, trial


def test_delta_join_increment_fold_parity(spark):
    """Folding random append batches through the delta-join rule must
    reproduce the direct join exactly, including duplicate keys (bag
    semantics: multiplicities multiply)."""
    import random

    from spark_tensors_spark.operators.incremental import (
        delta_join_increment,
    )

    rng = random.Random(11)
    for trial in range(3):
        a_rows = [(rng.randint(1, 5), i) for i in range(rng.randint(5, 25))]
        b_rows = [(rng.randint(1, 5), 100 + i)
                  for i in range(rng.randint(5, 25))]
        a_df = spark.createDataFrame(a_rows, "k long, av long")
        b_df = spark.createDataFrame(b_rows, "k long, bv long")
        direct = sorted(
            (r.k, r.av, r.bv) for r in a_df.join(b_df, ["k"]).collect()
        )
        # fold in two random append steps per side
        ca = rng.randint(0, len(a_rows))
        cb = rng.randint(0, len(b_rows))
        a1 = spark.createDataFrame(a_rows[:ca] or [], "k long, av long")
        da = spark.createDataFrame(a_rows[ca:] or [], "k long, av long")
        b1 = spark.createDataFrame(b_rows[:cb] or [], "k long, bv long")
        db = spark.createDataFrame(b_rows[cb:] or [], "k long, bv long")
        view = a1.join(b1, ["k"]).unionByName(
            delta_join_increment(a1, b1, da, db, ["k"])
        )
        got = sorted((r.k, r.av, r.bv) for r in view.collect())
        assert got == direct, trial
