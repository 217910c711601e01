"""Streaming SCD2 maintenance (streaming/scd2.py): multi-batch fold
equals the batch `history_table`, open versions absorb / close across
batch boundaries, untouched keys carry over, and replay does not
mutate the history."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from spark_tensors_spark.operators.scd2 import history_table
from spark_tensors_spark.streaming.scd2 import (
    read_history,
    streaming_scd2,
)

COLS = ["k", "event_id", "attr", "t"]


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=COLS),
        "k long, event_id long, attr string, t long",
    ).selectExpr("k", "event_id", "attr", "timestamp_micros(t) AS ts")


def _write(spark, d, rows, t0):
    _df(spark, rows).coalesce(1).write.parquet(d)
    for f in os.listdir(d):
        os.utime(os.path.join(d, f), (t0, t0))


def _run(spark, src, table, ckpt):
    stream = (
        spark.readStream.schema(
            "k long, event_id long, attr string, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    q = streaming_scd2(
        stream, table, ckpt, ["k"], ["attr"],
        ts_col="ts", tiebreak_col="event_id",
    )
    q.awaitTermination()


def _state(spark, table):
    return sorted(
        (r.k, r.attr, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in read_history(spark, table).collect()
    )


def _batch_oracle(spark, rows):
    return sorted(
        (r.k, r.attr, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in history_table(
            _df(spark, rows), ["k"], ["attr"],
            ts_col="ts", order_tiebreak="event_id",
        ).collect()
    )


# key 1: A,A (absorb across batches), then B (close + open new)
# key 2: only batch 1 (untouched carry-over in batch 2)
# key 3: appears only in batch 2
B1 = [(1, 10, "A", 1_000), (1, 11, "A", 2_000), (2, 12, "X", 1_500)]
B2 = [(1, 13, "A", 3_000), (1, 14, "B", 4_000), (3, 15, "Z", 3_500)]


def test_multi_batch_equals_batch_history(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, os.path.join(src, "b1"), B1, 1_700_000_000)
    _write(spark, os.path.join(src, "b2"), B2, 1_700_000_001)
    table, ckpt = str(tmp_path / "hist"), str(tmp_path / "ckpt")
    _run(spark, src, table, ckpt)
    got = _state(spark, table)
    assert got == _batch_oracle(spark, B1 + B2)
    # the absorb case explicitly: key 1's first version still opens at
    # t=1000 (batch 2's equal-attr rows did NOT restart it) and closes
    # at the B change t=4000
    assert (1, "A", 1_000, 4_000, False) in got
    assert (1, "B", 4_000, -1, True) in got
    # untouched key 2 carried over open
    assert (2, "X", 1_500, -1, True) in got


def test_restart_and_replay_do_not_mutate(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, os.path.join(src, "b1"), B1, 1_700_000_000)
    _write(spark, os.path.join(src, "b2"), B2, 1_700_000_001)
    table, ckpt = str(tmp_path / "hist"), str(tmp_path / "ckpt")
    _run(spark, src, table, ckpt)
    before = _state(spark, table)
    # restart on the same checkpoint, no new data: no-op
    _run(spark, src, table, ckpt)
    assert _state(spark, table) == before
    # full re-delivery (fresh checkpoint): batch-id guard skips both
    _run(spark, src, table, str(tmp_path / "ckpt2"))
    assert _state(spark, table) == before


def test_compress_is_idempotent_on_compressed_points(spark):
    """Re-compressing a history's own change points must be a no-op —
    the property the incremental merge relies on (stored rows ∪ batch
    rows re-compress without disturbing settled history)."""
    from spark_tensors_spark.streaming.scd2 import compress_change_points

    raw = _df(
        spark,
        [(1, 1, "A", 1_000), (1, 2, "A", 2_000), (1, 3, "B", 3_000),
         (2, 4, "X", 500), (2, 5, "Y", 900), (2, 6, "Y", 950)],
    ).select(
        "k", "attr",
        F.col("event_id").cast("long").alias("tb"),
        F.unix_micros("ts").alias("valid_from_us"),
    )
    once = compress_change_points(raw, ["k"], ["attr"])
    twice = compress_change_points(
        once.select("k", "attr", "tb", "valid_from_us"), ["k"], ["attr"]
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_quantile_bound_property(spark):
    """Histogram-sketch quantiles bound the exact quantile within one
    bin width (read-out returns the bin's UPPER edge)."""
    import numpy as np

    from spark_tensors_spark.functions.sketches import (
        histogram_sketch,
        quantiles_from_histogram,
    )

    rng = np.random.default_rng(3)
    vals = np.abs(rng.normal(100, 60, size=2_000))
    df = spark.createDataFrame(
        pd.DataFrame({"g": 0, "v": vals}), "g long, v double"
    )
    sk = histogram_sketch(df, "v", ["g"], lo=0.0, width=8.0, n_bins=80)
    out = {
        r.p: r.upper_edge
        for r in quantiles_from_histogram(
            sk, ["g"], [50, 90, 99], lo=0.0, width=8.0
        ).collect()
    }
    for p in (50, 90, 99):
        exact = float(np.quantile(vals, p / 100, method="inverted_cdf"))
        assert out[p] >= exact - 1e-9, (p, out[p], exact)
        assert out[p] - 8.0 <= exact + 1e-9, (p, out[p], exact)


def test_random_batch_splits_equal_batch_history(spark, tmp_path):
    """Any event-time-ordered partition of the change stream into
    micro-batches folds to the batch history (seeded random cuts)."""
    import random

    rng = random.Random(23)
    rows = sorted(
        (
            (rng.randrange(6), 100 + i,
             rng.choice(["A", "B", "C"]), 1_000 * (i + 1))
            for i in range(90)
        ),
        key=lambda r: r[3],
    )
    cuts = sorted(rng.sample(range(1, 89), 3))
    batches = [
        rows[lo:hi] for lo, hi in zip([0] + cuts, cuts + [len(rows)])
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for bi, batch in enumerate(batches):
        _write(spark, os.path.join(src, f"b{bi}"), batch,
               1_700_000_000 + bi)
    table = str(tmp_path / "hist")
    _run(spark, src, table, str(tmp_path / "ckpt"))
    assert _state(spark, table) == _batch_oracle(spark, rows)
