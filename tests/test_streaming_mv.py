"""Streaming materialized view (streaming/mv.py): multi-batch fold ≡
direct aggregate, and EXACTLY-ONCE under batch replay — an aggregate
fold is not replay-idempotent by value, so the batch-id-stamped
snapshot commit must skip re-delivered batches or sums double-count."""

from __future__ import annotations

import os

import pandas as pd

from spark_tensors_spark.streaming.mv import (
    _committed,
    read_view,
    streaming_agg_view,
)

AGGS = {"n": ("count", "v"), "s": ("sum", "v"), "hi": ("max", "v")}


def _write(spark, d, rows):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "v"]), "k long, v long"
    ).coalesce(1).write.parquet(d)


def _run(spark, src, view, ckpt):
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    q = streaming_agg_view(stream, view, ckpt, ["k"], AGGS)
    q.awaitTermination()


def _state(spark, view):
    return {r.k: (r.n, r.s, r.hi) for r in read_view(spark, view).collect()}


def test_multi_batch_fold_equals_direct(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, os.path.join(src, "b1"), [(1, 5), (2, 3)])
    _write(spark, os.path.join(src, "b2"), [(1, 7), (3, 1)])
    for i, part in enumerate(("b1", "b2")):
        for f in os.listdir(os.path.join(src, part)):
            os.utime(os.path.join(src, part, f),
                     (1_700_000_000 + i, 1_700_000_000 + i))
    view, ckpt = str(tmp_path / "view"), str(tmp_path / "ckpt")
    _run(spark, src, view, ckpt)
    assert _state(spark, view) == {
        1: (2, 12, 7), 2: (1, 3, 3), 3: (1, 1, 1)
    }
    # two committed versions (one per micro-batch), batch ids 0 and 1
    assert [b for _v, b in _committed(view)] == [0, 1]


def test_replay_does_not_double_count(spark, tmp_path):
    """Simulate crash-after-commit-before-checkpoint: re-deliver the
    last batch id directly to the sink function — the fold must skip."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, os.path.join(src, "b1"), [(1, 5), (2, 3)])
    view, ckpt = str(tmp_path / "view"), str(tmp_path / "ckpt")
    _run(spark, src, view, ckpt)
    before = _state(spark, view)
    # restart on the same checkpoint with no new data: no-op
    _run(spark, src, view, ckpt)
    assert _state(spark, view) == before == {1: (1, 5, 5), 2: (1, 3, 3)}
    # hand-replay batch id 0 (what a crashed checkpoint re-delivers)
    from spark_tensors_spark.operators.incremental import (
        merge_agg_snapshot,
    )

    batch = spark.createDataFrame(
        pd.DataFrame([(1, 5), (2, 3)], columns=["k", "v"]),
        "k long, v long",
    )
    # the guard lives in the sink's _apply; emulate by calling the
    # public surface again via a fresh stream over the SAME file with a
    # FRESH checkpoint (same data re-delivered as batch 0)
    _run(spark, src, view, str(tmp_path / "ckpt2"))
    assert _state(spark, view) == before, "replayed batch double-counted"
    # sanity: an unguarded fold WOULD have doubled
    doubled = merge_agg_snapshot(
        read_view(spark, view).select("k", "n", "s", "hi"),
        batch, ["k"], AGGS,
    )
    assert {r.k: r.s for r in doubled.collect()} == {1: 10, 2: 6}
