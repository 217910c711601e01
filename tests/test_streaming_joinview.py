"""Streaming delta-join view (streaming/joinview.py): multi-batch
increments union to exactly the direct join, restart/replay does not
duplicate pairs (batch-id partition overwrite + `_batch_id < current`
history reads), and a half-committed crashed attempt of the current
batch cannot leak into its own A_old."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from spark_tensors_spark.streaming.joinview import (
    read_join_view,
    streaming_delta_join_view,
)
from spark_tensors_spark.streaming.sinks import write_idempotent_batch

COLS = ["side", "k", "id"]


def _write(spark, d, rows, t0):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=COLS), "side string, k long, id long"
    ).coalesce(1).write.parquet(d)
    for f in os.listdir(d):
        os.utime(os.path.join(d, f), (t0, t0))


def _run(spark, src, root, ckpt):
    stream = (
        spark.readStream.schema("side string, k long, id long")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    q = streaming_delta_join_view(
        stream,
        split_a=lambda b: b.filter(F.col("side") == "a").select(
            "k", F.col("id").alias("a_id")
        ),
        split_b=lambda b: b.filter(F.col("side") == "b").select(
            "k", F.col("id").alias("b_id")
        ),
        on=["k"],
        root=root,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination()


def _pairs(spark, root):
    return sorted(
        (r.k, r.a_id, r.b_id)
        for r in read_join_view(spark, os.path.join(root, "view")).collect()
    )


# batch 1: a(k=1,id=10), b(k=2,id=20)   -> no pairs yet
# batch 2: b(k=1,id=21), a(k=2,id=11), a(k=1,id=12)
#   increments: A_old⋈ΔB = (1,10,21); ΔA⋈B_old = (2,11,20);
#               ΔA⋈ΔB = (1,12,21)
B1 = [("a", 1, 10), ("b", 2, 20)]
B2 = [("b", 1, 21), ("a", 2, 11), ("a", 1, 12)]
WANT = [(1, 10, 21), (1, 12, 21), (2, 11, 20)]


def test_multi_batch_equals_direct_join(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, os.path.join(src, "b1"), B1, 1_700_000_000)
    _write(spark, os.path.join(src, "b2"), B2, 1_700_000_001)
    root, ckpt = str(tmp_path / "jv"), str(tmp_path / "ckpt")
    _run(spark, src, root, ckpt)
    assert _pairs(spark, root) == WANT
    # batch 0 produced no pairs (dynamic overwrite writes no empty
    # partition); batch 1 committed all three increments
    parts = {
        d for d in os.listdir(os.path.join(root, "view"))
        if d.startswith("_batch_id=")
    }
    assert parts == {"_batch_id=1"}
    # both batches DID commit their history appends
    assert {
        d for d in os.listdir(os.path.join(root, "a"))
        if d.startswith("_batch_id=")
    } == {"_batch_id=0", "_batch_id=1"}


def test_restart_and_replay_do_not_duplicate(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, os.path.join(src, "b1"), B1, 1_700_000_000)
    _write(spark, os.path.join(src, "b2"), B2, 1_700_000_001)
    root, ckpt = str(tmp_path / "jv"), str(tmp_path / "ckpt")
    _run(spark, src, root, ckpt)
    # restart on the same checkpoint, no new data: no-op
    _run(spark, src, root, ckpt)
    assert _pairs(spark, root) == WANT
    # full re-delivery (fresh checkpoint, same files, same order):
    # every batch id overwrites its own partitions — still exact
    _run(spark, src, root, str(tmp_path / "ckpt2"))
    assert _pairs(spark, root) == WANT


def test_crashed_history_write_cannot_leak_into_own_batch(spark, tmp_path):
    """If a crashed attempt of batch 0 committed its history append
    BEFORE dying, the replay's A_old must NOT contain batch 0's own
    ΔA (that would double-produce its ΔA⋈ΔB pairs as A_old⋈ΔB)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    both = [("a", 5, 50), ("b", 5, 51)]
    _write(spark, os.path.join(src, "b1"), both, 1_700_000_000)
    root, ckpt = str(tmp_path / "jv"), str(tmp_path / "ckpt")
    # pre-seed the history stores as a crashed batch-0 attempt would
    da = spark.createDataFrame(
        pd.DataFrame([(5, 50)], columns=["k", "a_id"]), "k long, a_id long"
    )
    db = spark.createDataFrame(
        pd.DataFrame([(5, 51)], columns=["k", "b_id"]), "k long, b_id long"
    )
    write_idempotent_batch(da, 0, os.path.join(root, "a"))
    write_idempotent_batch(db, 0, os.path.join(root, "b"))
    _run(spark, src, root, ckpt)
    assert _pairs(spark, root) == [(5, 50, 51)]  # once, not twice


def test_random_batch_splits_equal_direct_join(spark, tmp_path):
    """Any partition of the input into ordered micro-batches yields the
    same view as the direct join (seeded random split)."""
    import random

    rng = random.Random(17)
    rows = []
    for i in range(120):
        side = rng.choice(["a", "b"])
        rows.append((side, rng.randrange(12), 1000 + i))
    cuts = sorted(rng.sample(range(1, 119), 3))
    batches = [
        rows[lo:hi]
        for lo, hi in zip([0] + cuts, cuts + [len(rows)])
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for bi, batch in enumerate(batches):
        _write(spark, os.path.join(src, f"b{bi}"), batch,
               1_700_000_000 + bi)
    root = str(tmp_path / "jv")
    _run(spark, src, root, str(tmp_path / "ckpt"))
    a = [(k, i) for s, k, i in rows if s == "a"]
    b = [(k, i) for s, k, i in rows if s == "b"]
    want = sorted(
        (k, ai, bi_) for k, ai in a for k2, bi_ in b if k == k2
    )
    assert _pairs(spark, root) == want


def test_one_sided_early_batches(spark, tmp_path):
    """A side that is EMPTY for the first batches leaves its history
    store with only _SUCCESS (no partitions); later batches must treat
    it as empty instead of failing parquet schema inference."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(spark, os.path.join(src, "b1"), [("a", 1, 10), ("a", 2, 11)],
           1_700_000_000)
    _write(spark, os.path.join(src, "b2"), [("b", 1, 20), ("b", 3, 21)],
           1_700_000_001)
    root = str(tmp_path / "jv")
    _run(spark, src, root, str(tmp_path / "ckpt"))
    assert _pairs(spark, root) == [(1, 10, 20)]
