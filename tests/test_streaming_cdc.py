"""Streaming CDC apply (streaming/cdc.py): multi-batch upsert/delete
sequencing into the snapshot-versioned parquet table, and post-crash
batch replay idempotence (re-merging an already-applied batch is a
no-op by VALUE — latest-wins re-selects the same rows, deletes
re-delete absent keys)."""

from __future__ import annotations

import os

import pandas as pd

from spark_tensors_spark.operators.merge import (
    merge_into_parquet,
    read_merged,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["k", "val", "ver", "is_delete"]
        ),
        "k long, val string, ver long, is_delete boolean",
    )


def _state(spark, path):
    return {
        r.k: (r.val, r.ver)
        for r in read_merged(spark, path).collect()
    }


def test_multi_batch_cdc_sequencing(spark, tmp_path):
    """Three CDC batches applied in order: inserts, then updates +
    a delete, then a re-insert of the deleted key.  Cross-batch
    semantics are arrival-order (standard CDC apply)."""
    path = os.path.join(str(tmp_path), "t")
    b1 = _batch(spark, [(1, "a", 1, False), (2, "b", 1, False)])
    b2 = _batch(spark, [(1, "A", 2, False), (2, "x", 2, True),
                        (3, "c", 2, False)])
    b3 = _batch(spark, [(2, "B", 3, False)])
    for b in (b1, b2, b3):
        merge_into_parquet(
            spark, path, b, ["k"],
            order_col="ver", delete_col="is_delete",
        )
    assert _state(spark, path) == {
        1: ("A", 2), 2: ("B", 3), 3: ("c", 2)
    }


def test_replay_idempotent(spark, tmp_path):
    """Re-applying an already-applied batch (crash between merge
    commit and checkpoint advance → foreachBatch re-delivery) leaves
    the table state unchanged — the property streaming_merge relies
    on instead of batch-id bookkeeping."""
    path = os.path.join(str(tmp_path), "t")
    b1 = _batch(spark, [(1, "a", 1, False), (2, "b", 1, False)])
    b2 = _batch(spark, [(1, "A", 2, False), (2, "x", 2, True)])
    merge_into_parquet(spark, path, b1, ["k"],
                       order_col="ver", delete_col="is_delete")
    merge_into_parquet(spark, path, b2, ["k"],
                       order_col="ver", delete_col="is_delete")
    after = _state(spark, path)
    # replay batch 2
    v = merge_into_parquet(spark, path, b2, ["k"],
                           order_col="ver", delete_col="is_delete")
    assert _state(spark, path) == after == {1: ("A", 2)}
    # the replay committed a NEW complete snapshot version (the
    # crash-safety contract) with identical content
    assert v == 2


def test_streaming_merge_end_to_end(spark, tmp_path):
    """The actual readStream → foreachBatch → merge pipeline over a
    file source fed one directory at a time (rate-limited via
    maxFilesPerTrigger=1 so the upsert/delete sequencing crosses REAL
    micro-batch boundaries)."""
    from spark_tensors_spark.streaming.cdc import (
        streaming_merge_into_parquet,
    )

    src = os.path.join(str(tmp_path), "src")
    table = os.path.join(str(tmp_path), "table")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(src)
    # two source files; the file source orders by MODIFICATION TIME
    # (not name), so pin distinct mtimes explicitly — same-ms writes
    # would make batch order unspecified
    _batch(spark, [(1, "a", 1, False), (2, "b", 1, False)]) \
        .coalesce(1).write.parquet(os.path.join(src, "b1"))
    _batch(spark, [(1, "A", 2, False), (2, "x", 2, True),
                   (3, "c", 2, False)]) \
        .coalesce(1).write.parquet(os.path.join(src, "b2"))
    for i, part in enumerate(("b1", "b2")):
        for f in os.listdir(os.path.join(src, part)):
            os.utime(os.path.join(src, part, f),
                     (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(
            "k long, val string, ver long, is_delete boolean"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = streaming_merge_into_parquet(
        stream, table, ckpt, ["k"],
        order_col="ver", delete_col="is_delete",
    )
    q.awaitTermination()
    assert _state(spark, table) == {1: ("A", 2), 3: ("c", 2)}
    # restart on the same checkpoint with no new files: no-op
    q2 = streaming_merge_into_parquet(
        stream, table, ckpt, ["k"],
        order_col="ver", delete_col="is_delete",
    )
    q2.awaitTermination()
    assert _state(spark, table) == {1: ("A", 2), 3: ("c", 2)}
