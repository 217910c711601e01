"""Streaming JOIN-view maintenance — the delta-join rule
(`operators/incremental.delta_join_increment`) wired into
``foreachBatch`` the way streaming/mv.py wires the aggregate fold: an
equi-join view over two APPEND-ONLY inputs is kept current by writing,
per micro-batch, only the join rows that batch contributes,

    ΔJ = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

so the view is the UNION of per-batch increments — never a history ×
history re-join.  The history side of each term is key-filtered by the
OTHER side's delta join keys before the join (a broadcast semi-join —
delta key sets are batch-sized — which under partitioned/bucketed
storage becomes a pruned lookup; on flat files it still caps the rows
entering the join at history-rows-with-live-keys).

Exactly-once: join increments ARE replay-idempotent by construction —
every write is keyed by its batch id (`sinks.write_idempotent_batch`
partition overwrite), and the history stores A/B are read with
``_batch_id < current`` so a half-committed crashed attempt of the
SAME batch can never leak into its own A_old/B_old (which would
double-produce the ΔA ⋈ ΔB pairs as A_old ⋈ ΔB on replay).  The replay
test (tests/test_streaming_joinview.py) pins both properties.

Scale shape: per batch, three joins that are delta-sized on at least
one side; view/state writes are increment-sized.  The view never
rewrites (contrast the MV's snapshot rewrite, which is key-sized) —
reading it is a partition-parallel scan of all increments.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_tensors_spark.operators.incremental import delta_join_increment
from spark_tensors_spark.streaming.sinks import write_idempotent_batch


def _read_store(
    spark: SparkSession, path: str, below_batch: int, template: DataFrame
) -> DataFrame:
    """All rows committed by batches STRICTLY BEFORE ``below_batch``
    (partition-pruned on the `_batch_id` directory key); an empty
    frame with the template's schema if the store doesn't exist yet."""
    # a store whose batches were ALL empty holds only _SUCCESS (dynamic
    # overwrite writes no empty partition) — parquet schema inference
    # would fail on it, so treat it like a missing store
    if not os.path.isdir(path) or not any(
        d.startswith("_batch_id=") for d in os.listdir(path)
    ):
        return template.limit(0)
    return (
        spark.read.parquet(path)
        .filter(F.col("_batch_id") < below_batch)
        .drop("_batch_id")
    )


def read_join_view(spark: SparkSession, path: str) -> DataFrame:
    """The maintained join view: union of all committed increments.
    Raises FileNotFoundError while every processed batch has produced
    zero join rows (there is no schema to read yet)."""
    if not os.path.isdir(path) or not any(
        d.startswith("_batch_id=") for d in os.listdir(path)
    ):
        raise FileNotFoundError(
            f"join view at {path} has no committed increments yet"
        )
    return spark.read.parquet(path).drop("_batch_id")


def streaming_delta_join_view(
    updates: DataFrame,
    split_a: Callable[[DataFrame], DataFrame],
    split_b: Callable[[DataFrame], DataFrame],
    on: list[str],
    root: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start an availableNow stream maintaining the equi-join view
    ``A ⋈ B`` under ``root`` (``root/view`` = increments, ``root/a`` /
    ``root/b`` = the append-only input histories), where each
    micro-batch carries appends for BOTH sides and ``split_a`` /
    ``split_b`` project them out (e.g. by an event-type filter).
    Read it back with :func:`read_join_view`.
    """
    a_store = os.path.join(root, "a")
    b_store = os.path.join(root, "b")
    view = os.path.join(root, "view")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            da = split_a(batch_df)
            db = split_b(batch_df)
            a_old = _read_store(spark, a_store, batch_id, da)
            b_old = _read_store(spark, b_store, batch_id, db)
            # key-filter each history by the OTHER side's delta keys:
            # a_old only ever joins ΔB (and b_old only ΔA), so the
            # semi-join is result-preserving and delta-key-sized
            a_old = a_old.join(
                F.broadcast(db.select(*on).distinct()), on, "left_semi"
            )
            b_old = b_old.join(
                F.broadcast(da.select(*on).distinct()), on, "left_semi"
            )
            inc = delta_join_increment(a_old, b_old, da, db, on)
            # increment FIRST: its read side (_batch_id < current)
            # must never see this batch's own history append
            write_idempotent_batch(inc, batch_id, view)
            write_idempotent_batch(da, batch_id, a_store)
            write_idempotent_batch(db, batch_id, b_store)
        finally:
            batch_df.unpersist()

    return (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
