"""Streaming mergeable sketches: per-window HLL register state
maintained across micro-batches.

The HLL register table merges by per-register MAX — a commutative,
associative, **idempotent** fold, i.e. the sketch is a CRDT.  That
gives the streaming form for free and makes it unusually robust:

- **Per micro-batch** (`merge_hll_batch`): reduce the batch to its
  (window, register, max_rho) partials — at most windows×m rows no
  matter the batch size — and append them under the batch's own
  ``_batch_id`` partition (`sinks.write_idempotent_batch`).
- **Replay safety twice over**: a replayed batch overwrites its own
  partition with identical rows (decisions are a pure function of the
  batch), AND even a hypothetical duplicate append could not corrupt
  the estimate, because max-merge is idempotent.
- **Read side** (`hll_estimate_from_state`): fold all appended partials
  with one groupBy-max, then the shared estimator
  (`functions.sketches.hll_estimate_from_registers`) — bit-identical
  to running the batch HLL over the union of all batches, which is why
  the streaming query shares the batch query's DuckDB oracle.

State size: Σ_batches (windows_touched × occupied_registers) rows of
three small integers — bounded by windows×m per batch, compactable by
rewriting the fold result (same shape as every external-state streaming
operator here, cf. streaming/dedup.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_tensors_spark.functions.sketches import (
    hll_estimate_from_registers,
    hll_registers,
)
from spark_tensors_spark.streaming.sinks import write_idempotent_batch


def merge_hll_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    value_col: str,
    group_cols: list[str],
    p: int = 10,
) -> None:
    """Append one micro-batch's register partials to the state table."""
    partials = hll_registers(batch, value_col, group_cols, p)
    write_idempotent_batch(partials, batch_id, state_dir)


def hll_estimate_from_state(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    p: int = 10,
) -> DataFrame:
    """Fold the accumulated partials and estimate — identical to the
    batch estimate over everything the stream has seen."""
    regs = (
        spark.read.parquet(state_dir)
        .groupBy(*group_cols, "hll_reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    return hll_estimate_from_registers(regs, group_cols, p)


def streaming_hourly_hll(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "user_id",
    ts_col: str = "ts",
    p: int = 10,
    available_now: bool = True,
) -> StreamingQuery:
    """Attach the per-hour distinct-count sketch to an event stream."""
    hourly = stream_df.withColumn(
        "hour_start", F.date_trunc("hour", F.col(ts_col))
    )
    writer = (
        hourly.writeStream.foreachBatch(
            lambda bdf, bid: merge_hll_batch(
                bdf, bid, state_dir, value_col, ["hour_start"], p
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------------------ count-min
# CMS partials merge by SUM — associative/commutative but NOT
# idempotent, so unlike the HLL the replay guarantee rests entirely on
# the batch-id partition overwrite (a replayed batch rewrites its own
# partition with identical rows; it can never double-count).


def merge_cms_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    value_col: str,
    depth: int | None = None,
    width: int | None = None,
) -> None:
    """Append one micro-batch's CMS cell counts (≤ depth×width rows
    regardless of batch size) under the batch's own partition."""
    from spark_tensors_spark.functions.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_sketch,
    )

    partials = cms_sketch(
        batch, value_col, depth or CMS_DEPTH, width or CMS_WIDTH
    )
    write_idempotent_batch(partials, batch_id, state_dir)


def cms_sketch_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the per-batch cell partials into the current sketch —
    identical to the batch sketch over everything the stream has seen."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("cms_d", "cms_col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def streaming_cms(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "user_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Attach the frequency sketch to an event stream."""
    writer = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, bid: merge_cms_batch(bdf, bid, state_dir, value_col)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_hll_state(
    spark: SparkSession,
    state_dir: str,
    group_col: str = "hour_start",
    keep_from=None,
) -> None:
    """State lifecycle: fold all appended partials into one compacted
    partition, optionally EVICTING windows older than ``keep_from``
    (the watermark-style horizon for an external-state operator).
    Estimates for the kept windows are unchanged — max-merge folding is
    exactly what the read side does anyway; this just materializes it
    and drops dead windows, bounding state at horizon×m registers.

    Run while the stream is stopped (between availableNow drains): the
    rewrite replaces every batch partition with one compacted
    ``_batch_id=0`` partition, and the next drain appends after it.
    """
    import shutil

    df = spark.read.parquet(state_dir)
    if keep_from is not None:
        df = df.filter(F.col(group_col) >= keep_from)
    folded = df.groupBy(group_col, "hll_reg").agg(
        F.max("max_rho").alias("max_rho")
    )
    tmp = state_dir.rstrip("/") + ".compact.tmp"
    old = state_dir.rstrip("/") + ".compact.old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    # Distributed write straight into the tmp dir — the fold never
    # rides through the driver.
    write_idempotent_batch(folded, 0, tmp)
    if not any(n.startswith("_batch_id=") for n in os.listdir(tmp)):
        # keep_from evicted every window: a partitioned write of zero
        # rows creates no partition files, so land an empty
        # schema-bearing file inside the batch-0 partition dir (the
        # read side then still infers the schema and returns zero
        # windows instead of failing).
        folded.write.mode("overwrite").parquet(
            os.path.join(tmp, "_batch_id=0")
        )
    # Swap via rename-into-place: move the live state aside, move the
    # compacted state in, delete the old state LAST.  A crash at any
    # point leaves a complete copy of the state on disk (live, .old,
    # or .tmp) — never the rmtree-then-move hole where everything is
    # gone and the checkpointed stream will not replay drained batches.
    shutil.move(state_dir, old)
    shutil.move(tmp, state_dir)
    shutil.rmtree(old)


# ------------------------------------------------------------ KMV
# KMV partials merge by DISTINCT + min-k — like the HLL's max-merge this
# is commutative, associative, and idempotent (a CRDT), so replays are
# harmless twice over: the batch-id partition overwrite AND the merge
# algebra itself.  The per-batch partial is the batch's own signature
# (≤ k rows per group regardless of batch size).


def merge_kmv_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    value_col: str,
    group_cols: list[str],
    k: int | None = None,
) -> None:
    """Append one micro-batch's KMV signature partials to the state."""
    from spark_tensors_spark.functions.sketches import KMV_K, kmv_signature

    partials = kmv_signature(
        batch, value_col, group_cols, k or KMV_K
    ).select(*group_cols, "kmv_h")
    write_idempotent_batch(partials, batch_id, state_dir)


def kmv_signature_from_state(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    k: int | None = None,
) -> DataFrame:
    """Fold the accumulated partials into the global signature —
    identical to the batch signature over everything the stream has
    seen (min-k of unions IS the union's min-k)."""
    from pyspark.sql.window import Window

    from spark_tensors_spark.functions.sketches import KMV_K

    kk = k or KMV_K
    raw = (
        spark.read.parquet(state_dir)
        .select(*group_cols, "kmv_h")
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("kmv_h")
    return (
        raw.withColumn("kmv_rank", F.row_number().over(w))
        .filter(F.col("kmv_rank") <= kk)
        .select(*group_cols, "kmv_rank", "kmv_h")
    )


def streaming_kmv(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    group_cols: list[str],
    k: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Attach the KMV distinct sketch to a stream."""
    writer = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, bid: merge_kmv_batch(
                bdf, bid, state_dir, value_col, group_cols, k
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
