"""Structured Streaming operators over the `events` stream
(SURVEY §2.9 — the reference has NO streaming; this is north-star M5).

Every operator is expressed on a plain DataFrame, so the same function
runs in batch mode (oracle-checkable vs Q13-style SQL) and on a
``readStream`` DataFrame (incremental, watermarked, stateful) — Spark's
unified-batch/stream contract.

Watermarks bound state: a 1000-executor job aggregating 100 TB/day of
events holds only the open windows per key in the state store; late rows
beyond the watermark are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window count/sum per event_type.

    Batch mode ≡ Q13 hour bucketing; stream mode emits finalized windows
    past the watermark.
    """
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            # DECIMAL(18,6) accumulation: double sums reordered across
            # engines/runs can flip the 6th decimal at the rounding
            # boundary; the per-value decimal cast is deterministic
            # (identical input doubles) and decimal addition associates
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "c",
            "v",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows: each event lands in window/slide buckets."""
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "c",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str | None = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session closes after `gap` idle."""
    df = events
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            # DECIMAL(18,6) accumulation — see tumbling_window_agg
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            key_col,
            "c",
            "v",
        )
    )


def stateful_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-style dedup.

    Stream mode: ``dropDuplicatesWithinWatermark`` keeps key state only
    inside the watermark horizon (bounded state at any throughput).
    Batch mode: plain ``dropDuplicates`` (the whole input is the
    "window")."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))
