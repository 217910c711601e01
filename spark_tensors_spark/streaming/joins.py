"""Stream-stream interval join (Structured Streaming's watermarked
two-sided join; batch mode delegates to the bucketed range join so the
DuckDB oracle and the stream path share one semantic definition).

State design: with both sides watermarked and the join condition
bounding ``r.ts ∈ (l.ts − δ, l.ts]``, Spark keeps only rows inside the
watermark horizon in the join state store — state is O(rate × (δ +
watermark)) per key partition, independent of stream length.  That is
what makes a 100 TB/day two-stream correlation runnable at all; the
unbounded-state form (no time bound) is rejected by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_tensors_spark.operators.temporal import bucketed_interval_join


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    lookback_seconds: int = 600,
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with equal keys and ``l.ts − δ < r.ts <= l.ts``.

    Streaming inputs: genuine stream-stream join (watermarks on both
    sides bound the state store; ``how='left'`` emits null-padded left
    rows once the watermark proves no match can arrive).  Batch inputs:
    the bucketed equi-join form — same output, shuffle 2|L|+|R| not
    |L|×|R|.
    """
    if not (left.isStreaming or right.isStreaming):
        return bucketed_interval_join(
            left, right, keys, ts_col, lookback_seconds, right_prefix,
            how=how,
        )

    l = left.withWatermark(ts_col, watermark).alias("l")
    r = (
        right.withWatermark(ts_col, watermark)
        .select(
            *[F.col(k).alias(f"{right_prefix}{k}") for k in keys],
            *[
                F.col(c).alias(f"{right_prefix}{c}")
                for c in right.columns
                if c not in keys
            ],
        )
        .alias("r")
    )
    key_cond = F.expr(
        " AND ".join(f"r.{right_prefix}{k} = l.{k}" for k in keys)
    )
    lt = F.col(f"l.{ts_col}")
    rt = F.col(f"r.{right_prefix}{ts_col}")
    time_cond = (rt > lt - F.expr(f"INTERVAL {lookback_seconds} SECONDS")) & (
        rt <= lt
    )
    return l.join(
        r, key_cond & time_cond, "inner" if how == "inner" else "leftOuter"
    )
