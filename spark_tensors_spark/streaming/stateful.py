"""Custom stateful streaming operator (north-star §2.9:
"applyInPandasWithState for custom stateful operators").

``running_user_totals`` keeps one tiny state record per user (event
count, value sum, last-seen µs) and emits the refreshed totals every
microbatch — the canonical shape for per-key online aggregates the
built-in windows can't express (e.g. lifetime counters, CUSUM monitors,
rate limiters).

State design for scale: the state store holds O(#distinct keys) fixed
-width rows, partitioned by the grouping key — at 1000 executors each
state partition serves its shuffle partition locally; no global state.
Batch mode degenerates to a plain groupBy aggregate (unified contract,
same output schema) which is what the DuckDB oracle checks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "user_id long, n long, total double, last_ts_us long"
# the running value-sum is held in exact integer MICRO-units (value
# quantized to 6 dp, half-up — DECIMAL(18,6) cast semantics): float
# state would accumulate order-dependent rounding and drift from the
# batch path's decimal aggregate
STATE_SCHEMA = "n long, total_micro long, last_ts_us long"


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Per-user running (count, value-sum, last event time in µs).

    The value sum is DECIMAL(18,6)-exact on both paths: batch uses a
    decimal aggregate; streaming quantizes each value to integer
    micro-units (identical half-up semantics via the decimal module)
    and adds in exact integer arithmetic, so stream ≡ batch bit-for-bit
    regardless of batch boundaries or arrival order.
    """
    if not events.isStreaming:
        return events.groupBy(F.col(key_col).alias("user_id")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(val_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
            F.max(F.unix_micros(F.col(ts_col))).alias("last_ts_us"),
        )

    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.streaming.state import GroupStateTimeout

    micro = Decimal("1e-6")

    def update_totals(key, pdfs, state):
        if state.exists:
            n, total_micro, last_us = state.get
        else:
            n, total_micro, last_us = 0, 0, 0
        for pdf in pdfs:
            n += len(pdf)
            # Decimal(float) is the float's EXACT expansion; quantize
            # half-up ≡ Spark/DuckDB CAST(value AS DECIMAL(18,6))
            total_micro += sum(
                int(
                    Decimal(float(v)).quantize(micro, ROUND_HALF_UP)
                    .scaleb(6)
                )
                for v in pdf[val_col]
            )
            ts_us = (
                pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            ).max()
            last_us = max(last_us, int(ts_us))
        state.update((n, total_micro, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                # exact decimal → nearest double, same as the batch
                # path's DECIMAL-sum cast
                "total": [float(Decimal(total_micro).scaleb(-6))],
                "last_ts_us": [last_us],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update_totals,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
