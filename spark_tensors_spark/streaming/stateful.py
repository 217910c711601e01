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
            # Spark's double→DECIMAL(18,6) cast rounds the SHORTEST
            # decimal repr (BigDecimal.valueOf), not the exact binary
            # expansion — Decimal(repr(v)) matches that; Decimal(v)
            # can flip values whose shortest repr lands exactly on a
            # 6-dp half boundary.
            total_micro += sum(
                int(
                    Decimal(repr(float(v))).quantize(micro, ROUND_HALF_UP)
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


LAST_N_SCHEMA = "user_id long, rk int, ts_us long, event_id long"


def last_n_events(
    events: DataFrame,
    n: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key N most recent events (rk=1 newest; ties broken by larger
    event_id first, matching a DESC/DESC window).

    Batch mode: one row_number window — the oracle-checkable form.

    Streaming mode: Spark 4's ``transformWithStateInPandas`` (the
    successor API to applyInPandasWithState) with a **ListState**
    recency buffer per key.  State is O(n) per key no matter the stream
    length — the state store keeps exactly the candidate set the answer
    needs, which is what makes "most recent N per entity" maintainable
    over an unbounded 100 TB/day stream.  Each microbatch emits the
    refreshed top-n for keys that saw input.
    """
    if not events.isStreaming:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), F.col(id_col).desc()
        )
        return (
            events.select(
                F.col(key_col).alias("user_id"),
                F.row_number().over(w).alias("rk"),
                F.unix_micros(F.col(ts_col)).alias("ts_us"),
                F.col(id_col).alias("event_id"),
            )
            .filter(F.col("rk") <= n)
            .select("user_id", F.col("rk").cast("int"), "ts_us", "event_id")
        )

    import importlib.util

    try:  # find_spec raises if the parent 'google' namespace is absent
        _has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        _has_protobuf = False

    def _merge_emit(cur, pdfs):
        """Shared per-key step: merge state + batch rows, keep top-n
        by (ts, id) desc — the exact batch-window order."""
        for pdf in pdfs:
            us = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
            cur.extend((int(t), int(e)) for t, e in zip(us, pdf[id_col]))
        cur.sort(reverse=True)
        return cur[:n]

    if _has_protobuf:
        # Spark 4's successor state API — ListState per key.  Its python
        # worker protocol needs protobuf, absent in this container, so
        # the applyInPandasWithState fallback below is the tested path;
        # this branch is the forward surface for real deployments.
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class LastN(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._buf = handle.getListState(
                    "recent", "ts_us long, event_id long"
                )

            def handleInputRows(self, key, rows, timerValues):
                cur = _merge_emit(
                    [(r.ts_us, r.event_id) for r in self._buf.get()], rows
                )
                self._buf.put(list(cur))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(cur),
                        "rk": list(range(1, len(cur) + 1)),
                        "ts_us": [t for t, _ in cur],
                        "event_id": [e for _, e in cur],
                    }
                )

            def close(self) -> None:
                pass

        return events.groupBy(key_col).transformWithStateInPandas(
            LastN(), LAST_N_SCHEMA, "Update", "NoTime"
        )

    # applyInPandasWithState fallback: the O(n)-per-key list rides in
    # two array columns of the state tuple
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_lastn(key, pdfs, state):
        if state.exists:
            ts_arr, id_arr = state.get
            cur = list(zip(ts_arr, id_arr))
        else:
            cur = []
        cur = _merge_emit(cur, pdfs)
        state.update(([t for t, _ in cur], [e for _, e in cur]))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(cur),
                "rk": list(range(1, len(cur) + 1)),
                "ts_us": [t for t, _ in cur],
                "event_id": [e for _, e in cur],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update_lastn,
        LAST_N_SCHEMA,
        "ts_us array<long>, event_id array<long>",
        "update",
        GroupStateTimeout.NoTimeout,
    )
