"""Row-level streaming sessionization — the labeling counterpart of
`streaming/windows.session_window_agg` (which aggregates) and the
streaming form of `operators/temporal.sessionize` (which labels a
batch).

Per user the state is two longs: (last event time in µs, current
session index).  Each micro-batch sorts its rows by (ts_us, event_id)
— the batch operator's exact ordering — and extends or opens sessions
under the same INCLUSIVE-gap rule (an event at exactly ``gap_seconds``
after the previous one stays in the session; strict ``>`` starts a new
one), so stream ≡ batch for event-time-ordered arrival at ANY batch
boundary (a session spanning micro-batches keeps its index; pinned in
tests/test_streaming.py).

Ordering contract: labels are correct when arrival order respects
per-user event-time order ACROSS batches (ordered replay /
availableNow over time-partitioned files); rows arriving out of order
within one batch are repaired by the sort, across batches they are
not (the state cannot renumber already-emitted labels) — late data
needs the session_window aggregation path with watermarks instead.

Scale shape: state per user is 16 bytes; each batch shuffles once on
user_id into the stateful operator; output is one row per input row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "user_id long, event_id long, ts_us long, session_idx long"
STATE_SCHEMA = "last_ts_us long, session_idx long"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 300,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(user_id, event_id, ts_us, session_idx) with 1-based per-user
    session indices under the idle-gap rule.  On a batch frame this
    delegates to `operators/temporal.sessionize` (same projection), so
    both paths share one semantics definition and one oracle."""
    if not events.isStreaming:
        from spark_tensors_spark.operators.temporal import sessionize

        lab = sessionize(
            events, [key_col], ts_col=ts_col,
            gap_seconds=gap_seconds, order_tiebreak=id_col,
        )
        return lab.select(
            F.col(key_col).alias("user_id"),
            F.col(id_col).alias("event_id"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            "session_idx",
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def label(key, pdfs, state):
        if state.exists:
            last_us, idx = state.get
        else:
            last_us, idx = -1, 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((last_us, idx))
            return
        rows = (
            pd.concat(frames)
            .sort_values(["ts_us", "event_id"], kind="mergesort")
        )
        out_idx = []
        for ts_us in rows["ts_us"].astype("int64"):
            if last_us < 0 or ts_us - last_us > gap_us:
                idx += 1
            out_idx.append(idx)
            last_us = int(ts_us)
        state.update((last_us, idx))
        yield pd.DataFrame(
            {
                "user_id": rows["user_id"].astype("int64"),
                "event_id": rows["event_id"].astype("int64"),
                "ts_us": rows["ts_us"].astype("int64"),
                "session_idx": pd.Series(out_idx, index=rows.index,
                                         dtype="int64"),
            }
        )

    src = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        label,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
