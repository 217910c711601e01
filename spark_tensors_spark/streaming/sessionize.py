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


CLOSED_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "first_ts_us long, last_ts_us long"
)
TTL_STATE_SCHEMA = (
    "session_idx long, n_events long, first_ts_us long, last_ts_us long"
)


def sessionize_stream_ttl(
    events: DataFrame,
    gap_seconds: int = 300,
    watermark_delay: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """FINALIZED session roll-ups — emitted exactly once, only when a
    session can never grow again: either an in-order successor event
    opened the next session for the key, or the event-time TIMER fired
    (watermark passed ``last_ts + gap``, `GroupStateTimeout
    .EventTimeTimeout` + ``state.setTimeoutTimestamp``).  The timer is
    what `sessionize_stream` lacks: without it an idle key's last
    session sits in the state store forever and is never emitted;
    with it state is dropped the moment the watermark proves the
    session over — bounded state on an unbounded key space.

    Output: (user_id, session_idx, n_events, first_ts_us, last_ts_us),
    append-only.  Same INCLUSIVE-gap/ordering contract as
    `sessionize_stream` (in-order per-key arrival across batches).

    Timing contract (pinned empirically in tests/test_streaming.py):
    timeouts fire against the PREVIOUS batch's committed watermark, so
    a session closes in the first batch that runs after the watermark
    passes it — availableNow runs a final timeout-only batch after the
    last data batch, so sessions whose timer the FINAL watermark
    covers do emit before the query stops; still-open sessions remain
    in state for the next restart (the streaming contract, not data
    loss).

    Scale shape: 32 bytes of state per key; one shuffle per batch on
    the key; output rows = closed sessions only (≪ input rows), which
    is what makes this the 100 TB session-ETL shape — the alternative
    (emit-on-update + downstream dedup) re-emits every session once
    per touching batch.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def roll(key, pdfs, state):
        closed = []
        if state.hasTimedOut:
            # watermark passed last_ts + gap with no newer input: the
            # open session is final
            idx, n, first_us, last_us = state.get
            closed.append((key[0], idx, n, first_us, last_us))
            state.remove()
        else:
            if state.exists:
                idx, n, first_us, last_us = state.get
            else:
                idx, n, first_us, last_us = 0, 0, -1, -1
            frames = [pdf for pdf in pdfs if len(pdf)]
            if frames:
                rows = (
                    pd.concat(frames)
                    .sort_values(["ts_us", "event_id"],
                                 kind="mergesort")
                )
                for ts_us in rows["ts_us"].astype("int64"):
                    ts_us = int(ts_us)
                    if last_us >= 0 and ts_us - last_us <= gap_us:
                        n += 1
                        last_us = ts_us
                    else:
                        if n > 0:
                            closed.append(
                                (key[0], idx, n, first_us, last_us)
                            )
                        idx += 1
                        n = 1
                        first_us = last_us = ts_us
            if n > 0:
                state.update((idx, n, first_us, last_us))
                # the timer: fire when the watermark proves the gap
                # elapsed with no successor.  Clamped above the current
                # watermark — setTimeoutTimestamp THROWS at or below
                # it, which a late-but-admitted row could otherwise
                # trigger on a disordered stream
                timer_ms = (last_us + gap_us) // 1000 + 1
                state.setTimeoutTimestamp(
                    max(timer_ms, state.getCurrentWatermarkMs() + 1)
                )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_idx", "n_events",
                    "first_ts_us", "last_ts_us",
                ],
            )

    src = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(ts_col).alias(ts_col),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        roll,
        CLOSED_SCHEMA,
        TTL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
