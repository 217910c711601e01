"""Unit tests for the SCD2 history-table operator (operators/scd2.py):
run compression, validity chaining, open-version flag, and the as-of
lookup contract against the interval ranges."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from spark_tensors_spark.operators.scd2 import history_table


def _us(t: dt.datetime) -> int:
    return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_history_table_compresses_runs(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = pd.DataFrame(
        {
            "user_id": [1] * 5 + [2],
            "event_id": [0, 1, 2, 3, 4, 5],
            "event_type": ["a", "a", "b", "b", "a", "x"],
            "ts": [t0 + dt.timedelta(minutes=m)
                   for m in (0, 1, 2, 3, 4, 0)],
        }
    )
    df = spark.createDataFrame(rows)
    out = sorted(
        (
            (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us,
             r.is_current)
            for r in history_table(
                df, ["user_id"], ["event_type"],
                order_tiebreak="event_id",
            ).collect()
        )
    )
    m = [_us(t0 + dt.timedelta(minutes=k)) for k in range(5)]
    assert out == [
        (1, "a", m[0], m[2], False),   # run a,a compressed
        (1, "a", m[4], -1, True),      # a returns -> NEW version
        (1, "b", m[2], m[4], False),
        (2, "x", m[0], -1, True),
    ]
    # ranges chain half-open without gaps per user: an as-of lookup at
    # minute 3 must land in the b version
    probe = _us(t0 + dt.timedelta(minutes=3))
    hits = [
        r for r in out
        if r[0] == 1 and r[2] <= probe and (r[3] == -1 or probe < r[3])
    ]
    assert len(hits) == 1 and hits[0][1] == "b"


def test_point_in_time_join(spark):
    """PIT lookup: facts land in the version covering their ts (half-
    open, open version matches onward), pre-history facts get NULLs
    with how='left' and drop with how='inner'."""
    from spark_tensors_spark.operators.scd2 import point_in_time_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    dim = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "event_id": [0, 1, 2],
            "event_type": ["a", "b", "x"],
            "ts": [ts(10), ts(20), ts(5)],
        }
    )
    hist = history_table(
        spark.createDataFrame(dim), ["user_id"], ["event_type"],
        ts_col="ts", order_tiebreak="event_id",
    )
    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2],
                "event_id": [100, 101, 102, 103, 104],
                # pre-history, at version start, mid-version, open
                "ts": [ts(5), ts(10), ts(15), ts(99), ts(6)],
            }
        )
    )
    out = point_in_time_join(facts, hist, ["user_id"], ts_col="ts")
    got = {r.event_id: r.dim_event_type for r in out.collect()}
    assert got == {100: None, 101: "a", 102: "a", 103: "b", 104: "x"}
    inner = point_in_time_join(
        facts, hist, ["user_id"], ts_col="ts", how="inner"
    )
    assert sorted(r.event_id for r in inner.collect()) == [
        101, 102, 103, 104
    ]
    # exactly one output row per matched fact (disjoint versions)
    assert out.count() == 5
