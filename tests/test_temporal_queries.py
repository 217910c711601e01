"""Oracle parity for the temporal join queries + operator properties."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.operators.temporal import (
    asof_join,
    bucketed_interval_join,
)
from spark_tensors_spark.queries import temporal_queries as tq
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection

SF = SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tq.ORACLES))
def test_temporal_query_matches_oracle(spark, duck, name):
    ok, detail = compare(
        tq.QUERIES[name], tq.ORACLES[name], spark, SF, con=duck
    )
    assert ok, f"{name}: {detail}"


def test_asof_tolerance(spark):
    """tolerance_seconds nulls out matches older than the horizon."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(hours=2))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0 - dt.timedelta(minutes=5), 10.0),
         (2, t0 - dt.timedelta(minutes=5), 20.0)],
        "k long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, keys=["k"], value_cols=["v"], tolerance_seconds=600
    ).collect()
    by_k = {r.k: r.v_right for r in out}
    assert by_k[1] == 10.0          # 5 min old → within tolerance
    assert by_k[2] is None          # 2h05m old → nulled


def test_interval_join_left_keeps_all_left_rows(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 1, t0), (2, 1, t0 + dt.timedelta(hours=5)),
         (3, 2, t0)],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t0 - dt.timedelta(minutes=1), 5.0)],
        "k long, ts timestamp, v double",
    )
    out = bucketed_interval_join(
        left, right, keys=["k"], lookback_seconds=600, how="left"
    ).collect()
    ids = sorted(r.event_id for r in out)
    assert ids == [1, 2, 3]
    matched = {r.event_id: r.r_v for r in out}
    assert matched[1] == 5.0 and matched[2] is None and matched[3] is None


def test_resample_ffill_matches_pandas(spark):
    """Distributed resample+ffill == pandas resample('30s').last().ffill()
    per key (last-by-timestamp, the documented semantics), including
    multi-bucket gaps and a lower-than-previous late observation."""
    import pandas as pd

    from spark_tensors_spark.operators.temporal import resample_ffill

    rows = [
        ("a", "2024-01-01 00:00:05", 9.0),
        ("a", "2024-01-01 00:00:20", 2.0),   # same bucket: LATER (not max) wins
        ("a", "2024-01-01 00:02:10", 3.0),   # 3-bucket gap before this
        ("b", "2024-01-01 00:00:45", 10.0),
        ("b", "2024-01-01 00:01:40", 20.0),
    ]
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)
    got = {
        (r.k, r.bucket_ts.isoformat()): r.v
        for r in resample_ffill(
            df, ["k"], ts_col="ts", value_col="value", step_seconds=30
        ).collect()
    }
    expected = {}
    for k, g in pdf.groupby("k"):
        ser = (
            g.set_index("ts")["value"].resample("30s").last().ffill()
        )
        for ts, v in ser.items():
            expected[(k, ts.isoformat())] = v
    assert got == expected
    # the gap buckets really exist and carry the filled LAST value (2.0,
    # even though 9.0 was the bucket max)
    assert got[("a", "2024-01-01T00:01:00")] == 2.0
    assert got[("a", "2024-01-01T00:01:30")] == 2.0


def test_resample_ffill_equal_ts_tie_break(spark):
    """Two observations with the SAME timestamp in one bucket: the max
    value is the deterministic pick (struct (ts, value) ordering)."""
    import pandas as pd

    from spark_tensors_spark.operators.temporal import resample_ffill

    pdf = pd.DataFrame(
        [("a", "2024-01-01 00:00:10", 5.0),
         ("a", "2024-01-01 00:00:10", 7.0)],
        columns=["k", "ts", "value"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    out = resample_ffill(
        spark.createDataFrame(pdf), ["k"], ts_col="ts",
        value_col="value", step_seconds=30,
    ).collect()
    assert len(out) == 1 and out[0].v == 7.0


def test_mmr_rerank_diversifies(spark):
    """Three near-duplicates of the query + one orthogonal candidate:
    plain top-3 keeps the duplicates; MMR at lambda=0.5 pulls the
    orthogonal one into the top 3."""
    import pandas as pd

    from spark_tensors_spark.pipeline.similarity import (
        cosine_topk,
        mmr_rerank,
    )

    vecs = {
        0: [1.0, 0.0, 0.0],    # query
        1: [0.99, 0.1, 0.0],   # near-dup of query
        2: [0.98, 0.12, 0.0],  # near-dup
        3: [0.97, 0.14, 0.0],  # near-dup
        4: [0.0, 0.0, 1.0],    # orthogonal
    }
    emb = spark.createDataFrame(
        pd.DataFrame(
            [(i, v) for i, v in vecs.items()],
            columns=["vec_id", "embedding"],
        ),
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    scored = cosine_topk(emb, queries, k=4)
    plain_top3 = {
        r.nn_id for r in scored.filter(F.col("rk") <= 3).collect()
    }
    assert plain_top3 == {1, 2, 3}
    mmr = mmr_rerank(scored, emb, n=3, lambda_=0.5)
    picked = {r.nn_id for r in mmr.collect()}
    ranks = {r.nn_id: r.mmr_rank for r in mmr.collect()}
    assert 4 in picked
    assert ranks[1] == 1  # best sim still first
    # deterministic across runs
    again = {r.nn_id: r.mmr_rank for r in mmr_rerank(
        scored, emb, n=3, lambda_=0.5
    ).collect()}
    assert again == ranks


def test_ewma_hand_computed(spark):
    """Zero-initialized truncated EWMA (α=½): acc' = acc/2 + x/2 in
    event order, windowed to the last 20 observations."""
    import datetime as dt

    from spark_tensors_spark.operators.temporal import ewma

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, t0, 4.0),
        (2, 10, t0 + dt.timedelta(minutes=1), 8.0),
        (3, 10, t0 + dt.timedelta(minutes=2), 2.0),
        (4, 11, t0, 6.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {r.event_id: r.ewma for r in
           ewma(df, ["user_id"], order_tiebreak="event_id").collect()}
    assert out[1] == 2.0                 # 0/2 + 4/2
    assert out[2] == 5.0                 # 2/2 + 8/2
    assert out[3] == 3.5                 # 5/2 + 2/2
    assert out[4] == 3.0                 # independent key


def test_ewma_window_truncation(spark):
    """Only the last `window` observations contribute: with window=2
    the third event forgets the first entirely."""
    import datetime as dt

    from spark_tensors_spark.operators.temporal import ewma

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 1, t0 + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate([100.0, 8.0, 4.0])]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {r.event_id: r.ewma for r in
           ewma(df, ["user_id"], order_tiebreak="event_id",
                window=2).collect()}
    # event 2 folds [8, 4] only: (0/2+8/2)/2 + 4/2 = 4.0
    assert out[2] == 4.0


def test_sessionize_agrees_with_session_window(spark):
    """The row-level labeler and Spark's session_window draw the SAME
    session boundaries: per user, session count and per-session event
    counts match."""
    from spark_tensors_spark.operators.temporal import sessionize
    from spark_tensors_spark.streaming.windows import session_window_agg
    from spark_tensors_spark.io.readers import load_table

    ev = load_table(spark, SF, "events")
    lab = (
        sessionize(ev, ["user_id"], gap_seconds=300,
                   order_tiebreak="event_id")
        .groupBy("user_id", "session_idx")
        .count()
    )
    mine = sorted(
        (r.user_id, r["count"]) for r in lab.collect()
    )
    sw = session_window_agg(ev, gap="5 minutes")
    theirs = sorted((r.user_id, r.c) for r in sw.collect())
    assert mine == theirs


def test_sessionize_exact_gap_boundary(spark):
    """An event at EXACTLY gap_seconds after the previous one stays in
    the SAME session (inclusive gap) — and Spark's session_window does
    the same (its merge is inclusive at the session end: an event at
    prev_ts + gap is absorbed and extends the window).  The corpus
    parity test above is data-dependent (no exact-gap spacing in the
    synthetic events); this pins the boundary on both engines, plus
    the first spacing past the gap (+1µs → new session)."""
    import datetime as dt
    from spark_tensors_spark.operators.temporal import sessionize
    from spark_tensors_spark.streaming.windows import session_window_agg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "user_id": [1, 1, 1, 1],
            # 0s, +300s exactly (same session), +300s exactly again
            # (same session), then +300.000001s (NEW session)
            "ts": [
                t0,
                t0 + dt.timedelta(seconds=300),
                t0 + dt.timedelta(seconds=600),
                t0 + dt.timedelta(seconds=900, microseconds=1),
            ],
            "value": [1.0, 1.0, 1.0, 1.0],
        }
    )
    df = spark.createDataFrame(rows)
    lab = sessionize(df, ["user_id"], gap_seconds=300,
                     order_tiebreak="event_id")
    idx = {r.event_id: r.session_idx for r in lab.collect()}
    assert idx == {0: 1, 1: 1, 2: 1, 3: 2}
    # session_window agrees: 2 sessions, sized 3 and 1
    sw = session_window_agg(df, gap="5 minutes")
    assert sorted(r.c for r in sw.collect()) == [1, 3]
