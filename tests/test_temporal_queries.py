"""Oracle parity for the temporal join queries + operator properties."""

from __future__ import annotations

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
