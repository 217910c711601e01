"""Streaming tests: oracle parity in batch mode + genuine readStream
runs (availableNow trigger → memory sink) proving batch ≡ stream."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.queries import streaming_queries as sq
from spark_tensors_spark.streaming.windows import (
    stateful_dedup,
    tumbling_window_agg,
)
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection

SF = SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(sq.ORACLES))
def test_streaming_query_matches_oracle(spark, duck, name):
    ok, detail = compare(
        sq.QUERIES[name], sq.ORACLES[name], spark, SF, con=duck
    )
    assert ok, f"{name}: {detail}"


@pytest.fixture(scope="module")
def stream_source(spark):
    """events re-written as a multi-file parquet dir (µs timestamps) so
    readStream can consume it."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    ev = load_table(spark, SF, "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    schema = ev.schema
    return d, schema


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_tumbling_equals_batch(spark, stream_source):
    d, schema = stream_source
    stream = spark.readStream.schema(schema).parquet(d)
    out = tumbling_window_agg(stream, window="1 hour", watermark="10 minutes")
    _run_stream(out, "tumbling_mem")
    got = {
        (r.w_start, r.event_type): (r.c, r.v)
        for r in spark.sql("SELECT * FROM tumbling_mem").collect()
    }
    batch = {
        (r.w_start, r.event_type): (r.c, r.v)
        for r in tumbling_window_agg(
            load_table(spark, SF, "events"), window="1 hour"
        ).collect()
    }
    assert got == batch


def test_stream_dedup_append(spark, stream_source):
    d, schema = stream_source
    stream = spark.readStream.schema(schema).parquet(d)
    out = stateful_dedup(stream, keys=("user_id", "event_type"))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_stream = spark.sql("SELECT COUNT(*) c FROM dedup_mem").collect()[0].c
    n_batch = (
        stateful_dedup(load_table(spark, SF, "events"),
                       keys=("user_id", "event_type")).count()
    )
    assert n_stream == n_batch


def test_stateful_running_totals_stream_equals_batch(spark, stream_source):
    """applyInPandasWithState final per-user state ≡ batch aggregate."""
    from spark_tensors_spark.streaming.stateful import running_user_totals

    d, schema = stream_source
    stream = spark.readStream.schema(schema).parquet(d)
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("totals_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits per microbatch; the row with max n per user
    # is that user's final state
    got = {
        r.user_id: (r.n, round(r.total, 6), r.last_ts_us)
        for r in spark.sql(
            """SELECT user_id, n, total, last_ts_us FROM (
                 SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY n DESC) AS rk
                 FROM totals_mem) WHERE rk = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.n, r.total, r.last_ts_us)
        for r in running_user_totals(
            load_table(spark, SF, "events")
        ).collect()
    }
    assert got == batch
