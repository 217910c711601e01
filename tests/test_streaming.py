"""Streaming tests: oracle parity in batch mode + genuine readStream
runs (availableNow trigger → memory sink) proving batch ≡ stream."""

from __future__ import annotations

import contextlib
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


def test_stream_session_window_equals_batch(spark, stream_source):
    """session_window through a REAL readStream (one file per
    micro-batch) == the batch sessionization — the one stateful window
    where state MERGES across batches (a session open at a batch
    boundary must absorb the next batch's rows)."""
    from spark_tensors_spark.streaming.windows import session_window_agg

    d, schema = stream_source
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = session_window_agg(stream, gap="5 minutes", watermark=None)
    q = _run_stream(out, "session_mem")
    # the merge case only exists if more than one micro-batch ran
    assert len([p for p in q.recentProgress]) > 1
    got = {
        (r.w_start, r.w_end, r.user_id): (r.c, r.v)
        for r in spark.sql("SELECT * FROM session_mem").collect()
    }
    batch = {
        (r.w_start, r.w_end, r.user_id): (r.c, r.v)
        for r in session_window_agg(
            load_table(spark, SF, "events"), gap="5 minutes"
        ).collect()
    }
    assert got == batch


def test_stream_session_merges_across_batches(spark, tmp_path):
    """Deterministic cross-batch merge: one user's three events land in
    THREE separate files (= three micro-batches); the final state is a
    single merged session, not three."""
    import datetime as dt

    import pandas as pd

    from spark_tensors_spark.streaming.windows import session_window_agg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    d = str(tmp_path / "src")
    for i, (ts, val) in enumerate(
        [(t0, 1.0), (t0 + dt.timedelta(minutes=3), 2.0),
         (t0 + dt.timedelta(minutes=6), 4.0)]
    ):
        pdf = pd.DataFrame({"user_id": [7], "ts": [ts], "value": [val]})
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = session_window_agg(stream, gap="5 minutes", watermark=None)
    q = (
        out.writeStream.format("memory")
        .queryName("session_merge_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3  # one batch per file
    rows = spark.sql("SELECT * FROM session_merge_mem").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.user_id, r.c, r.v) == (7, 3, 7.0)
    assert r.w_start == t0
    # session end = last event + gap
    assert r.w_end == t0 + dt.timedelta(minutes=11)


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


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than the watermark must not reach a finalized window
    (late-data semantics, not just window arithmetic).

    Single-file microbatches (maxFilesPerTrigger=1, mod-time order):
    batch 0 raises event time to 11:00; batch 1 advances the committed
    watermark to 10:50, finalizing the 10:00-10:30 window; the late
    10:05 row arrives in batch 2 — *two* batches later, because Spark
    applies the watermark filter with a one-batch lag (the predicate
    uses the previous batch's committed watermark).
    """
    import time as _time

    d = tmp_path / "late_src"
    d.mkdir()
    schema = "ts timestamp, event_type string, value double"

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / name))
        _time.sleep(1.1)  # file source orders batches by mod time

    t = lambda s: __import__("datetime").datetime(2024, 1, 1, *s)
    write("b1", [(t((10, 1)), "a", 1.0), (t((10, 2)), "a", 1.0),
                 (t((11, 0)), "a", 1.0)])
    write("b2", [(t((12, 0)), "a", 1.0)])
    write("b3", [(t((10, 5)), "a", 100.0),   # LATE: watermark is 11:50
                 (t((13, 0)), "a", 1.0)])
    write("b4", [(t((14, 0)), "a", 1.0)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["w"].start.hour, r["w"].start.minute): (r["c"], r["v"])
        for r in spark.sql("SELECT * FROM late_mem").collect()
    }
    # the 10:00-10:30 window finalized WITHOUT the late 100.0 row
    assert rows.get((10, 0)) == (2, 2.0), rows


def test_stream_stream_interval_join_equals_batch(spark, stream_source):
    """Watermarked stream-stream interval join produces exactly the
    batch range-join pairs once both streams drain."""
    from spark_tensors_spark.streaming.joins import interval_join

    d, schema = stream_source
    errors_s = (
        spark.readStream.schema(schema).parquet(d)
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
    )
    clicks_s = (
        spark.readStream.schema(schema).parquet(d)
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value")
    )
    joined = interval_join(
        errors_s, clicks_s, keys=["user_id"], lookback_seconds=600,
        watermark="2 hours",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_id, r.r_ts)
        for r in spark.sql("SELECT event_id, r_ts FROM ssj_mem").collect()
    }

    ev = load_table(spark, SF, "events")
    batch = interval_join(
        ev.filter(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        ),
        ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        ),
        keys=["user_id"],
        lookback_seconds=600,
    )
    want = {(r.event_id, r.r_ts) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_stream_left_interval_join_equals_batch(spark, stream_source):
    """Left-outer stream-stream join: watermark-expired unmatched left
    rows emit null-padded; final rows ≡ batch left range join."""
    from spark_tensors_spark.streaming.joins import interval_join

    d, schema = stream_source
    errors_s = (
        spark.readStream.schema(schema).parquet(d)
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
    )
    clicks_s = (
        spark.readStream.schema(schema).parquet(d)
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value")
    )
    joined = interval_join(
        errors_s, clicks_s, keys=["user_id"], lookback_seconds=600,
        watermark="30 minutes", how="left",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjl_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_id, r.r_ts)
        for r in spark.sql("SELECT event_id, r_ts FROM ssjl_mem").collect()
    }

    ev = load_table(spark, SF, "events")
    batch = interval_join(
        ev.filter(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        ),
        ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "value"
        ),
        keys=["user_id"],
        lookback_seconds=600,
        how="left",
    )
    want = {(r.event_id, r.r_ts) for r in batch.collect()}
    # stream may withhold null-emission for left rows newer than the
    # final watermark; matched pairs must agree exactly, and emitted
    # null rows must be a subset of batch null rows
    got_matched = {p for p in got if p[1] is not None}
    want_matched = {p for p in want if p[1] is not None}
    assert got_matched == want_matched
    assert {p for p in got if p[1] is None} <= {
        p for p in want if p[1] is None
    }
    assert len(got_matched) > 0


def test_foreach_batch_sink_stream_equals_batch(spark, stream_source, tmp_path):
    """foreachBatch parquet sink: draining the stream through the
    idempotent writer yields exactly the batch rows."""
    from spark_tensors_spark.streaming import sinks

    d, schema = stream_source
    stream = spark.readStream.schema(schema).parquet(d)
    out_dir = str(tmp_path / "sink_out")
    q = sinks.foreach_batch_parquet_sink(
        stream.select("event_id", "user_id", "event_type", "value"),
        out_dir,
        str(tmp_path / "sink_ckpt"),
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.user_id, r.event_type, r.value)
        for r in sinks.read_sink(spark, out_dir).collect()
    }
    want = {
        (r.event_id, r.user_id, r.event_type, r.value)
        for r in load_table(spark, SF, "events")
        .select("event_id", "user_id", "event_type", "value")
        .collect()
    }
    assert got == want


def test_foreach_batch_sink_replay_is_idempotent(spark, tmp_path):
    """Re-running the same batch id (crash-replay) overwrites its own
    partition instead of duplicating rows; other batches are kept."""
    from spark_tensors_spark.streaming import sinks

    out_dir = str(tmp_path / "idem_out")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    b1 = spark.createDataFrame([(3, "c")], "id long, s string")
    sinks.write_idempotent_batch(b0, 0, out_dir)
    sinks.write_idempotent_batch(b1, 1, out_dir)
    sinks.write_idempotent_batch(b0, 0, out_dir)  # replay of batch 0
    rows = sorted(
        (r.id, r.s) for r in sinks.read_sink(spark, out_dir).collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_last_n_events_stream_equals_batch(spark, stream_source):
    """transformWithStateInPandas ListState recency buffer: after the
    stream drains, each user's latest emitted top-3 equals the batch
    window top-3."""
    from spark_tensors_spark.streaming.stateful import last_n_events

    d, schema = stream_source
    stream = spark.readStream.schema(schema).parquet(d)
    out = last_n_events(stream, n=3)
    q = (
        out.writeStream.format("memory")
        .queryName("lastn_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.rk): (r.ts_us, r.event_id)
        for r in spark.sql(
            """SELECT user_id, rk, ts_us, event_id FROM (
                 SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY user_id, rk
                     ORDER BY ts_us DESC, event_id DESC
                 ) AS dup_rk FROM lastn_mem) WHERE dup_rk = 1"""
        ).collect()
    }
    want = {
        (r.user_id, r.rk): (r.ts_us, r.event_id)
        for r in last_n_events(
            load_table(spark, SF, "events"), n=3
        ).collect()
    }
    assert got == want


def test_stream_ivf_assign_multi_batch_and_replay(spark, tmp_path):
    """Incremental IVF assignment (streaming/ann.py): three files =
    three micro-batches accumulate one index state identical to the
    batch assignment; replaying a batch id overwrites, never
    duplicates."""
    import numpy as np
    import pandas as pd

    from spark_tensors_spark.pipeline.similarity import pseudo_centroids
    from spark_tensors_spark.streaming.ann import (
        assign_cells_batch,
        assignments_from_state,
        streaming_ivf_assign,
    )

    rng = np.random.default_rng(3)
    cents = pseudo_centroids(4, 8)
    src = str(tmp_path / "src")
    all_rows = []
    for part in range(3):
        ids = list(range(part * 10, part * 10 + 10))
        codes = [rng.integers(-127, 128, size=8).tolist() for _ in ids]
        all_rows += list(zip(ids, codes))
        pdf = pd.DataFrame({"vec_id": ids, "codes": codes})
        spark.createDataFrame(
            pdf, "vec_id long, codes array<long>"
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = streaming_ivf_assign(
        stream, state_dir=state, checkpoint_dir=str(tmp_path / "ckpt"),
        centroids=cents,
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3
    got = sorted(map(tuple, assignments_from_state(spark, state).collect()))
    # batch reference: argmin L2² per vector, ties to lower cell
    want = []
    for vid, c in all_rows:
        v = np.array(c, dtype=np.float64)
        d2 = ((v[None, :] - cents) ** 2).sum(axis=1)
        cell = int(d2.argmin())
        want.append((vid, cell, int(d2[cell])))
    assert got == sorted(want)
    # replay batch 0's content under its id: state unchanged
    replay = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [r[0] for r in all_rows[:10]],
             "codes": [r[1] for r in all_rows[:10]]}
        ),
        "vec_id long, codes array<long>",
    )
    assign_cells_batch(replay, 0, state, cents)
    again = sorted(map(tuple, assignments_from_state(spark, state).collect()))
    assert again == got


def test_stream_sessionize_labels_across_batches(spark, tmp_path):
    """Row-level streaming sessionization: sessions CONTINUE across
    micro-batch boundaries (16-byte state), new sessions open on the
    gap rule, and the full label set equals the batch sessionize on
    the same rows."""
    import datetime as dt

    import pandas as pd

    from spark_tensors_spark.streaming.sessionize import sessionize_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    d = str(tmp_path / "src")
    # three files = three micro-batches; user 7: file1->file2 within
    # the gap (session must CONTINUE), file2->file3 past it (NEW
    # session); user 9 only in file2
    files = [
        [(7, 0, t0), (7, 1, t0 + dt.timedelta(minutes=2))],
        [(7, 2, t0 + dt.timedelta(minutes=6)),
         (9, 3, t0 + dt.timedelta(minutes=6))],
        [(7, 4, t0 + dt.timedelta(minutes=20))],
    ]
    for rows in files:
        pdf = pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "event_id": [r[1] for r in rows],
                "ts": [r[2] for r in rows],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) > 1  # the continuation case ran
    got = {
        (r.user_id, r.event_id): r.session_idx
        for r in spark.sql("SELECT * FROM sess_mem").collect()
    }
    # file1 (idx 1), file2 event 2 continues (4 min gap), event 4 in
    # file3 opens session 2; user 9 gets its own session 1
    assert got == {(7, 0): 1, (7, 1): 1, (7, 2): 1, (7, 4): 2, (9, 3): 1}
    # and the batch path (operators/temporal.sessionize projection)
    # produces the identical labels
    batch = {
        (r.user_id, r.event_id): r.session_idx
        for r in sessionize_stream(spark.read.parquet(d)).collect()
    }
    assert got == batch


def test_sessionize_stream_ttl_timers(spark, tmp_path):
    """Event-time TIMER semantics of sessionize_stream_ttl, pinned
    empirically: (1) a successor event past the gap closes the open
    session cross-batch; (2) an idle key's open session closes when
    the PREVIOUS batch's committed watermark passes last_ts + gap —
    availableNow runs a final timeout-only batch; (3) sessions whose
    timer the final watermark never covers stay in state, unemitted."""
    import datetime as dt
    import os as _os

    import pandas as pd

    from spark_tensors_spark.streaming.sessionize import (
        sessionize_stream_ttl,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    def us(m):
        return int(
            ts(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )

    src = str(tmp_path / "src")
    # batch 1: user 1 session A (0,2 min), user 2 session (0,1 min)
    # batch 2: user 1 at 30 min (closes A by succession, opens B),
    #          user 3 at 31 min (fresh, stays open)
    b1 = pd.DataFrame(
        {"user_id": [1, 1, 2, 2], "event_id": [10, 11, 20, 21],
         "ts": [ts(0), ts(2), ts(0), ts(1)]}
    )
    b2 = pd.DataFrame(
        {"user_id": [1, 3], "event_id": [12, 30],
         "ts": [ts(30), ts(31)]}
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(
        _os.path.join(src, "b1")
    )
    spark.createDataFrame(b2).coalesce(1).write.parquet(
        _os.path.join(src, "b2")
    )
    for i, part in enumerate(("b1", "b2")):
        for f in _os.listdir(_os.path.join(src, part)):
            _os.utime(_os.path.join(src, part, f),
                      (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    out = sessionize_stream_ttl(
        stream, gap_seconds=300, watermark_delay="10 minutes"
    )
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(sink)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.read.parquet(sink).collect()
    )
    # user 1 session A closed by succession in batch 2; user 2 closed
    # by TIMER in the final batch (timer 00:06 < watermark 00:21);
    # user 1 session B (timer 00:35) and user 3 (00:36) stay open
    assert got == [
        (1, 1, 2, us(0), us(2)),
        (2, 1, 2, us(0), us(1)),
    ]


def test_stateful_suite_runs_under_rocksdb_provider(spark, stream_source):
    """The deployable 100 TB state-store configuration: the same
    applyInPandasWithState query (plus a watermarked windowed agg) runs
    under the RocksDB provider with changelog checkpointing and
    produces the identical final state as the default HDFS-backed
    provider (the provider is a per-query conf read at stream start, so
    it can be toggled on the shared session).  SCALE.md carries the
    rationale: the default provider keeps every key in executor heap —
    a memory cliff at 100 TB key cardinality; RocksDB spills to local
    disk and checkpoints incrementally."""
    from spark_tensors_spark.session import rocksdb_state
    from spark_tensors_spark.streaming.stateful import running_user_totals
    from spark_tensors_spark.streaming.windows import tumbling_window_agg

    d, schema = stream_source
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    with rocksdb_state(spark):
        stream = spark.readStream.schema(schema).parquet(d)
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName("totals_rocksdb")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(120)
        assert finished, "stream did not finish within 120 s"
        assert "RocksDBStateStoreProvider" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        # provider assertion from the EXECUTED query, not just the conf:
        # only the RocksDB provider reports rocksdb* custom state metrics
        prog = q.lastProgress
        assert prog is not None, "no progress recorded"
        rocks_metrics = [
            m
            for op in prog["stateOperators"]
            for m in op.get("customMetrics", {})
            if m.startswith("rocksdb")
        ]
        assert rocks_metrics, prog
        got = {
            r.user_id: (r.n, round(r.total, 6), r.last_ts_us)
            for r in spark.sql(
                """SELECT user_id, n, total, last_ts_us FROM (
                     SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY n DESC) AS rk
                     FROM totals_rocksdb) WHERE rk = 1"""
            ).collect()
        }
        batch = {
            r.user_id: (r.n, r.total, r.last_ts_us)
            for r in running_user_totals(
                load_table(spark, SF, "events")
            ).collect()
        }
        assert got == batch
        # windowed agg with watermark state also commits under RocksDB
        stream2 = spark.readStream.schema(schema).parquet(d)
        out = tumbling_window_agg(
            stream2, window="1 hour", watermark="10 minutes"
        )
        q2 = _run_stream(out, "tumbling_rocksdb")
        assert spark.sql("SELECT COUNT(*) FROM tumbling_rocksdb").first()[0] > 0
        q2.stop()
    # the context manager restored the PREVIOUS provider conf (which is
    # the default unless the session itself was built with RocksDB,
    # e.g. SPARK_GRAFT_ROCKSDB=1 — restore-to-previous, not to-default)
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        == prev_provider
    )


@pytest.mark.parametrize(
    "qname",
    # every DECLARED query whose plan holds a Spark stateful operator
    # (applyInPandasWithState / watermarked windowed agg) routes its
    # state through the deployable RocksDB provider; the foreachBatch
    # external-state queries (doc_stream_dedup, ev_stream_scd2,
    # ev_stream_join_view, the sketch/MV folds) have NO state-store
    # operator, so the provider is structurally inapplicable there —
    # see their docstrings.
    ["ev_stream_session_ttl", "ev_stream_sessionize",
     "ev_stream_late_audit"],
)
def test_stateful_query_routes_state_through_rocksdb(
    spark, monkeypatch, qname
):
    """Pin that each state-store-backed DECLARED query actually enters
    session.rocksdb_state (so the gated row runs the deployable state
    store, not the default), and that the provider conf is live while
    its stream executes."""
    import spark_tensors_spark.session as sess
    from spark_tensors_spark.queries import streaming_queries

    fn = getattr(streaming_queries, qname)

    seen = {}
    real = sess.rocksdb_state

    @contextlib.contextmanager
    def spy(s):
        with real(s):
            seen["provider_during_run"] = s.conf.get(
                "spark.sql.streaming.stateStore.providerClass"
            )
            yield s

    monkeypatch.setattr(sess, "rocksdb_state", spy)
    out = fn(spark, SF)
    assert out.count() > 0
    assert "RocksDBStateStoreProvider" in seen.get("provider_during_run", "")
