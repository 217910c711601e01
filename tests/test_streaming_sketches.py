"""Streaming HLL register state: multi-batch merge equals the batch
sketch over the union, and replaying a batch is a no-op (CRDT
max-merge + batch-id partition overwrite)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.functions.sketches import hll_estimate
from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.streaming.sketches import (
    hll_estimate_from_state,
    merge_hll_batch,
    streaming_hourly_hll,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def ev(spark):
    return load_table(spark, SF_SMOKE, "events").withColumn(
        "hour_start", F.date_trunc("hour", F.col("ts"))
    )


def _estimates(df):
    return {
        r.hour_start: round(r.hll_estimate, 4) for r in df.collect()
    }


def test_multibatch_merge_equals_batch_sketch(spark, ev, tmp_path):
    """Three micro-batches (split by event_id mod) folded from state ==
    one batch sketch over everything."""
    state = str(tmp_path / "state")
    for b in range(3):
        merge_hll_batch(
            ev.filter(F.col("event_id") % 3 == b),
            b,
            state,
            "user_id",
            ["hour_start"],
        )
    streamed = _estimates(
        hll_estimate_from_state(spark, state, ["hour_start"])
    )
    batch = _estimates(hll_estimate(ev, "user_id", ["hour_start"]))
    assert streamed == batch


def test_replay_is_noop(spark, ev, tmp_path):
    state = str(tmp_path / "state")
    for b in range(2):
        merge_hll_batch(
            ev.filter(F.col("event_id") % 2 == b),
            b,
            state,
            "user_id",
            ["hour_start"],
        )
    before = _estimates(
        hll_estimate_from_state(spark, state, ["hour_start"])
    )
    # replay batch 0 — overwrites its own partition with identical rows
    merge_hll_batch(
        ev.filter(F.col("event_id") % 2 == 0),
        0,
        state,
        "user_id",
        ["hour_start"],
    )
    after = _estimates(
        hll_estimate_from_state(spark, state, ["hour_start"])
    )
    assert before == after


def test_real_stream_matches_batch(spark, ev, tmp_path):
    """readStream (availableNow) through streaming_hourly_hll == the
    batch sketch — the stream≡batch contract behind the shared
    oracle."""
    src_dir = str(tmp_path / "src")
    ev.select("event_id", "ts", "user_id").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = streaming_hourly_hll(
        stream,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    streamed = _estimates(
        hll_estimate_from_state(
            spark, str(tmp_path / "state"), ["hour_start"]
        )
    )
    batch = _estimates(hll_estimate(ev, "user_id", ["hour_start"]))
    assert streamed == batch


def test_cms_multibatch_merge_equals_batch_sketch(spark, ev, tmp_path):
    from spark_tensors_spark.functions.sketches import cms_sketch
    from spark_tensors_spark.streaming.sketches import (
        cms_sketch_from_state,
        merge_cms_batch,
    )

    state = str(tmp_path / "cms_state")
    for b in range(3):
        merge_cms_batch(
            ev.filter(F.col("event_id") % 3 == b), b, state, "user_id"
        )
    folded = sorted(
        map(tuple, cms_sketch_from_state(spark, state).collect())
    )
    batch = sorted(map(tuple, cms_sketch(ev, "user_id").collect()))
    assert folded == batch


def test_cms_replay_is_noop(spark, ev, tmp_path):
    from spark_tensors_spark.streaming.sketches import (
        cms_sketch_from_state,
        merge_cms_batch,
    )

    state = str(tmp_path / "cms_state")
    for b in range(2):
        merge_cms_batch(
            ev.filter(F.col("event_id") % 2 == b), b, state, "user_id"
        )
    before = sorted(
        map(tuple, cms_sketch_from_state(spark, state).collect())
    )
    # replay: same batch content, same id — partition overwrite, not
    # double-count (sum-merge is not idempotent; the overwrite is the
    # guarantee)
    merge_cms_batch(
        ev.filter(F.col("event_id") % 2 == 0), 0, state, "user_id"
    )
    after = sorted(
        map(tuple, cms_sketch_from_state(spark, state).collect())
    )
    assert before == after


def test_compact_hll_state_evicts_and_preserves(spark, ev, tmp_path):
    """Compaction with a horizon: kept hours estimate identically,
    evicted hours vanish, and the state physically shrinks."""
    from spark_tensors_spark.streaming.sketches import compact_hll_state

    state = str(tmp_path / "state")
    for b in range(3):
        merge_hll_batch(
            ev.filter(F.col("event_id") % 3 == b),
            b,
            state,
            "user_id",
            ["hour_start"],
        )
    before = _estimates(
        hll_estimate_from_state(spark, state, ["hour_start"])
    )
    hours = sorted(before)
    horizon = hours[len(hours) // 2]
    rows_before = spark.read.parquet(state).count()
    compact_hll_state(spark, state, keep_from=horizon)
    after = _estimates(
        hll_estimate_from_state(spark, state, ["hour_start"])
    )
    assert set(after) == {h for h in hours if h >= horizon}
    assert all(after[h] == before[h] for h in after)
    assert spark.read.parquet(state).count() < rows_before


def test_compact_hll_state_total_eviction(spark, ev, tmp_path):
    """A horizon past every window evicts ALL state: the swap must
    still leave a readable (empty, schema-bearing) state dir, and a
    later drain must append to it normally."""
    import datetime as dt

    from spark_tensors_spark.streaming.sketches import compact_hll_state

    state = str(tmp_path / "state")
    merge_hll_batch(ev, 0, state, "user_id", ["hour_start"])
    horizon = dt.datetime(2100, 1, 1)
    compact_hll_state(spark, state, keep_from=horizon)
    est = hll_estimate_from_state(spark, state, ["hour_start"])
    assert est.count() == 0
    # the compacted-empty dir accepts the next batch's partials
    merge_hll_batch(ev, 1, state, "user_id", ["hour_start"])
    est2 = _estimates(hll_estimate_from_state(spark, state, ["hour_start"]))
    assert len(est2) > 0


def test_cms_real_stream_matches_batch(spark, ev, tmp_path):
    """readStream (availableNow) through streaming_cms == the batch
    sketch — the stream≡batch contract behind the shared oracle."""
    from spark_tensors_spark.functions.sketches import cms_sketch
    from spark_tensors_spark.streaming.sketches import (
        cms_sketch_from_state,
        streaming_cms,
    )

    src_dir = str(tmp_path / "src")
    ev.select("event_id", "user_id").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = streaming_cms(
        stream,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    folded = sorted(
        map(
            tuple,
            cms_sketch_from_state(spark, str(tmp_path / "state")).collect(),
        )
    )
    batch = sorted(map(tuple, cms_sketch(ev, "user_id").collect()))
    assert folded == batch


# ------------------------------------------------------------ KMV


def _kmv_ud(ev):
    return ev.select(
        "event_type",
        F.concat_ws(
            ":", F.col("user_id"), F.to_date("ts").cast("string")
        ).alias("user_day"),
    )


def test_kmv_multibatch_merge_equals_batch_signature(spark, ev, tmp_path):
    """Three micro-batches folded from state == the one-shot batch
    signature (min-k of unions IS the union's min-k)."""
    from spark_tensors_spark.functions.sketches import kmv_signature
    from spark_tensors_spark.streaming.sketches import (
        kmv_signature_from_state,
        merge_kmv_batch,
    )

    ud = _kmv_ud(ev)
    state = str(tmp_path / "state")
    for b in range(3):
        merge_kmv_batch(
            ud.filter(F.pmod(F.xxhash64("user_day"), F.lit(3)) == b),
            b,
            state,
            "user_day",
            ["event_type"],
        )
    streamed = sorted(
        (r.event_type, r.kmv_rank, r.kmv_h)
        for r in kmv_signature_from_state(
            spark, state, ["event_type"]
        ).collect()
    )
    batch = sorted(
        (r.event_type, r.kmv_rank, r.kmv_h)
        for r in kmv_signature(ud, "user_day", ["event_type"]).collect()
    )
    assert streamed == batch


def test_kmv_replay_is_noop(spark, ev, tmp_path):
    """Re-merging an already-applied batch changes nothing — both via
    the partition overwrite and the idempotent min-k algebra."""
    from spark_tensors_spark.streaming.sketches import (
        kmv_signature_from_state,
        merge_kmv_batch,
    )

    ud = _kmv_ud(ev)
    state = str(tmp_path / "state")
    b0 = ud.filter(F.col("event_type") != "view")
    b1 = ud.filter(F.col("event_type") == "view")
    merge_kmv_batch(b0, 0, state, "user_day", ["event_type"])
    merge_kmv_batch(b1, 1, state, "user_day", ["event_type"])
    before = sorted(
        map(tuple, kmv_signature_from_state(spark, state, ["event_type"]).collect())
    )
    merge_kmv_batch(b0, 0, state, "user_day", ["event_type"])  # replay
    after = sorted(
        map(tuple, kmv_signature_from_state(spark, state, ["event_type"]).collect())
    )
    assert before == after
