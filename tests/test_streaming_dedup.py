"""Incremental streaming dedup (streaming/dedup.py): multi-batch
admission semantics, cross-batch exact & near rejection, and replay
idempotence — the properties the single-batch declared-query oracle
(doc_stream_dedup) cannot see."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.streaming.dedup import dedup_one_batch

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles carry numbered crates across the frozen harbor "
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "s") for i, t in rows], "doc_id long, text string, source string"
    )


def _admitted_ids(spark, out_dir):
    if not os.path.isdir(out_dir):
        return set()
    return {
        r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()
    }


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "state"), str(tmp_path / "out")


def test_cross_batch_exact_and_near_rejection(spark, dirs):
    state_dir, out_dir = dirs
    unique0 = BASE + "alpha version zero"
    unique1 = "completely different content about orbital mechanics and " \
        "spectral lines measured during the long northern winter nights"
    b0 = _docs(spark, [(1, unique0), (2, unique1)])
    dedup_one_batch(b0, 0, state_dir, out_dir)
    assert _admitted_ids(spark, out_dir) == {1, 2}

    # batch 1: 10 = exact dup of 1, 11 = near dup of 1 (shared prefix
    # dominates the shingle set), 12 = genuinely new
    near = BASE + "alpha version zero!"
    new = "unrelated fresh text on tidal locking of exoplanets with " \
        "resonant orbits and the slow drift of their rotation periods"
    b1 = _docs(spark, [(10, unique0), (11, near), (12, new)])
    dedup_one_batch(b1, 1, state_dir, out_dir)
    assert _admitted_ids(spark, out_dir) == {1, 2, 12}


def test_within_batch_dedup_keeps_min_id(spark, dirs):
    state_dir, out_dir = dirs
    t = BASE + "the same text twice"
    b0 = _docs(spark, [(5, t), (3, t), (9, "something else entirely " * 5)])
    dedup_one_batch(b0, 0, state_dir, out_dir)
    assert _admitted_ids(spark, out_dir) == {3, 9}


def test_replay_is_idempotent(spark, dirs):
    state_dir, out_dir = dirs
    b0 = _docs(spark, [(1, BASE + "one"), (2, "different stuff " * 8)])
    b1 = _docs(spark, [(3, BASE + "one"), (4, "yet more novel text " * 6)])
    dedup_one_batch(b0, 0, state_dir, out_dir)
    dedup_one_batch(b1, 1, state_dir, out_dir)
    first = _admitted_ids(spark, out_dir)
    state_first = spark.read.parquet(os.path.join(state_dir, "hashes")).count()

    # crash-replay of batch 1: decisions depend only on partitions < 1,
    # writes overwrite partition _batch_id=1 — nothing may change
    dedup_one_batch(b1, 1, state_dir, out_dir)
    assert _admitted_ids(spark, out_dir) == first
    assert (
        spark.read.parquet(os.path.join(state_dir, "hashes")).count()
        == state_first
    )


def test_sequential_admission_is_order_dependent_prefix_stable(spark, dirs):
    # admitting the same batch twice under different ids: second copy is
    # fully rejected (every doc is an exact dup of admitted state)
    state_dir, out_dir = dirs
    texts = [(i, f"document number {i} " + BASE) for i in range(20)]
    dedup_one_batch(_docs(spark, texts), 0, state_dir, out_dir)
    admitted0 = _admitted_ids(spark, out_dir)
    shifted = [(i + 100, t) for i, t in texts]
    dedup_one_batch(_docs(spark, shifted), 1, state_dir, out_dir)
    assert _admitted_ids(spark, out_dir) == admitted0
