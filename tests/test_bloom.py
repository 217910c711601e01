"""Tests for operators/bloom.py (bloom-filter join pruning)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from spark_tensors_spark.operators.bloom import (
    bloom_bits,
    bloom_prefilter,
    bloom_semi_join,
)


def _fact(spark, n=5000):
    return spark.range(n).select(
        F.col("id").alias("row_id"), (F.col("id") % 1000).alias("key")
    )


def _dim(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "dkey long")


def test_bloom_semi_join_equals_plain_semi_join(spark):
    fact = _fact(spark)
    dim = _dim(spark, [3, 17, 999, 421])
    got = sorted(
        r.row_id
        for r in bloom_semi_join(fact, dim, "key", "dkey").collect()
    )
    want = sorted(
        r.row_id
        for r in fact.join(
            dim, fact.key == dim.dkey, "left_semi"
        ).collect()
    )
    assert got == want and len(got) == 4 * 5


def test_bloom_prefilter_is_superset_with_low_fp_rate(spark):
    fact = _fact(spark, 2000)  # keys 0..999
    dim = _dim(spark, range(0, 100))  # true matches: keys 0..99
    bits = bloom_bits(dim.select(F.col("dkey").alias("k")), "k")
    kept = bloom_prefilter(fact, bits, "key").select("key").distinct()
    kept_keys = {r.key for r in kept.collect()}
    assert set(range(100)) <= kept_keys  # no false negatives, ever
    # m=2^16, k=3, 100 keys → fp rate ~ (300/65536)^3 ≈ 1e-7; allow slack
    assert len(kept_keys) - 100 <= 2


def test_bloom_bits_bounded(spark):
    m = 256
    dim = _dim(spark, range(10_000))  # far more keys than bits
    n = bloom_bits(dim.select(F.col("dkey").alias("k")), "k", m=m).count()
    assert n <= m


def test_bloom_prefilter_no_fact_exchange(spark):
    # the whole point: the fact side reaches the bloom filter without a
    # shuffle — only broadcast exchanges may appear before the exact join
    fact = _fact(spark)
    dim = _dim(spark, [1, 2, 3])
    bits = bloom_bits(dim.select(F.col("dkey").alias("k")), "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bloom_prefilter(fact, bits, "key").explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the bits-distinct ran ONCE inside the eager localCheckpoint; the
    # consumer plan must contain NO shuffle at all — the fact side
    # reaches all k semi-joins exchange-free, the broadcast builds scan
    # checkpointed blocks
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
    ]
    assert len(shuffles) == 0, shuffles
