"""Bucketed tables: join/agg on the bucket key must plan WITHOUT an
exchange on the bucketed side — the co-located-join property."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.io.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", "-1"
    )  # force SMJ so exchange presence is observable
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_bucketed_a", ["k"], n_buckets=8)
    write_bucketed(b, "t_bucketed_b", ["k"], n_buckets=8)
    yield read_bucketed(spark, "t_bucketed_a"), read_bucketed(
        spark, "t_bucketed_b"
    )
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucket_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    p = _plan(a.join(b, "k"))
    assert "SortMergeJoin" in p
    assert "Exchange" not in p  # both sides read co-located buckets


def test_bucket_agg_has_no_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    p = _plan(a.groupBy("k").agg(F.sum("va")))
    assert "Exchange" not in p


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join without bucketing plans an Exchange."""
    a, _ = bucketed_pair
    plain = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    p = _plan(a.join(plain, "k"))
    assert "Exchange" in p


def test_bucketed_join_result_correct(spark, bucketed_pair):
    a, b = bucketed_pair
    row = (
        a.join(b, "k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("va") + F.col("vb")).alias("s"),
        )
        .first()
    )
    assert row["n"] == 10_000
    assert row["s"] == sum(2 * i + 3 * i for i in range(10_000))
