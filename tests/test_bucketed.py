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


def test_bucketed_epoch_gather_loop_is_exchange_free(spark):
    """SURVEY §4.2(c) — the 'co-partition embeddings with triples'
    item v1 deferred: no custom Catalyst strategy is needed, bucketing
    already does it.  Encoded triples bucketed by s_id and the entity
    parameter table bucketed by id make BOTH per-epoch hot paths
    exchange-free: (1) the embedding gather join, (2) the gradient
    aggregate keyed by the same id; and re-bucketing the merged
    parameters on write restores the property for the next epoch."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        triples = spark.range(0, 5000).select(
            (F.col("id") % 500).alias("s_id"),
            (F.col("id") % 7).alias("p_id"),
            ((F.col("id") * 13) % 500).alias("o_id"),
        )
        params = spark.range(0, 500).select(
            F.col("id"), F.array(F.col("id") * 0.1).alias("emb")
        )
        write_bucketed(triples, "t_enc_triples", ["s_id"], n_buckets=8)
        write_bucketed(params, "t_params_e0", ["id"], n_buckets=8)
        t = read_bucketed(spark, "t_enc_triples")
        p0 = read_bucketed(spark, "t_params_e0")

        # epoch 1: gather + grad agg — no Exchange anywhere
        gather = t.join(
            p0.select(F.col("id").alias("s_id"), "emb"), "s_id"
        )
        assert "Exchange" not in _plan(gather)
        grads = gather.groupBy("s_id").agg(
            F.count(F.lit(1)).alias("deg")
        )
        assert "Exchange" not in _plan(grads)

        # merge step joins params with grads on the same bucketed key
        merged = p0.join(
            grads.select(F.col("s_id").alias("id"), "deg"), "id", "left"
        ).select(
            "id",
            F.transform(
                "emb", lambda x: x + F.coalesce(F.col("deg"), F.lit(0)) * 0.0
            ).alias("emb"),
        )
        assert "Exchange" not in _plan(merged)

        # epoch 2: re-bucketed write restores the property
        write_bucketed(merged, "t_params_e1", ["id"], n_buckets=8)
        p1 = read_bucketed(spark, "t_params_e1")
        gather2 = t.join(
            p1.select(F.col("id").alias("s_id"), "emb"), "s_id"
        )
        assert "Exchange" not in _plan(gather2)
        assert gather2.count() == 5000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        for tbl in ("t_enc_triples", "t_params_e0", "t_params_e1"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
