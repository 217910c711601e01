"""Unit tests for the skew-mitigation operators (operators/skew.py):
two-phase salted aggregation and the hot/cold differentiated join."""

from pyspark.sql import functions as F


def _skewed_fixture(spark):
    """Fact with one hot key (k=1, 60 rows) and a cold tail (k=2..7,
    2 rows each); dim covers all keys plus one dangling row."""
    import pandas as pd

    fact = pd.DataFrame(
        {
            "k": [1] * 60 + [k for k in range(2, 8) for _ in range(2)],
            "v": list(range(72)),
        }
    )
    dim = pd.DataFrame({"k": list(range(1, 9)), "name": [f"n{k}" for k in range(1, 9)]})
    return spark.createDataFrame(fact), spark.createDataFrame(dim)


def test_salted_agg_equals_plain_groupby(spark):
    from spark_tensors_spark.operators.skew import salted_agg

    fact, _ = _skewed_fixture(spark)
    got = {
        r.k: (r.n, r.s, r.lo, r.hi)
        for r in salted_agg(
            fact,
            ["k"],
            {"n": ("v", "count"), "s": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max")},
            n_salts=4,
        ).collect()
    }
    want = {
        r.k: (r.n, r.s, r.lo, r.hi)
        for r in fact.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert got == want


def test_hot_cold_split_join_equals_plain_join(spark):
    from spark_tensors_spark.operators.skew import hot_cold_split_join

    fact, dim = _skewed_fixture(spark)
    got = sorted(
        (r.k, r.v, r.name)
        for r in hot_cold_split_join(fact, dim, "k").collect()
    )
    want = sorted((r.k, r.v, r.name) for r in fact.join(dim, "k").collect())
    assert got == want
    assert len(got) == 72  # every fact row matched, dangling dim row dropped


def test_hot_cold_split_both_branches_active(spark):
    """On the crafted fixture the auto threshold (1.5x mean = 1.5*72/7
    ~ 15.4) marks exactly key 1 hot — both branches must carry rows."""
    from spark_tensors_spark.operators.skew import hot_cold_split_join

    fact, dim = _skewed_fixture(spark)
    counts = fact.groupBy("k").agg(F.count(F.lit(1)).alias("_cnt"))
    totals = counts.agg(
        F.sum("_cnt").alias("_total"), F.count(F.lit(1)).alias("_nk")
    )
    hot = (
        counts.join(F.broadcast(totals))
        .filter(F.col("_cnt") * 2 * F.col("_nk") > 3 * F.col("_total"))
        .select("k")
        .collect()
    )
    assert [r.k for r in hot] == [1]
    # explicit hot_keys arg takes the same path and stays result-equal
    hot_df = spark.createDataFrame([(1,)], "k long")
    got = hot_cold_split_join(fact, dim, "k", hot_keys=hot_df)
    assert got.count() == 72


def test_hot_cold_split_join_plan_shapes(spark):
    """The hot branch must plan a broadcast hash join (dim side) and
    the cold branch a non-broadcast join — the whole point of the
    operator is that hot fact rows never shuffle."""
    import io
    import contextlib

    from spark_tensors_spark.operators.skew import hot_cold_split_join

    fact, dim = _skewed_fixture(spark)
    hot_df = spark.createDataFrame([(1,)], "k long")
    df = hot_cold_split_join(fact, dim, "k", hot_keys=hot_df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the union has two join branches; at least one BroadcastHashJoin
    # must carry the hot dim build side, and left-anti/semi filters
    # appear for the split itself
    assert "LeftSemi" in plan and "LeftAnti" in plan
