"""Unit pins for reciprocal-rank fusion (corpus.rrf_fuse)."""

from __future__ import annotations

from decimal import Decimal

from spark_tensors_spark.pipeline.corpus import rrf_fuse


def _snap(x: float) -> Decimal:
    return Decimal(repr(round(x, 12))).quantize(Decimal("1e-12"))


def test_rrf_hand_values(spark):
    r1 = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank long"
    )
    got = {
        r["doc_id"]: (r["n_lists"], r["best_rank"], r["rrf_score"])
        for r in rrf_fuse([r1, r2], k=60).collect()
    }
    # doc 2 in both lists: 1/62 + 1/61, each snapped to 12 dp first
    want2 = float(_snap(1 / 62) + _snap(1 / 61))
    assert got[2] == (2, 1, round(want2, 6))
    assert got[1] == (1, 1, round(float(_snap(1 / 61)), 6))
    assert got[3] == (1, 3, round(float(_snap(1 / 63)), 6))
    assert got[4] == (1, 2, round(float(_snap(1 / 62)), 6))
    # a doc in both lists always outranks the same ranks seen once
    assert got[2][2] > got[1][2]


def test_rrf_many_lists(spark):
    lists = [
        spark.createDataFrame([(7, r)], "doc_id long, rank long")
        for r in (1, 2, 3, 4)
    ]
    row = rrf_fuse(lists, k=60).first()
    assert row["n_lists"] == 4
    assert row["best_rank"] == 1


def test_matryoshka_full_prefix_equals_brute_force(spark):
    """Degenerate-cascade equivalence: with prefix_dim = dim and
    k_coarse >= |corpus| the Matryoshka cascade admits everything
    coarse and must return EXACTLY the brute-force cosine top-k."""
    import numpy as np

    from spark_tensors_spark.functions.columns import cosine_col
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from spark_tensors_spark.pipeline.similarity import matryoshka_topk

    rng = np.random.default_rng(11)
    rows = [
        (i, [int(x) for x in rng.integers(-5, 6, 8)]) for i in range(40)
    ]
    codes = spark.createDataFrame(rows, "vec_id long, codes array<long>")
    queries = codes.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qcodes")
    )
    got = {
        (r.query_id, r.rk): r.vec_id
        for r in matryoshka_topk(
            codes, queries, prefix_dim=8, k_coarse=1000, k=5
        ).collect()
    }
    brute = (
        codes.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            cosine_col("codes", "qcodes").alias("cos"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cos"), F.asc("vec_id")
                )
            ),
        )
        .filter(F.col("rk") <= 5)
    )
    want = {(r.query_id, r.rk): r.vec_id for r in brute.collect()}
    assert got == want


def test_matryoshka_reranked_are_coarse_survivors(spark):
    """Every returned row must come from the coarse top-k_coarse of its
    query (the cascade can only narrow, never resurrect)."""
    import numpy as np

    from pyspark.sql import functions as F
    from spark_tensors_spark.pipeline.similarity import matryoshka_topk

    rng = np.random.default_rng(12)
    rows = [
        (i, [int(x) for x in rng.integers(-5, 6, 8)]) for i in range(60)
    ]
    codes = spark.createDataFrame(rows, "vec_id long, codes array<long>")
    queries = codes.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qcodes")
    )
    out = matryoshka_topk(
        codes, queries, prefix_dim=4, k_coarse=10, k=10
    ).collect()
    assert 0 < len(out) <= 10
    # coarse stage replicated by hand on the prefix dots
    qvec = np.array(rows[0][1][:4])
    dots = {
        i: int(np.dot(np.array(v[:4]), qvec)) for i, v in rows if i != 0
    }
    coarse10 = set(
        sorted(dots, key=lambda i: (-dots[i], i))[:10]
    )
    assert {r.vec_id for r in out} <= coarse10
