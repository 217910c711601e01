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
