"""assign_ids (A12): dense-id assignment without a global sort, and the
driver-side boundary-sample bound (SCALE.md: the sample must stay
~constant as the dictionary grows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_tensors_spark.kg.dictionary import (
    MAX_BOUNDARY_SAMPLE,
    _bounded_sample_mod,
    assign_ids,
)


def test_bounded_sample_mod_caps_driver_sample():
    # small dictionaries keep the base rate
    assert _bounded_sample_mod(10_000, 101) == 101
    # 10M distinct URIs: expected sample n/mod must stay ≤ the cap
    for n in (10_000_000, 1_000_000_000, 100_000_000_000):
        mod = _bounded_sample_mod(n, 101)
        assert n / mod <= MAX_BOUNDARY_SAMPLE, (n, mod)
    # the base rate wins while it is already sparse enough
    assert _bounded_sample_mod(10_000_000, 101) == 101
    assert _bounded_sample_mod(1_000_000_000, 101) == 10_000


def test_assign_ids_equals_global_row_number(spark):
    uris = spark.createDataFrame(
        [(f"urn:e{i % 700:05d}",) for i in range(2100)], "uri string"
    )
    got = {r["uri"]: r["id"] for r in assign_ids(uris).collect()}
    expect = {u: i for i, u in enumerate(sorted({f"urn:e{i:05d}" for i in range(700)}))}
    assert got == expect


def test_assign_ids_dense_and_total(spark):
    # non-uniform strings exercise the sampled range boundaries
    vals = [(f"x{'a' * (i % 13)}{i}",) for i in range(3000)]
    ids = assign_ids(spark.createDataFrame(vals, "uri string")).collect()
    n = len({v[0] for v in vals})
    assert sorted(r["id"] for r in ids) == list(range(n))
    by_uri = sorted(ids, key=lambda r: r["uri"])
    assert [r["id"] for r in by_uri] == list(range(n))
