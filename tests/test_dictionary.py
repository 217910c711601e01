"""assign_ids (A12): dense-id assignment without a global sort, and the
driver-side boundary-sample bound (SCALE.md: the sample must stay
~constant as the dictionary grows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_tensors_spark.kg import dictionary
from spark_tensors_spark.kg.dictionary import assign_ids


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


def test_bucketed_ids_bijective_and_stable(spark):
    """mode='bucketed': one unique id per distinct uri, identical ids
    across two independent builds (pure function of the value set), and
    ids decompose as bucket·2^40 + dense per-bucket rank."""
    vals = [(f"x{'a' * (i % 13)}{i % 900}",) for i in range(2700)]
    uris = spark.createDataFrame(vals, "uri string")
    a = {r["uri"]: r["id"] for r in
         assign_ids(uris, mode="bucketed").collect()}
    b = {r["uri"]: r["id"] for r in
         assign_ids(uris, mode="bucketed").collect()}
    n = len({v[0] for v in vals})
    assert len(a) == n and len(set(a.values())) == n  # bijective
    assert a == b  # stable
    # two-level structure: per-bucket local ranks are dense from 0
    from collections import defaultdict

    per_bucket = defaultdict(list)
    for i in a.values():
        per_bucket[i >> dictionary.ID_BUCKET_BITS].append(
            i & ((1 << dictionary.ID_BUCKET_BITS) - 1)
        )
    for locals_ in per_bucket.values():
        assert sorted(locals_) == list(range(len(locals_)))


def test_bucketed_ids_no_driver_collect(spark, monkeypatch):
    """The 100 TB property: bucketed assignment performs ZERO driver
    collects (no boundary sample, no count pass) before the caller's
    own action."""
    from pyspark.sql.classic.dataframe import DataFrame as SparkDF

    orig_collect = SparkDF.collect
    seen = []

    def spy(self):
        seen.append(1)
        return orig_collect(self)

    monkeypatch.setattr(SparkDF, "collect", spy)
    uris = spark.createDataFrame(
        [(f"urn:b{i:04d}",) for i in range(500)], "uri string"
    )
    df = assign_ids(uris, mode="bucketed")
    assert seen == []  # plan construction triggered nothing
    rows = orig_collect(df)
    assert len(rows) == 500
    assert seen == []  # ...and execution needed no internal collects


def test_bucketed_roundtrip_matches_raw(spark):
    """encode→decode under bucketed dictionaries reproduces the triple
    set exactly."""
    from spark_tensors_spark.kg.dictionary import (
        build_dictionaries,
        decode_triples,
        encode_triples,
    )

    rows = [
        (f"s{i % 11}", f"p{i % 3}", f"o{(i * 7) % 13}") for i in range(200)
    ]
    raw = spark.createDataFrame(rows, "s string, p string, o string")
    ent, rel = build_dictionaries(raw, mode="bucketed")
    dec = decode_triples(encode_triples(raw, ent, rel), ent, rel)
    assert sorted(map(tuple, dec.collect())) == sorted(rows)


def test_boundary_probe_escalates_under_hard_cap(spark, monkeypatch):
    """The boundary sample is HARD-bounded by limit(MAX+1): with the
    cap forced down to 5 rows, a dictionary whose base-rate sample
    overflows must escalate the modulus, keep every probe ≤ cap+1
    rows, and STILL produce exact global-order ids (bucket boundaries
    never affect id values)."""
    monkeypatch.setattr(dictionary, "MAX_BOUNDARY_SAMPLE", 5)

    collected = []
    orig_collect = None
    from pyspark.sql.classic.dataframe import DataFrame as SparkDF

    orig_collect = SparkDF.collect

    def spy(self):
        rows = orig_collect(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(SparkDF, "collect", spy)
    vals = sorted({f"urn:v{i:05d}" for i in range(4000)})
    got = {
        r["uri"]: r["id"]
        for r in orig_collect(
            assign_ids(
                spark.createDataFrame([(v,) for v in vals], "uri string")
            )
        )
    }
    # the base 1/101 rate yields ~40 rows > 5 → at least one escalation,
    # and every probe collect stayed within the hard bound
    assert collected, "probe collects not observed"
    assert all(n <= 5 + 1 for n in collected), collected
    assert got == {u: i for i, u in enumerate(vals)}
