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
