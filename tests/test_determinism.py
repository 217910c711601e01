"""Every declared query must be bit-deterministic across invocations in
one session — the driver hash-compares results, so any accidental
unseeded rand()/monotonically_increasing_id/partition-dependent id
would flap the CORRECTNESS gate.  Runs at sf0.001 for speed."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE
from tests.oracle_harness import normalize

SF = SF_SMOKE
QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_deterministic(spark, name):
    fn = QUERIES[name]
    a = fn(spark, SF)
    cols_a, rows_a = normalize(a.columns, [tuple(r) for r in a.collect()])
    b = fn(spark, SF)
    cols_b, rows_b = normalize(b.columns, [tuple(r) for r in b.collect()])
    assert cols_a == cols_b
    assert rows_a == rows_b, f"{name} changed between runs"
