"""Differential oracle tests for Q1–Q13 (SURVEY §5.2 item 1)."""

from __future__ import annotations

import pytest

from spark_tensors_spark.queries import relational
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_query_matches_oracle(spark, duck, name):
    ok, detail = compare(
        relational.QUERIES[name],
        relational.ORACLES[name],
        spark,
        SF_ORACLE,
        con=duck,
    )
    assert ok, f"{name}: {detail}"
