"""Differential oracle tests for the KG surface Q14–Q19 + tensor blocks."""

from __future__ import annotations

import pytest

from spark_tensors_spark.queries import kg
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_connection

# KG queries derive the graph from the star schema; sf0.001 keeps the
# encode joins fast in unit tests (driver runs sf0.01 itself).
SF = SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


# parametrize over ORACLES, not QUERIES: the deliberately-unoracled
# score queries (kg_distmult_scores, kg_complex_scores) have no SQL
# counterpart and are covered by tests/test_models.py property tests.
@pytest.mark.parametrize("name", sorted(kg.ORACLES))
def test_kg_query_matches_oracle(spark, duck, name):
    ok, detail = compare(
        kg.QUERIES[name], kg.ORACLES[name], spark, SF, con=duck
    )
    assert ok, f"{name}: {detail}"
