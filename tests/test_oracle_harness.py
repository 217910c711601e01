"""Regression tests for the TYPE-FAITHFUL oracle harness (round 4).

The r3 driver gate failed three queries on a divergence the old local
harness could not see: an uncast integer SUM is HUGEINT in DuckDB,
arrives as float64 through the driver's pandas fetch, and stringifies
"6.0" vs Spark's BIGINT "6" — while Python's ``6.0 == 6`` made the
local compare pass.  These tests pin that the harness now fails
exactly like the driver does.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import _norm_cell, compare, run_duck


def test_hugeint_sum_reaches_comparison_as_float():
    """DuckDB HUGEINT must arrive type-distinct from BIGINT, exactly as
    it does through the driver's pandas fetch."""
    con = duckdb.connect()
    cols, rows = run_duck(
        con,
        "SELECT SUM(x) AS uncast, CAST(SUM(x) AS BIGINT) AS cast_ "
        "FROM (SELECT UNNEST([1,2,3]) AS x)",
    )
    con.close()
    uncast, cast_ = rows[0]
    assert _norm_cell(uncast) == ("f", "6.0")  # repr-encoded since r7
    assert _norm_cell(cast_) == ("i", 6)
    assert _norm_cell(uncast) != _norm_cell(cast_)


def test_int_float_cells_never_compare_equal():
    assert _norm_cell(6) != _norm_cell(6.0)
    assert _norm_cell(0) != _norm_cell(0.0)
    assert _norm_cell(True) != _norm_cell(1)
    # within a type class, 6-dp rounding still applies
    assert _norm_cell(1.0000004) == _norm_cell(1.0)
    assert _norm_cell((1, 2.0)) != _norm_cell((1, 2))


def test_compare_reproduces_r3_driver_failure_class(spark):
    """End-to-end: a Spark BIGINT aggregate vs an UNCAST oracle SUM must
    FAIL compare(); the BIGINT-cast oracle must pass — i.e. local green
    now predicts driver green for the r3 failure class."""
    from pyspark.sql import functions as F

    def q(sp, _sf):
        return (
            sp.range(5)
            .agg(F.sum("id").cast("long").alias("s"))
        )

    con = duckdb.connect()
    # documents view etc. are irrelevant; compare() only needs the SQL
    bad = "SELECT SUM(x) AS s FROM (SELECT UNNEST([0,1,2,3,4]) AS x)"
    good = ("SELECT CAST(SUM(x) AS BIGINT) AS s "
            "FROM (SELECT UNNEST([0,1,2,3,4]) AS x)")
    ok_bad, detail = compare(q, bad, spark, "unused", con=con)
    ok_good, _ = compare(q, good, spark, "unused", con=con)
    con.close()
    assert not ok_bad, detail
    assert "('f', '10.0')" in detail, detail  # repr-encoded since r7
    assert ok_good
