"""Unit tests for operators/profile.py (the oracle only sees events)."""
from __future__ import annotations


def test_profile_nulls_types_and_single_scan(spark):
    import pandas as pd

    from spark_tensors_spark.operators.profile import profile

    pdf = pd.DataFrame(
        {
            "k": [1, 2, 2, None],
            "name": ["b", None, "a", "a"],
            "score": [1.5, None, None, 4.0],
        }
    )
    df = spark.createDataFrame(
        pdf, "k long, name string, score double"
    )
    out = {r.col: r for r in profile(df).collect()}
    assert set(out) == {"k", "name", "score"}
    assert all(r.n_rows == 4 for r in out.values())
    assert out["k"].n_nulls == 1 and out["k"].n_distinct == 2
    assert (out["k"].min_num, out["k"].max_num) == (1.0, 2.0)
    assert out["k"].min_str == "" and out["k"].max_str == ""
    assert out["name"].n_nulls == 1 and out["name"].n_distinct == 2
    assert (out["name"].min_str, out["name"].max_str) == ("a", "b")
    assert out["name"].min_num == -1.0  # sentinel, never NULL
    assert out["score"].n_nulls == 2
    assert (out["score"].min_num, out["score"].max_num) == (1.5, 4.0)
