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
    out = {r.col: r for r in profile(df, exact=True).collect()}
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


def test_profile_approx_path_no_expand(spark):
    """The default (approx) profiler plans WITHOUT an Expand node —
    exact countDistinct replicates the input once per distinct
    aggregate (a 20-column profile scans 20x the rows), which is the
    100 TB reason approx_count_distinct is the default.  Small-
    cardinality approx counts are exact (HLL++ at rsd 0.01 below its
    sparse threshold)."""
    import pandas as pd

    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.operators.profile import _profile_agg, profile
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def agg_plan(df):
        # the profiler's single scan-side aggregate (pre-checkpoint)
        return df._jdf.queryExecution().executedPlan().toString()

    assert "Expand" not in agg_plan(_profile_agg(ev, cols, exact=False))
    assert "Expand" in agg_plan(_profile_agg(ev, cols, exact=True))
    # tiny frame: approx == exact counts (approx is OPT-IN — the
    # default stays exact per r6 ADVICE)
    pdf = pd.DataFrame({"k": [1, 2, 2, None], "s": ["a", "b", "b", "c"]})
    df = spark.createDataFrame(pdf, "k long, s string")
    got = {r.col: r.n_distinct
           for r in profile(df, exact=False).collect()}
    assert got == {"k": 2, "s": 3}
