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


def test_zscore_outliers_hand_case(spark):
    """One user with a known spike: exact z for the outlier row and
    zero-variance keys excluded."""
    import math

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 5 + [2] * 3,
            "event_id": list(range(8)),
            "value": [10.0, 10.0, 10.0, 10.0, 30.0, 5.0, 5.0, 5.0],
        }
    )
    df = spark.createDataFrame(pdf, "user_id long, event_id long, value double")
    rows = Q.zscore_outliers(df, ["user_id"], threshold=1.9).collect()
    # user 2 (constant -> sigma 0) excluded entirely
    assert {r.user_id for r in rows} == {1}
    out = {r.event_id: r.z for r in rows}
    # mean 14, var = (4*16 + 256)/5 = 64, sigma 8 -> z(30) = 2.0
    assert set(out) == {4}
    assert math.isclose(out[4], 2.0, abs_tol=1e-12)


def test_validate_zero_rows_audits_clean(spark):
    """A zero-row table vacuously satisfies every rule: violations must
    audit as 0 (not NULL from a SUM over no rows) so an empty staged
    WAP snapshot can publish (ADVICE r7)."""
    from pyspark.sql import functions as F

    from spark_tensors_spark.operators.quality import validate

    empty = spark.range(0).select(F.col("id").alias("k"))
    rows = validate(
        empty,
        [
            {"kind": "not_null", "column": "k"},
            {"kind": "unique", "column": "k"},
        ],
    ).collect()
    assert [r.n_violations for r in rows] == [0, 0]
    assert all(r.n_rows == 0 for r in rows)


def test_wap_publishes_empty_snapshot(spark, tmp_path):
    """write_audit_publish of a batch that deletes every row: the
    merged snapshot is EMPTY yet passes a rule set it vacuously
    satisfies, so it publishes (regression: NULL n_violations blocked
    empty snapshots forever)."""
    import os

    import pandas as pd

    from spark_tensors_spark.operators.merge import read_merged
    from spark_tensors_spark.operators.wap import write_audit_publish

    path = os.path.join(str(tmp_path), "t")
    rules = [{"kind": "not_null", "column": "val"}]

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "val", "is_delete"]),
            "k long, val string, is_delete boolean",
        )

    ok, v, _ = write_audit_publish(
        spark, path, batch([(1, "a", False)]), ["k"], rules,
        delete_col="is_delete",
    )
    assert ok and v == 0
    ok, v, audit = write_audit_publish(
        spark, path, batch([(1, "a", True)]), ["k"], rules,
        delete_col="is_delete",
    )
    assert ok and v == 1
    assert [r.n_violations for r in audit] == [0]
    assert read_merged(spark, path).count() == 0


def test_wap_rollback_reverts_and_keeps_history(spark, tmp_path):
    """rollback_to_version publishes a COPY of the target as the newest
    version: readers revert, the regretted version stays addressable,
    and rolling back to a bad version id raises."""
    import os

    import pandas as pd
    import pytest

    from spark_tensors_spark.operators.merge import _versions, read_merged
    from spark_tensors_spark.operators.wap import (
        rollback_to_version,
        write_audit_publish,
    )

    path = os.path.join(str(tmp_path), "t")
    rules = [{"kind": "not_null", "column": "val"}]

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "val"]), "k long, val string"
        )

    ok, v, _ = write_audit_publish(
        spark, path, batch([(1, "a"), (2, "b")]), ["k"], rules
    )
    assert ok and v == 0
    ok, v, _ = write_audit_publish(
        spark, path, batch([(2, "REGRET"), (3, "c")]), ["k"], rules
    )
    assert ok and v == 1

    new_v = rollback_to_version(path, 0)
    assert new_v == 2
    assert _versions(path) == [0, 1, 2]
    # readers are back on v0's state
    assert {(r.k, r.val) for r in read_merged(spark, path).collect()} == {
        (1, "a"), (2, "b")
    }
    # the regretted version remains addressable (time travel / forensics)
    assert {
        (r.k, r.val)
        for r in spark.read.parquet(
            os.path.join(path, "_v=1")
        ).collect()
    } == {(1, "a"), (2, "REGRET"), (3, "c")}
    # no stage dirs left behind
    assert not [d for d in os.listdir(path) if d.startswith("wap_stage.")]

    with pytest.raises(ValueError):
        rollback_to_version(path, 99)
