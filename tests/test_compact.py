"""Table maintenance: small-file compaction (io/compact.py) and
snapshot vacuum (operators/merge.vacuum)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from spark_tensors_spark.io.compact import (
    compact_parquet,
    plan_target_files,
)
from spark_tensors_spark.operators.merge import (
    _versions,
    merge_into_parquet,
    read_merged,
    vacuum,
)


def test_plan_target_files():
    assert plan_target_files(0, 100) == 1
    assert plan_target_files(99, 100) == 1
    assert plan_target_files(100, 100) == 1
    assert plan_target_files(101, 100) == 2
    assert plan_target_files(1000, 100) == 10
    with pytest.raises(ValueError):
        plan_target_files(1, 0)


def test_compact_parquet_preserves_content(spark, tmp_path):
    path = str(tmp_path / "t")
    # 8 tiny files (one per append)
    for i in range(8):
        spark.createDataFrame(
            pd.DataFrame({"k": [i], "v": [i * 10]}), "k long, v long"
        ).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path).orderBy("k").collect()
    n_before, n_after = compact_parquet(spark, path, target_bytes=10**9)
    assert n_before == 8 and n_after == 1
    after = spark.read.parquet(path).orderBy("k").collect()
    assert after == before
    # idempotent: already compact -> no rewrite
    assert compact_parquet(spark, path, target_bytes=10**9) == (1, 1)
    # no leftover temp/old directories
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__old__")


def test_vacuum_keeps_latest(spark, tmp_path):
    path = str(tmp_path / "t")

    def df(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "v"]), "k long, v long"
        )

    for i in range(4):
        merge_into_parquet(spark, path, df([(1, i)]), ["k"])
    assert _versions(path) == [0, 1, 2, 3]
    dropped = vacuum(path, keep_last=2)
    assert dropped == [0, 1]
    assert _versions(path) == [2, 3]
    assert {r.v for r in read_merged(spark, path).collect()} == {3}
    # time travel to a kept version still works, vacuumed one raises
    assert {r.v for r in read_merged(spark, path, 2).collect()} == {2}
    with pytest.raises(FileNotFoundError):
        read_merged(spark, path, 0)
    with pytest.raises(ValueError):
        vacuum(path, keep_last=0)


def test_purge_keys_erases_from_all_versions(spark, tmp_path):
    """Privacy erase: the key disappears from EVERY snapshot —
    including the ones time travel can still read — while other rows
    and the version numbering survive."""
    from spark_tensors_spark.operators.merge import purge_keys

    path = str(tmp_path / "t")

    def df(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "v"]), "k long, v string"
        )

    merge_into_parquet(spark, path, df([(1, "a"), (2, "b")]), ["k"])
    merge_into_parquet(spark, path, df([(1, "A"), (3, "c")]), ["k"])
    assert purge_keys(spark, path, "k", [1]) == 2
    assert _versions(path) == [0, 1]
    v0 = {(r.k, r.v) for r in read_merged(spark, path, 0).collect()}
    v1 = {(r.k, r.v) for r in read_merged(spark, path, 1).collect()}
    assert v0 == {(2, "b")}
    assert v1 == {(2, "b"), (3, "c")}
    # idempotent; later merges keep working
    assert purge_keys(spark, path, "k", [1]) == 2
    merge_into_parquet(spark, path, df([(4, "d")]), ["k"])
    assert _versions(path) == [0, 1, 2]
