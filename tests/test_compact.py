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


def test_purge_keys_keeps_null_keys_and_crash_leftovers_ignored(
    spark, tmp_path
):
    """Review findings: (1) NULL-key rows are never purge collateral
    (~isin(NULL) is NULL — a bare filter would drop them); (2) crash
    leftover dirs must not brick _versions()/read_merged."""
    from spark_tensors_spark.operators.merge import purge_keys

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        pd.DataFrame(
            [(None, "n"), (1, "a"), (2, "b")], columns=["k", "v"]
        ),
        "k long, v string",
    )
    merge_into_parquet(spark, path, df, ["k"])
    purge_keys(spark, path, "k", [1])
    got = {(r.k, r.v) for r in read_merged(spark, path).collect()}
    assert got == {(None, "n"), (2, "b")}
    # a crashed purge's leftovers use non-`_v=` prefixes; even a stray
    # `_v=junk` dir with _SUCCESS must be ignored, not ValueError
    os.makedirs(os.path.join(path, "purge_old._v=0"))
    open(os.path.join(path, "purge_old._v=0", "_SUCCESS"), "w").close()
    os.makedirs(os.path.join(path, "_v=junk"))
    open(os.path.join(path, "_v=junk", "_SUCCESS"), "w").close()
    assert _versions(path) == [0]
    assert read_merged(spark, path).count() == 2


def test_vacuum_removes_stale_incomplete_snapshots(spark, tmp_path):
    """An incomplete `_v=<n>` at or below the newest COMPLETE version
    is a dead crashed merge (new merges always write newest+1) —
    vacuum reclaims it; an incomplete one ABOVE newest may be
    in-flight and is left alone."""
    path = str(tmp_path / "t")

    def df(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["k", "v"]), "k long, v long"
        )

    for i in range(3):
        merge_into_parquet(spark, path, df([(1, i)]), ["k"])
    # dead incomplete below newest; in-flight incomplete above newest
    os.makedirs(os.path.join(path, "_v=1x"), exist_ok=True)
    shutil = __import__("shutil")
    shutil.rmtree(os.path.join(path, "_v=1"))
    os.makedirs(os.path.join(path, "_v=1"))  # incomplete (no _SUCCESS)
    os.makedirs(os.path.join(path, "_v=9"))  # incomplete, above newest
    dropped = vacuum(path, keep_last=2)
    assert dropped == []               # completes are [0, 2], both kept
    left = sorted(os.listdir(path))
    assert "_v=1" not in left          # dead incomplete reclaimed
    assert "_v=9" in left              # possible in-flight kept
    assert {"_v=0", "_v=2"} <= set(left)
    assert _versions(path) == [0, 2]
