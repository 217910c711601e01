"""MERGE INTO (SCD1 upsert) tests: update/insert/delete semantics,
latest-wins inside the batch, snapshot versioning + crash safety."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from spark_tensors_spark.operators.merge import (
    merge_into_parquet,
    merge_upsert,
    read_merged,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "val", "ver"]),
        "k long, val string, ver long",
    )


def test_merge_upsert_update_insert(spark):
    target = _df(spark, [(1, "a", 0), (2, "b", 0)])
    updates = _df(spark, [(2, "B", 1), (3, "c", 1)])
    got = sorted(
        (r.k, r.val) for r in merge_upsert(target, updates, ["k"]).collect()
    )
    assert got == [(1, "a"), (2, "B"), (3, "c")]


def test_merge_upsert_latest_wins_in_batch(spark):
    target = _df(spark, [(1, "a", 0)])
    updates = _df(spark, [(1, "mid", 5), (1, "new", 9), (1, "old", 2)])
    got = {r.k: (r.val, r.ver)
           for r in merge_upsert(target, updates, ["k"],
                                 order_col="ver").collect()}
    assert got == {1: ("new", 9)}


def test_merge_upsert_deletes(spark):
    target = _df(spark, [(1, "a", 0), (2, "b", 0)])
    updates = spark.createDataFrame(
        pd.DataFrame(
            [(2, "x", 1, True), (3, "c", 1, False)],
            columns=["k", "val", "ver", "is_delete"],
        ),
        "k long, val string, ver long, is_delete boolean",
    )
    got = sorted(
        (r.k, r.val)
        for r in merge_upsert(
            target, updates, ["k"], delete_col="is_delete"
        ).collect()
    )
    assert got == [(1, "a"), (3, "c")]


def test_merge_into_parquet_versions_and_crash_safety(spark, tmp_path):
    path = str(tmp_path / "dim")
    v0 = merge_into_parquet(spark, path, _df(spark, [(1, "a", 0)]), ["k"])
    assert v0 == 0
    v1 = merge_into_parquet(
        spark, path, _df(spark, [(1, "A", 1), (2, "b", 1)]), ["k"]
    )
    assert v1 == 1
    got = sorted((r.k, r.val) for r in read_merged(spark, path).collect())
    assert got == [(1, "A"), (2, "b")]
    # a crashed merge (no _SUCCESS) is invisible to readers
    os.makedirs(os.path.join(path, "_v=2"), exist_ok=True)
    with open(os.path.join(path, "_v=2", "part-junk.parquet"), "wb") as f:
        f.write(b"garbage")
    got2 = sorted((r.k, r.val) for r in read_merged(spark, path).collect())
    assert got2 == got
    # the retry overwrites the partial snapshot
    v2 = merge_into_parquet(spark, path, _df(spark, [(2, "B2", 2)]), ["k"])
    assert v2 == 2
    got3 = sorted((r.k, r.val) for r in read_merged(spark, path).collect())
    assert got3 == [(1, "A"), (2, "B2")]


def test_read_merged_missing(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_merged(spark, str(tmp_path / "nope"))


def test_merge_upsert_randomized_vs_dict_reference(spark):
    """Property: merge_upsert over random target/update batches equals
    the obvious dict-based merge (latest-wins by (ver, val) inside the
    batch)."""
    import random

    rng = random.Random(13)
    for trial in range(5):
        tgt = {k: (f"t{rng.randint(0, 9)}", 0)
               for k in rng.sample(range(12), rng.randint(0, 8))}
        ups = [
            (k, f"u{rng.randint(0, 9)}", rng.randint(1, 5))
            for k in (rng.choice(range(12))
                      for _ in range(rng.randint(0, 10)))
        ]
        target = _df(spark, [(k, v, ver) for k, (v, ver) in tgt.items()])
        updates = _df(spark, ups)
        got = {r.k: (r.val, r.ver)
               for r in merge_upsert(target, updates, ["k"],
                                     order_col="ver").collect()}
        want = dict(tgt)
        best = {}
        for k, v, ver in ups:
            # latest-wins by ver DESC; within a ver tie the window's
            # remaining columns sort ASCENDING, so the SMALLEST val
            # wins the row_number
            if (
                k not in best
                or ver > best[k][0]
                or (ver == best[k][0] and v < best[k][1])
            ):
                best[k] = (ver, v)
        for k, (ver, v) in best.items():
            want[k] = (v, ver)
        assert got == want, (trial, got, want)


def test_merge_into_parquet_fresh_create_with_deletes(spark, tmp_path):
    """r6 ADVICE (medium): the FIRST merge into a nonexistent table
    with delete_col set used to crash — the synthesized empty target
    carried the delete-flag column, which the final projection onto
    the target schema could not resolve.  Deletes in the very first
    batch simply never materialize."""
    path = os.path.join(str(tmp_path), "t")
    updates = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", 0, False), (2, "x", 0, True), (3, "c", 0, False)],
            columns=["k", "val", "ver", "is_delete"],
        ),
        "k long, val string, ver long, is_delete boolean",
    )
    v = merge_into_parquet(
        spark, path, updates, ["k"],
        order_col="ver", delete_col="is_delete",
    )
    assert v == 0
    got = sorted((r.k, r.val) for r in read_merged(spark, path).collect())
    assert got == [(1, "a"), (3, "c")]
    assert "is_delete" not in read_merged(spark, path).columns


def test_merge_upsert_duplicate_keys_without_order_col(spark):
    """r6 ADVICE (low): duplicate-key updates with order_col=None used
    to silently insert MULTIPLE rows per key.  Now they collapse to
    one row via the deterministic all-remaining-columns ascending
    tie-break (smallest val wins here)."""
    target = _df(spark, [(1, "a", 0)])
    updates = _df(spark, [(1, "zz", 7), (1, "bb", 3), (2, "c", 1)])
    out = merge_upsert(target, updates, ["k"]).collect()
    assert len(out) == 2
    got = {r.k: r.val for r in out}
    assert got == {1: "bb", 2: "c"}


def test_merge_upsert_in_batch_tie_breaks_deterministic(spark):
    """Two updates with the SAME key and version: the smallest
    remaining-column value wins (the window's ascending tie-break) —
    pinned explicitly since random batches rarely collide."""
    target = _df(spark, [(1, "a", 0)])
    updates = _df(spark, [(1, "zz", 7), (1, "bb", 7), (1, "mm", 7)])
    got = {r.k: (r.val, r.ver)
           for r in merge_upsert(target, updates, ["k"],
                                 order_col="ver").collect()}
    assert got == {1: ("bb", 7)}


def test_read_merged_time_travel(spark, tmp_path):
    """Every committed snapshot stays addressable: version=n reads the
    table state after the n-th merge; an unknown version raises."""
    path = os.path.join(str(tmp_path), "t")
    merge_into_parquet(spark, path, _df(spark, [(1, "a", 0)]), ["k"])
    merge_into_parquet(
        spark, path, _df(spark, [(1, "A", 1), (2, "b", 1)]), ["k"]
    )
    v0 = {(r.k, r.val) for r in read_merged(spark, path, 0).collect()}
    v1 = {(r.k, r.val) for r in read_merged(spark, path).collect()}
    assert v0 == {(1, "a")}
    assert v1 == {(1, "A"), (2, "b")}
    with pytest.raises(FileNotFoundError):
        read_merged(spark, path, 7)


def test_merge_upsert_schema_evolution(spark):
    """evolve_schema=True: the merged schema is the union of both
    sides — target rows get NULL for new update columns, inserted
    updates get NULL for legacy target columns; a type conflict
    raises; default (False) still fails fast on drift."""
    target = _df(spark, [(1, "a", 0), (2, "b", 0)])
    updates = spark.createDataFrame(
        pd.DataFrame(
            [(2, "B", 1, "eu"), (3, "c", 1, "us")],
            columns=["k", "val", "ver", "region"],
        ),
        "k long, val string, ver long, region string",
    )
    out = merge_upsert(target, updates, ["k"], evolve_schema=True)
    assert sorted(out.columns) == ["k", "region", "val", "ver"]
    got = {r.k: (r.val, r.region) for r in out.collect()}
    assert got == {1: ("a", None), 2: ("B", "eu"), 3: ("c", "us")}
    # updates may also LACK target columns (dropped upstream)
    updates2 = spark.createDataFrame(
        pd.DataFrame([(1, "A2")], columns=["k", "val"]),
        "k long, val string",
    )
    out2 = merge_upsert(target, updates2, ["k"], evolve_schema=True)
    got2 = {r.k: (r.val, r.ver) for r in out2.collect()}
    assert got2 == {1: ("A2", None), 2: ("b", 0)}
    # type conflict is an error, not a silent cast
    bad = spark.createDataFrame(
        pd.DataFrame([(1, 5, 1)], columns=["k", "val", "ver"]),
        "k long, val long, ver long",
    )
    with pytest.raises(TypeError):
        merge_upsert(target, bad, ["k"], evolve_schema=True)
    # and without opting in, drift still fails fast
    with pytest.raises(Exception):
        merge_upsert(target, updates, ["k"]).collect()


def test_merge_into_parquet_schema_evolution(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    merge_into_parquet(spark, path, _df(spark, [(1, "a", 0)]), ["k"])
    upd = spark.createDataFrame(
        pd.DataFrame([(2, "b", 1, 9.5)],
                     columns=["k", "val", "ver", "score"]),
        "k long, val string, ver long, score double",
    )
    merge_into_parquet(spark, path, upd, ["k"], evolve_schema=True)
    got = {r.k: (r.val, r.score)
           for r in read_merged(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_table_diff_classifies_changes(spark):
    """Keyed diff: insert / delete / update classification with
    null-safe value comparison; unchanged keys are omitted."""
    from spark_tensors_spark.operators.merge import table_diff

    old = _df(spark, [(1, "a", 0), (2, "b", 0), (3, None, 0)])
    new = _df(spark, [(2, "B", 1), (3, None, 0), (4, "d", 1)])
    out = {r.change: r for r in []}
    rows = table_diff(old, new, ["k"]).collect()
    got = {r.k: (r.change, r.old_val, r.new_val) for r in rows}
    # key 3 is unchanged (NULL == NULL null-safely) and omitted
    assert got == {
        1: ("delete", "a", None),
        2: ("update", "b", "B"),
        4: ("insert", None, "d"),
    }
    with pytest.raises(ValueError):
        table_diff(old, new.drop("ver"), ["k"])
