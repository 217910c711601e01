"""Merge-on-read deletion-vector tables (operators/mor.py): delta-only
writes, highest-sequence-wins reconciliation, revive/kill ordering,
compaction equivalence, crash-leftover invisibility, parity with the
copy-on-write merge."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.operators.mor import (
    compact,
    init_mor,
    mor_delete,
    mor_upsert,
    read_mor,
)

SCHEMA = "k long, v string, n long"


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "v", "n"]), SCHEMA
    )


def _snap(df):
    return sorted((r.k, r.v, r.n) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "mor")
    init_mor(
        _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]),
        path,
    )
    return path


def test_base_roundtrip(spark, table):
    assert _snap(read_mor(spark, table, ["k"])) == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)
    ]


def test_delete_then_upsert_revives(spark, table):
    mor_delete(_df(spark, [(2, "x", 0), (3, "x", 0)]), table, ["k"])
    assert _snap(read_mor(spark, table, ["k"])) == [
        (1, "a", 10), (4, "d", 40)
    ]
    mor_upsert(_df(spark, [(3, "C", 300), (5, "e", 50)]), table, ["k"])
    assert _snap(read_mor(spark, table, ["k"])) == [
        (1, "a", 10), (3, "C", 300), (4, "d", 40), (5, "e", 50)
    ]


def test_upsert_then_delete_kills(spark, table):
    mor_upsert(_df(spark, [(1, "A", 100)]), table, ["k"])
    mor_delete(_df(spark, [(1, "x", 0)]), table, ["k"])
    assert _snap(read_mor(spark, table, ["k"])) == [
        (2, "b", 20), (3, "c", 30), (4, "d", 40)
    ]


def test_within_batch_latest_wins(spark, table):
    mor_upsert(
        _df(spark, [(2, "old", 1), (2, "new", 2)]), table, ["k"],
        order_col="n",
    )
    got = dict((r.k, (r.v, r.n)) for r in read_mor(spark, table, ["k"]).collect())
    assert got[2] == ("new", 2)


def test_compaction_preserves_reads_and_drops_deltas(spark, table):
    mor_delete(_df(spark, [(4, "x", 0)]), table, ["k"])
    mor_upsert(_df(spark, [(1, "A", 100), (9, "i", 90)]), table, ["k"])
    before = _snap(read_mor(spark, table, ["k"]))
    compact(spark, table, ["k"])
    assert _snap(read_mor(spark, table, ["k"])) == before
    assert not [d for d in os.listdir(table) if d.startswith("_d=")]
    # and the table stays mutable after compaction
    mor_delete(_df(spark, [(1, "x", 0)]), table, ["k"])
    assert (1,) not in [
        (r.k,) for r in read_mor(spark, table, ["k"]).collect()
    ]


def test_uncommitted_delta_is_invisible(spark, table):
    seq = mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"])
    os.remove(os.path.join(table, f"_d={seq}", "_SUCCESS"))
    assert _snap(read_mor(spark, table, ["k"])) == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)
    ]


def test_matches_copy_on_write_merge(spark, table):
    """MoR read ≡ the CoW merge_upsert applied to the same batches."""
    from spark_tensors_spark.operators.merge import merge_upsert

    ups = _df(spark, [(2, "B", 200), (6, "f", 60)])
    dels = _df(spark, [(3, "x", 0)])
    mor_upsert(ups, table, ["k"])
    mor_delete(dels, table, ["k"])

    base = _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)])
    cow = merge_upsert(base, ups, ["k"])
    cow = cow.join(dels.select("k"), ["k"], "left_anti")
    assert _snap(read_mor(spark, table, ["k"])) == _snap(cow)


def test_explicit_seq_replay_is_a_noop(spark, table):
    """foreachBatch-style callers pass the batch id as seq: replaying
    an already-committed sequence must change nothing — in particular
    it must NOT land after later commits and resurrect deleted rows."""
    s0 = mor_upsert(_df(spark, [(2, "B", 200)]), table, ["k"], seq=10)
    s1 = mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"], seq=11)
    assert (s0, s1) == (10, 11)
    before = _snap(read_mor(spark, table, ["k"]))
    assert (2, "B", 200) not in before  # deleted by seq 11
    # crash-and-retry of the upsert batch: same seq -> no-op
    assert mor_upsert(_df(spark, [(2, "B", 200)]), table, ["k"], seq=10) == 10
    assert _snap(read_mor(spark, table, ["k"])) == before


def test_within_batch_dedupe_deterministic_without_order_col(spark, table):
    """Duplicate keys in one upsert batch must resolve deterministically
    even with order_col=None (all-columns-desc tiebreak)."""
    mor_upsert(_df(spark, [(3, "p", 1), (3, "q", 1)]), table, ["k"])
    got = dict((r.k, r.v) for r in read_mor(spark, table, ["k"]).collect())
    assert got[3] == "q"  # greatest under all-columns-desc


def test_reserved_column_names_rejected(spark, tmp_path):
    """A base or batch carrying _op/_seq/_rn would silently corrupt
    reconciliation — init/read/upsert must fail loudly instead."""
    bad = spark.createDataFrame(
        pd.DataFrame({"k": [1], "_op": ["U"]}), "k long, _op string"
    )
    with pytest.raises(ValueError, match="reserved"):
        init_mor(bad, str(tmp_path / "m1"))
    path = str(tmp_path / "m2")
    init_mor(_df(spark, [(1, "a", 10)]), path)
    with pytest.raises(ValueError, match="reserved"):
        mor_upsert(bad, path, ["k"])


def test_read_survives_compact_rename_window(spark, table):
    """Simulate a crash between compact's two renames (base gone,
    base.old + deltas present): read_mor must fall back to base.old and
    reconstruct the exact pre-compaction state; the next compact()
    repairs the layout via _recover and folds normally."""
    mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"])
    mor_upsert(_df(spark, [(5, "e", 50)]), table, ["k"])
    want = _snap(read_mor(spark, table, ["k"]))

    os.rename(os.path.join(table, "base"), os.path.join(table, "base.old"))
    assert _snap(read_mor(spark, table, ["k"])) == want  # reader fallback

    compact(spark, table, ["k"])  # writer-side recovery + fold
    assert os.path.isdir(os.path.join(table, "base"))
    assert not os.path.isdir(os.path.join(table, "base.old"))
    assert _snap(read_mor(spark, table, ["k"])) == want


def test_compact_folds_and_deletes_only_captured_seqs(spark, table, monkeypatch):
    """A delta committed AFTER compact captured its seq set must survive
    unfolded (never deleted without being folded in)."""
    import spark_tensors_spark.operators.mor as M

    mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"])  # seq 0: captured

    real_read = M.read_mor
    def read_and_race(spark_, path, key_cols, seqs=None):
        out = real_read(spark_, path, key_cols, seqs=seqs)
        # concurrent writer lands seq 1 while the fold materializes
        mor_upsert(_df(spark_, [(9, "z", 90)]), path, ["k"], seq=1)
        return out

    monkeypatch.setattr(M, "read_mor", read_and_race)
    M.compact(spark, table, ["k"])
    monkeypatch.undo()

    assert M._deltas(table) == [1]  # the racing delta survived
    got = _snap(read_mor(spark, table, ["k"]))
    assert (9, "z", 90) in got and (2, "b", 20) not in got


def test_init_during_crash_window_recovers_not_reinits(spark, table):
    """In compact's rename window base/ is missing — a bootstrapping
    'init if absent' must NOT create a fresh base beside the live
    base.old + deltas (stale deltas would fold into unrelated data);
    every writer entry point recovers first."""
    mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"])
    want = _snap(read_mor(spark, table, ["k"]))
    os.rename(os.path.join(table, "base"), os.path.join(table, "base.old"))

    with pytest.raises(FileExistsError):
        init_mor(_df(spark, [(99, "zz", 0)]), table)
    assert os.path.isdir(os.path.join(table, "base"))  # recovered
    assert _snap(read_mor(spark, table, ["k"])) == want

    # delta commits also recover first
    os.rename(os.path.join(table, "base"), os.path.join(table, "base.old"))
    mor_upsert(_df(spark, [(7, "g", 70)]), table, ["k"])
    assert os.path.isdir(os.path.join(table, "base"))
    assert (7, "g", 70) in _snap(read_mor(spark, table, ["k"]))
