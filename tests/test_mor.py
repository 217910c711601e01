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
    from spark_tensors_spark.operators.mor import _manifest, vacuum_mor

    mor_delete(_df(spark, [(4, "x", 0)]), table, ["k"])
    mor_upsert(_df(spark, [(1, "A", 100), (9, "i", 90)]), table, ["k"])
    before = _snap(read_mor(spark, table, ["k"]))
    compact(spark, table, ["k"])
    assert _snap(read_mor(spark, table, ["k"])) == before
    # compact dereferences the deltas (manifest) but deletes NOTHING;
    # vacuum reclaims the unreferenced dirs
    assert _manifest(table)["deltas"] == []
    assert [d for d in os.listdir(table) if d.startswith("_d=")]
    removed = vacuum_mor(table)
    assert "base.v0" in removed and any(d.startswith("_d=") for d in removed)
    assert not [d for d in os.listdir(table) if d.startswith("_d=")]
    assert _snap(read_mor(spark, table, ["k"])) == before
    # and the table stays mutable after compaction
    mor_delete(_df(spark, [(1, "x", 0)]), table, ["k"])
    assert (1,) not in [
        (r.k,) for r in read_mor(spark, table, ["k"]).collect()
    ]


def test_unreferenced_delta_is_invisible(spark, table):
    """A crash between the delta parquet write and the manifest swap
    leaves a full _d= dir on disk that NO manifest references — reads
    must not see it, and the retry (same seq) must overwrite it."""
    import shutil

    seq = mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"])
    # simulate the crash: data dir for seq+1 exists, manifest unaware
    shutil.copytree(
        os.path.join(table, f"_d={seq}"), os.path.join(table, f"_d={seq + 1}")
    )
    assert _snap(read_mor(spark, table, ["k"])) == [
        (1, "a", 10), (3, "c", 30), (4, "d", 40)
    ]
    # the retry commits the same sequence number cleanly
    s2 = mor_upsert(_df(spark, [(9, "i", 90)]), table, ["k"], seq=seq + 1)
    assert s2 == seq + 1
    assert (9, "i", 90) in _snap(read_mor(spark, table, ["k"]))


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


def test_reader_snapshot_survives_concurrent_compact(spark, table):
    """Snapshot isolation vs the writer: a reader that resolved its
    manifest BEFORE a compact keeps reading the exact same state
    afterwards (compact deletes nothing); only vacuum invalidates old
    snapshots."""
    from spark_tensors_spark.operators.mor import _manifest, vacuum_mor

    mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"])
    mor_upsert(_df(spark, [(5, "e", 50)]), table, ["k"])
    want = _snap(read_mor(spark, table, ["k"]))

    old_snapshot = _manifest(table)  # reader's pinned view
    compact(spark, table, ["k"])
    mor_upsert(_df(spark, [(6, "f", 60)]), table, ["k"])  # moves on
    # the pinned pre-compact snapshot still reads bit-identically
    assert _snap(read_mor(spark, table, ["k"], manifest=old_snapshot)) == want
    # current pointer sees the new write
    assert (6, "f", 60) in _snap(read_mor(spark, table, ["k"]))
    # vacuum is the ONE destructive op: the old base goes away
    vacuum_mor(table)
    assert not os.path.isdir(os.path.join(table, old_snapshot["base"]))


def test_compact_carries_straggler_deltas_forward(spark, table, monkeypatch):
    """A delta committed AFTER compact captured its manifest must
    survive unfolded in the new manifest (never lost)."""
    import spark_tensors_spark.operators.mor as M

    mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"])  # seq 0: captured

    real_read = M.read_mor
    def read_and_race(spark_, path, key_cols, manifest=None):
        out = real_read(spark_, path, key_cols, manifest=manifest)
        # concurrent writer lands seq 1 while the fold materializes
        mor_upsert(_df(spark_, [(9, "z", 90)]), path, ["k"], seq=1)
        return out

    monkeypatch.setattr(M, "read_mor", read_and_race)
    M.compact(spark, table, ["k"])
    monkeypatch.undo()

    assert M._manifest(table)["deltas"] == [1]  # straggler carried
    got = _snap(read_mor(spark, table, ["k"]))
    assert (9, "z", 90) in got and (2, "b", 20) not in got


def test_legacy_layout_migrates_and_crash_leftover_recovers(spark, tmp_path):
    """Pre-manifest tables (``base/`` + listed ``_d=*`` dirs, possibly
    a ``base.old`` compact-crash leftover) must stay readable and
    writable: reads synthesize a manifest view, a crash leftover is
    reinstated, init refuses to re-init, and the first write persists
    a real manifest."""
    from spark_tensors_spark.operators.mor import _MANIFEST, _manifest

    # build a LEGACY layout by hand
    path = str(tmp_path / "legacy")
    _df(spark, [(1, "a", 10), (2, "b", 20)]).write.parquet(
        os.path.join(path, "base")
    )
    _df(spark, [(2, "x", 0)]).select("k").withColumn(
        "_op", F.lit("D")
    ).write.parquet(os.path.join(path, "_d=0"))
    assert _snap(read_mor(spark, path, ["k"])) == [(1, "a", 10)]

    # crash leftover: base renamed away mid-legacy-compact
    os.rename(os.path.join(path, "base"), os.path.join(path, "base.old"))
    with pytest.raises(FileExistsError):
        init_mor(_df(spark, [(99, "zz", 0)]), path)  # NOT uninitialized
    assert os.path.isdir(os.path.join(path, "base"))  # recovered
    assert _snap(read_mor(spark, path, ["k"])) == [(1, "a", 10)]

    # first write persists the manifest; history is preserved
    mor_upsert(_df(spark, [(7, "g", 70)]), path, ["k"])
    assert os.path.exists(os.path.join(path, _MANIFEST))
    assert _manifest(path)["deltas"] == [0, 1]
    assert _snap(read_mor(spark, path, ["k"])) == [(1, "a", 10), (7, "g", 70)]


def test_replay_of_folded_batch_is_noop_after_compact(spark, table):
    """foreachBatch replay across a compaction: a batch whose delta was
    already FOLDED into the base must stay a no-op (monotone max_seq),
    not re-apply and resurrect/duplicate state."""
    mor_upsert(_df(spark, [(2, "B", 200)]), table, ["k"], seq=5)
    mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"], seq=6)
    compact(spark, table, ["k"])
    before = _snap(read_mor(spark, table, ["k"]))
    assert (2, "B", 200) not in before
    # replay both folded batches: no-ops
    assert mor_upsert(_df(spark, [(2, "B", 200)]), table, ["k"], seq=5) == 5
    assert mor_delete(_df(spark, [(2, "x", 0)]), table, ["k"], seq=6) == 6
    assert _snap(read_mor(spark, table, ["k"])) == before
    # and new work continues past the folded range
    s = mor_upsert(_df(spark, [(8, "h", 80)]), table, ["k"])
    assert s == 7


def test_never_committed_seq_in_fold_gap_raises_after_compact(
    spark, table
):
    """The fold history is an exact RANGE SET: after non-contiguous
    explicit seqs are folded by compact, a never-committed seq inside
    the GAP must still raise — under the old folded_max high-water
    check it silently no-op'd, losing the batch (review r11)."""
    from spark_tensors_spark.operators.mor import _manifest

    mor_upsert(_df(spark, [(3, "C", 300)]), table, ["k"], seq=5)
    compact(spark, table, ["k"])
    m = _manifest(table)
    assert _snap(read_mor(spark, table, ["k"]))  # table alive
    # seq 3 sits in the gap below the folded high-water mark (5) and
    # was never committed: must raise, not vanish
    with pytest.raises(ValueError, match="never"):
        mor_upsert(_df(spark, [(9, "i", 90)]), table, ["k"], seq=3)
    # genuine replays on either side of the gap stay no-ops
    assert mor_upsert(_df(spark, [(3, "C", 300)]), table, ["k"], seq=5) == 5
    assert m["folded_ranges"]  # exact history persisted


def test_manifest_without_any_fold_history_keeps_replay_noop(spark, table):
    """Manifests from the generation BETWEEN the manifest-pointer
    layout and the fold history (max_seq present, neither folded_max
    nor folded_ranges): a replay of a seq ≤ max_seq must stay a no-op
    — those tables were written under the conservative
    everything-possibly-folded contract, so raising would crash a
    legitimate replayable source (review r11)."""
    import json
    import os

    from spark_tensors_spark.operators.mor import _MANIFEST, _manifest

    mor_upsert(_df(spark, [(5, "e", 50)]), table, ["k"], seq=7)
    mpath = os.path.join(table, _MANIFEST)
    m = json.load(open(mpath))
    for k in ("folded_max", "folded_ranges"):
        m.pop(k, None)
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    before = _snap(read_mor(spark, table, ["k"]))
    # seq 3 was never committed, but without fold history the old
    # contract treats it as possibly-folded: no-op, not a raise
    assert mor_upsert(_df(spark, [(9, "i", 90)]), table, ["k"], seq=3) == 3
    assert _snap(read_mor(spark, table, ["k"])) == before
    assert _manifest(table) is not None


def test_grandfathered_fold_history_gets_permanent_conservative_marker(
    spark, table
):
    """Compacting a table whose manifest carries only ``folded_max``
    (or no fold history at all) writes a PERMANENT
    ``conservative: true`` marker so operators can tell
    over-approximated fold histories from exact ones (ADVICE r11).
    The marker must survive subsequent delta commits AND further
    compacts; a table with an exact range history must never gain it."""
    import json
    import os

    from spark_tensors_spark.operators.mor import _MANIFEST, _manifest

    mor_upsert(_df(spark, [(5, "e", 50)]), table, ["k"], seq=4)
    mpath = os.path.join(table, _MANIFEST)
    m = json.load(open(mpath))
    m.pop("folded_ranges", None)  # grandfather: folded_max-only history
    m["folded_max"] = 2
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    compact(spark, table, ["k"])
    assert _manifest(table).get("conservative") is True
    # marker survives a subsequent delta commit (the {**m} spread)...
    mor_upsert(_df(spark, [(6, "f", 60)]), table, ["k"])
    assert _manifest(table).get("conservative") is True
    # ...and a further compact (explicit carry-forward)
    compact(spark, table, ["k"])
    assert _manifest(table).get("conservative") is True
    # control: an exact-history table never gains the marker
    fresh = table + "_exact"
    init_mor(_df(spark, [(1, "a", 10)]), fresh)
    mor_upsert(_df(spark, [(2, "b", 20)]), fresh, ["k"])
    compact(spark, fresh, ["k"])
    assert "conservative" not in _manifest(fresh)


def test_randomized_ops_match_dict_model(spark, tmp_path):
    """Model-based fuzz: random interleavings of upsert / delete /
    replay / compact / vacuum must always read back exactly what a
    plain dict model says — the end-to-end invariant of the manifest
    layout (highest-seq-wins, fold-equivalence, replay no-ops,
    vacuum-preserves-current-state)."""
    import random

    for seed in (3, 17):
        rng = random.Random(seed)
        path = str(tmp_path / f"fuzz{seed}")
        rows0 = [(k, f"v{k}", k * 10) for k in range(6)]
        init_mor(_df(spark, rows0), path)
        model = {k: (k, f"v{k}", k * 10) for k in range(6)}
        committed: list[tuple] = []  # (kind, payload, seq) for replays

        for step in range(12):
            op = rng.choice(
                ["upsert", "delete", "replay", "compact", "vacuum"]
            )
            if op == "upsert":
                ks = rng.sample(range(10), rng.randint(1, 3))
                batch = [(k, f"s{step}", step) for k in ks]
                s = mor_upsert(_df(spark, batch), path, ["k"])
                for r in batch:
                    model[r[0]] = r
                committed.append(("U", batch, s))
            elif op == "delete":
                ks = rng.sample(range(10), rng.randint(1, 3))
                batch = [(k, "x", 0) for k in ks]
                s = mor_delete(_df(spark, batch), path, ["k"])
                for k in ks:
                    model.pop(k, None)
                committed.append(("D", batch, s))
            elif op == "replay" and committed:
                kind, batch, s = rng.choice(committed)
                if kind == "U":
                    assert mor_upsert(_df(spark, batch), path, ["k"], seq=s) == s
                else:
                    assert mor_delete(_df(spark, batch), path, ["k"], seq=s) == s
                # model unchanged: replay is a no-op
            elif op == "compact":
                compact(spark, path, ["k"])
            elif op == "vacuum":
                from spark_tensors_spark.operators.mor import vacuum_mor

                vacuum_mor(path)
            if step % 4 == 3:  # bounded number of Spark reads
                got = _snap(read_mor(spark, path, ["k"]))
                assert got == sorted(model.values()), (seed, step, op)
        assert _snap(read_mor(spark, path, ["k"])) == sorted(model.values())


def test_merge_ranges_matches_set_model():
    """Property: _merge_ranges/_in_ranges over random range lists +
    seqs behave exactly like the flat set union they compress — and
    the output is normalized (sorted, disjoint, gap-separated)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_tensors_spark.operators.mor import _in_ranges, _merge_ranges

    rng_list = st.lists(
        st.tuples(
            st.integers(0, 40), st.integers(0, 8)
        ).map(lambda t: [t[0], t[0] + t[1]]),
        max_size=6,
    )
    seqs = st.lists(st.integers(0, 50), max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(a=rng_list, b=rng_list, s=seqs)
    def check(a, b, s):
        merged = _merge_ranges(a, b, seqs=s)
        model = set(s)
        for lo, hi in a + b:
            model |= set(range(lo, hi + 1))
        for x in range(0, 55):
            assert _in_ranges(merged, x) == (x in model), (x, merged)
        # normalized: sorted, disjoint, non-adjacent
        for (l1, h1), (l2, h2) in zip(merged, merged[1:]):
            assert l1 <= h1 and l2 <= h2 and l2 > h1 + 1

    check()
