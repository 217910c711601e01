"""Merge-on-read (deletion-vector) table layout — the OTHER half of
the warehouse write story.  `operators/merge.py` is copy-on-write:
every merge rewrites the full snapshot (O(|table|) per merge, the
documented cliff in its module docstring).  Merge-on-read inverts the
cost: a DELETE or UPSERT commits only a DELTA file (O(|batch|) write —
the Iceberg v2 / Delta deletion-vector idea, key-based rather than
row-position-based since there is no table format underneath), and the
READER reconciles base + deltas:

    read = base ANTI-JOIN touched-keys  ∪  latest surviving upserts

Commit protocol (r10: MANIFEST-pointer layout): the table's current
snapshot is named by ``_manifest.json`` — ``{"v", "base", "deltas"}``
— replaced atomically (tmp write + ``os.replace``).  Every mutation
first writes NEW directories (``base.v<k>/`` or ``_d=<seq>/``), then
swaps the manifest; a crash at any point leaves either the old
manifest (orphan dirs are invisible — readers never list the
directory) or the new one (fully written data).  There is NO
unreadable window, unlike rename-into-place directory conventions.
Per key the HIGHEST delta sequence wins, so a later upsert revives an
earlier delete and a later delete kills an earlier upsert.  Replay
(explicit ``seq`` from a replayable source) of an already-committed
sequence is a no-op.

Reader isolation: a reader resolves one manifest at plan time and
every directory it references stays on disk until ``vacuum_mor`` —
``compact`` itself deletes NOTHING, it just folds into ``base.v<k+1>``
and swaps the pointer.  The one destructive operation is
``vacuum_mor`` (drop directories unreferenced by the CURRENT
manifest); run it when no reader still holds an older snapshot — the
standard expire-snapshots caveat of every table format.

Concurrency contract (same as merge.py): SINGLE WRITER, and the
no-loss guarantee holds ONLY under it.  `compact` re-reads the
manifest immediately before its pointer swap and carries any
later-sequenced stragglers forward unfolded, which narrows — but does
NOT close — the race: a delta committed between that re-read and the
swap is dropped from the new manifest (orphaned until `vacuum_mor`),
and a concurrent delta commit racing the swap itself can clobber the
new base pointer outright (both writers replace the same manifest
file).  Run delta commits and `compact` from one writer at a time.
Readers are safe against every writer operation except `vacuum_mor`
(above).

Legacy layout (pre-manifest ``base/`` + directory listing) is
auto-migrated: reads synthesize a manifest view, the first write
persists it (recovering a legacy ``base.old`` crash leftover first).

Scale shape: the reader's reconciliation is one anti-join + one union
where the delta side is batch-count-sized (broadcastable until
compaction is due); `compact` folds all deltas into a new base exactly
when the accumulated delta mass makes reads pay more than one
rewrite — the classic MoR read/write amortization knob.  The manifest
is O(#deltas) metadata, rewritten per commit — the Iceberg
manifest-list idea without the format dependency.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DDIR = re.compile(r"^_d=(\d+)$")
_BDIR = re.compile(r"^base\.v(\d+)$")
_MANIFEST = "_manifest.json"
_OP = "_op"  # 'D' | 'U'
_SEQ = "_seq"
_RESERVED = (_OP, _SEQ, "_rn")


def _check_reserved(cols, what: str) -> None:
    """``_op``/``_seq``/``_rn`` are internal reconciliation columns; a
    user table carrying one would silently corrupt the merge (duplicate
    ``_op`` projections, a pure-delete delta misclassified by its
    schema).  Fail loudly instead."""
    clash = sorted(set(cols) & set(_RESERVED))
    if clash:
        raise ValueError(
            f"MoR {what} uses reserved internal column name(s) {clash}; "
            f"rename them (reserved: {list(_RESERVED)})"
        )


def _listed_deltas(path: str) -> list[int]:
    """Directory-listing fallback (legacy tables only): sorted seqs of
    COMMITTED (_SUCCESS-bearing) delta dirs."""
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        m = _DDIR.match(d)
        if m and os.path.exists(os.path.join(path, d, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def _write_manifest(path: str, m: dict) -> None:
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))  # atomic pointer swap


def _read_manifest(path: str) -> dict | None:
    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _migrate_legacy(path: str) -> dict | None:
    """Synthesize a manifest VIEW of a pre-manifest table (``base/`` +
    listed ``_d=*``), recovering a legacy compact-crash leftover
    (``base.old`` with no ``base``) first.  Pure function of the
    directory — does not write; writers persist it."""
    base = os.path.join(path, "base")
    old = os.path.join(path, "base.old")
    if not os.path.isdir(base) and os.path.isdir(old):
        os.rename(old, base)
    if not os.path.isdir(base):
        return None
    seqs = _listed_deltas(path)
    return {
        "v": 0,
        "base": "base",
        "deltas": seqs,
        "max_seq": max(seqs, default=-1),
        # legacy tables have no fold history: conservatively treat
        # every seq ≤ max_seq as possibly-folded (preserves the old
        # replay-is-a-no-op behavior; no false rejections)
        "folded_max": max(seqs, default=-1),
    }


def _manifest(path: str) -> dict | None:
    return _read_manifest(path) or _migrate_legacy(path)


def init_mor(df: DataFrame, path: str) -> None:
    """Write the base snapshot of a new MoR table (one-time full
    write; every later mutation is delta-sized)."""
    _check_reserved(df.columns, "base table")
    if _manifest(path) is not None:
        raise FileExistsError(f"MoR table already initialized: {path}")
    os.makedirs(path, exist_ok=True)
    df.write.parquet(os.path.join(path, "base.v0"))
    _write_manifest(
        path,
        {
            "v": 0,
            "base": "base.v0",
            "deltas": [],
            "max_seq": -1,
            "folded_ranges": [],
            "folded_max": -1,
        },
    )


def mor_delete(
    keys: DataFrame,
    path: str,
    key_cols: list[str],
    seq: int | None = None,
) -> int:
    """Commit a key-based deletion vector; returns its sequence number.
    Write cost O(|keys|) — never touches the base.  Pass ``seq`` from a
    replayable source (e.g. the foreachBatch batch id): re-committing
    an already-committed sequence is a no-op."""
    return _commit_delta(
        keys.select(*key_cols).distinct().withColumn(_OP, F.lit("D")),
        path,
        seq,
    )


def mor_upsert(
    rows: DataFrame,
    path: str,
    key_cols: list[str],
    order_col: str | None = None,
    seq: int | None = None,
) -> int:
    """Commit an upsert delta (matched keys replaced on read, unmatched
    inserted); within the batch, duplicate keys keep the greatest
    ``order_col`` row — and with no order_col the greatest row under
    an all-columns-desc order (merge_upsert's contract: within-batch
    dedupe is ALWAYS deterministic, never left to partition order).
    Pass ``seq`` from a replayable source; re-committing an
    already-committed sequence is a no-op."""
    _check_reserved(rows.columns, "upsert batch")
    order = [F.desc(order_col)] if order_col is not None else []
    w = Window.partitionBy(*key_cols).orderBy(
        *order, *[F.desc(c) for c in rows.columns]
    )
    rows = (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return _commit_delta(rows.withColumn(_OP, F.lit("U")), path, seq)


def _folded_ranges(m: dict) -> list[list[int]]:
    """The EXACT set of compact-folded sequence numbers, as sorted
    inclusive [lo, hi] ranges.  Manifests that predate the range
    history carry only ``folded_max`` — for those, conservatively
    treat every seq in [0, folded_max] as possibly folded (the
    pre-range replay-is-a-no-op behavior; no false rejections)."""
    fr = m.get("folded_ranges")
    if fr is not None:
        return [list(r) for r in fr]
    fm = m.get("folded_max")
    if fm is None:
        # manifests from before ANY fold history existed (the
        # manifest-pointer generation between the layout change and
        # folded_max's introduction): conservatively treat everything
        # ≤ max_seq as possibly folded — the behavior those tables
        # were written under, so a legitimate replay never raises
        fm = m.get("max_seq", max(m.get("deltas", []), default=-1))
    return [[0, fm]] if fm >= 0 else []


def _merge_ranges(*range_lists, seqs=()) -> list[list[int]]:
    """Normalize ranges + individual seqs into sorted, disjoint,
    inclusive [lo, hi] ranges (adjacent ranges coalesce), so the fold
    history stays O(#gaps), not O(#batches)."""
    items = [list(r) for rl in range_lists for r in rl]
    items += [[s, s] for s in set(seqs)]
    items.sort()
    merged: list[list[int]] = []
    for lo, hi in items:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return merged


def _in_ranges(ranges: list[list[int]], s: int) -> bool:
    return any(lo <= s <= hi for lo, hi in ranges)


def _commit_delta(delta: DataFrame, path: str, seq: int | None) -> int:
    m = _manifest(path)
    if m is None:
        raise FileNotFoundError(f"not a MoR table (no base): {path}")
    seqs = m["deltas"]
    max_seq = m.get("max_seq", max(seqs, default=-1))
    folded = _folded_ranges(m)
    if seq is None:
        seq = max_seq + 1
    elif seq <= max_seq:
        if seq in seqs or _in_ranges(folded, seq):
            # replayed batch: already committed (possibly already
            # FOLDED into a base by compact — the monotone max_seq
            # keeps sequence numbers from ever re-using a dir an older
            # pinned snapshot references)
            return seq
        # an out-of-order EXPLICIT seq that was never committed nor
        # folded: silently dropping it would lose the batch with no
        # error (ADVICE r10).  The fold history is an exact RANGE SET,
        # so a never-seen seq in a gap BELOW the fold high-water mark
        # (non-contiguous explicit seqs, then compact) raises too
        # instead of masquerading as a replay.
        raise ValueError(
            f"explicit seq {seq} is <= max_seq {max_seq} but was never "
            f"committed (live deltas {seqs}, folded ranges "
            f"{folded}); replayable sources must supply MONOTONE "
            "sequence numbers"
        )
    out = os.path.join(path, f"_d={seq}")
    shutil.rmtree(out, ignore_errors=True)  # crash leftover, unreferenced
    delta.write.parquet(out)
    _write_manifest(
        path,
        {
            **m,
            "deltas": sorted(set(seqs) | {seq}),
            "max_seq": max(max_seq, seq),
        },
    )  # data first, pointer second: a crash in between leaves an
    # invisible orphan the retry overwrites
    return seq


def read_mor(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    manifest: dict | None = None,
) -> DataFrame:
    """Reconcile base + deltas: per key the highest-sequence delta op
    decides (D ⇒ gone, U ⇒ that row); untouched base rows pass
    through.  One anti-join + one union; the delta side is
    batch-count-sized, broadcastable until compaction.

    ``manifest`` pins the exact snapshot (``compact`` passes the one
    it captured); readers leave it None and get the current pointer.
    """
    m = manifest if manifest is not None else _manifest(path)
    if m is None:
        raise FileNotFoundError(f"not a MoR table (no base): {path}")
    base = spark.read.parquet(os.path.join(path, m["base"]))
    _check_reserved(base.columns, "base table")
    seqs = m["deltas"]
    if not seqs:
        return base
    parts = []
    for s in sorted(seqs):
        d = spark.read.parquet(os.path.join(path, f"_d={s}"))
        if set(d.columns) == set(key_cols) | {_OP}:
            # pure deletion vector: only keys + _op stored (schema
            # tells the kind — no action needed to detect it)
            for c in base.columns:
                if c not in key_cols:
                    d = d.withColumn(c, F.lit(None).cast(base.schema[c].dataType))
        parts.append(d.select(*base.columns, _OP).withColumn(_SEQ, F.lit(s)))
    all_d = parts[0]
    for p in parts[1:]:
        all_d = all_d.unionByName(p)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(_SEQ))
    latest = (
        all_d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", _SEQ)
    )
    touched = latest.select(*key_cols)
    survivors = latest.filter(F.col(_OP) == "U").drop(_OP)
    return base.join(touched, key_cols, "left_anti").unionByName(survivors)


def compact(spark: SparkSession, path: str, key_cols: list[str]) -> None:
    """Fold the CURRENT snapshot's deltas into ``base.v<k+1>`` and swap
    the manifest — the one full rewrite MoR amortizes.  Deletes
    NOTHING (readers on the old snapshot keep working; reclaim with
    `vacuum_mor`).  UNDER THE SINGLE-WRITER CONTRACT nothing is ever
    lost; the pre-swap manifest re-read additionally carries forward
    any straggler delta visible by then, but a delta committed between
    that re-read and the swap — a contract violation — IS dropped from
    the new manifest (orphaned until vacuum_mor), see the module
    concurrency paragraph.  Crash-safe at every point (single writer):
    before the manifest swap the old pointer still names a complete
    snapshot; the orphan ``base.v<k+1>`` is overwritten by the next
    compact."""
    m = _manifest(path)
    if m is None:
        raise FileNotFoundError(f"not a MoR table (no base): {path}")
    merged = read_mor(spark, path, key_cols, manifest=m)
    new_v = m["v"] + 1
    new_base = f"base.v{new_v}"
    out = os.path.join(path, new_base)
    shutil.rmtree(out, ignore_errors=True)  # prior crash's orphan
    merged.localCheckpoint().write.parquet(out)
    cur = _manifest(path) or m
    stragglers = sorted(set(cur["deltas"]) - set(m["deltas"]))
    # tables grandfathered from folded_max-only history keep a
    # permanent 'conservative' marker: their [0, folded_max] range is
    # an over-approximation, so replay-raise protection never applies
    # inside it — the marker lets operators tell exact histories from
    # grandfathered ones (the folding itself is unchanged)
    conservative = bool(
        m.get("conservative")
        or cur.get("conservative")
        or ("folded_ranges" not in m and _folded_ranges(m))
        or ("folded_ranges" not in cur and _folded_ranges(cur))
    )
    new_m = {
        "v": new_v,
        "base": new_base,
        "deltas": stragglers,
        "max_seq": cur.get("max_seq", max(cur["deltas"], default=-1)),
        # EXACT fold history (range-compressed): replays of folded
        # seqs stay no-ops while never-committed explicit seqs —
        # including ones inside gaps below the fold high-water
        # mark — raise
        "folded_ranges": _merge_ranges(
            _folded_ranges(m), _folded_ranges(cur), seqs=m["deltas"]
        ),
        "folded_max": max(
            m.get("folded_max", -1),
            cur.get("folded_max", -1),
            max(m["deltas"], default=-1),
        ),
    }
    if conservative:
        new_m["conservative"] = True
    _write_manifest(path, new_m)


def vacuum_mor(path: str) -> list[str]:
    """Drop every base/delta directory the CURRENT manifest does not
    reference; returns the removed names.  The ONLY destructive MoR
    operation — run when no reader still holds an older snapshot."""
    m = _manifest(path)
    if m is None:
        return []
    keep = {m["base"]} | {f"_d={s}" for s in m["deltas"]}
    removed = []
    for d in os.listdir(path):
        if (_BDIR.match(d) or _DDIR.match(d) or d == "base") and d not in keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
            removed.append(d)
    return sorted(removed)
