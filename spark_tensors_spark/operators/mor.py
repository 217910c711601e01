"""Merge-on-read (deletion-vector) table layout — the OTHER half of
the warehouse write story.  `operators/merge.py` is copy-on-write:
every merge rewrites the full snapshot (O(|table|) per merge, the
documented cliff in its module docstring).  Merge-on-read inverts the
cost: a DELETE or UPSERT commits only a DELTA file (O(|batch|) write —
the Iceberg v2 / Delta deletion-vector idea, key-based rather than
row-position-based since there is no table format underneath), and the
READER reconciles base + deltas:

    read = base ANTI-JOIN touched-keys  ∪  latest surviving upserts

Delta files are sequence-numbered directories (``_d=<n>`` + _SUCCESS,
the same crash-safe commit convention as streaming/mv.py snapshots): a
crashed half-written delta is invisible to readers, and replay-driven
callers (foreachBatch-style) pass an explicit ``seq`` — re-committing
an already-committed sequence number is a NO-OP, so a replayed batch
can neither duplicate nor reorder history.  Per key the HIGHEST delta
sequence wins, so a later upsert revives an earlier delete and a later
delete kills an earlier upsert.

Scale shape: the reader's reconciliation is one anti-join + one union
where the delta side is batch-sized (broadcastable until compaction is
due); `compact` folds all deltas into a new base exactly when the
accumulated delta mass makes reads pay more than one rewrite —
the classic MoR read/write amortization knob.

Concurrency contract (same as merge.py): SINGLE WRITER.  Delta commits
and `compact` must not run concurrently with each other — `compact`
folds and deletes exactly the delta set it captured up front, so a
delta committed mid-compaction by another writer would survive unfolded
(correct), but two concurrent compactions or a compaction racing the
rename window corrupt the layout.  Every writer entry point
(`init_mor`, delta commits, `compact`) first repairs a crashed
compaction via `_recover`, so the crash window cannot be mistaken for
an uninitialized table.  Concurrent READERS are crash-CONSISTENT but
not compaction-isolated: `read_mor` resolves a correct state at plan
time (``base.old`` fallback inside the rename window; re-reading
already-folded deltas is idempotent — delete ⇒ anti-join no-op,
upsert ⇒ replaces identical rows), but a read whose plan captured
``base.old`` or a delta dir that compact's CLEANUP then deletes fails
transiently with a file-not-found — retry semantics, the usual
snapshot-isolation gap of directory-convention tables without a
manifest log.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DDIR = re.compile(r"^_d=(\d+)$")
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


def _base_dir(path: str) -> str:
    """The readable base: ``base/``, or ``base.old/`` inside compact's
    two-rename crash window (base already renamed away, new base not
    yet in place — the deltas are still present then, so base.old +
    deltas reconstruct the exact pre-compaction state)."""
    base = os.path.join(path, "base")
    if os.path.isdir(base):
        return base
    old = os.path.join(path, "base.old")
    if os.path.isdir(old):
        return old
    return base  # let the parquet reader raise its usual error


def _recover(path: str) -> None:
    """Writer-side crash recovery: if a previous ``compact`` died
    between its two renames, reinstate ``base.old`` as ``base``.
    Only the single writer may call this (a reader renaming would race
    the compactor)."""
    base = os.path.join(path, "base")
    old = os.path.join(path, "base.old")
    if not os.path.isdir(base) and os.path.isdir(old):
        os.rename(old, base)


def _deltas(path: str) -> list[int]:
    """Sorted sequence numbers of COMMITTED delta dirs."""
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        m = _DDIR.match(d)
        if m and os.path.exists(os.path.join(path, d, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def init_mor(df: DataFrame, path: str) -> None:
    """Write the base snapshot of a new MoR table (one-time full
    write; every later mutation is delta-sized)."""
    _check_reserved(df.columns, "base table")
    _recover(path)  # a crashed compaction must not look uninitialized
    base = os.path.join(path, "base")
    if os.path.isdir(base):
        raise FileExistsError(f"MoR table already initialized: {path}")
    df.write.parquet(base)


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


def _commit_delta(delta: DataFrame, path: str, seq: int | None) -> int:
    _recover(path)  # writer entry point: repair a crashed compaction
    seqs = _deltas(path)
    if seq is None:
        seq = (seqs[-1] + 1) if seqs else 0
    elif seq in seqs:
        return seq  # replayed batch: already committed, a no-op
    out = os.path.join(path, f"_d={seq}")
    shutil.rmtree(out, ignore_errors=True)
    delta.write.parquet(out)
    return seq


def read_mor(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    seqs: list[int] | None = None,
) -> DataFrame:
    """Reconcile base + deltas: per key the highest-sequence delta op
    decides (D ⇒ gone, U ⇒ that row); untouched base rows pass
    through.  One anti-join + one union; the delta side is
    batch-count-sized, broadcastable until compaction.

    ``seqs`` pins the exact delta set to fold (``compact`` passes the
    set it captured BEFORE materializing, so a delta committed while
    the fold runs is never deleted unfolded); readers leave it None.
    Reads stay correct inside compact's rename window via the
    ``base.old`` fallback (see `_base_dir`)."""
    base = spark.read.parquet(_base_dir(path))
    _check_reserved(base.columns, "base table")
    if seqs is None:
        seqs = _deltas(path)
    if not seqs:
        return base
    parts = []
    for s in seqs:
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
    """Fold the CURRENT delta set into a new base (the one full rewrite
    MoR amortizes): capture the committed delta seqs, reconcile exactly
    that set, write base.compact, rename into place, drop exactly the
    folded deltas.  Crash safety: a crash between the two renames
    leaves ``base.old`` + the unfolded deltas — readers fall back to it
    transparently (`_base_dir`) and the next writer call repairs the
    layout (`_recover`); a crash during delta deletion leaves a new
    base plus already-folded deltas, which re-fold idempotently.  A
    delta committed between the capture and the cleanup (single-writer
    contract aside) is neither folded NOR deleted — it survives for the
    next read/compact."""
    _recover(path)
    seqs = _deltas(path)  # captured ONCE: fold and delete exactly these
    merged = read_mor(spark, path, key_cols, seqs=seqs)
    tmp = os.path.join(path, "base.compact")
    shutil.rmtree(tmp, ignore_errors=True)
    merged.localCheckpoint().write.parquet(tmp)
    old = os.path.join(path, "base.old")
    shutil.rmtree(old, ignore_errors=True)
    os.rename(os.path.join(path, "base"), old)
    os.rename(tmp, os.path.join(path, "base"))
    for s in seqs:
        shutil.rmtree(os.path.join(path, f"_d={s}"), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
