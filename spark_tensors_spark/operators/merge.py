"""MERGE INTO (SCD1 upsert) over parquet tables — the warehouse write
primitive Spark lacks without a table format: apply a batch of keyed
updates/inserts (and optional deletes) to a stored table atomically
enough for replays.

``merge_upsert`` is the pure-DataFrame merge (no I/O): updated rows
replace matched targets, unmatched updates insert, with a
deterministic latest-wins tie-break INSIDE the update batch.
``merge_into_parquet`` wraps it with versioned directory commits: each
merge writes a full new snapshot under ``_v=<n+1>`` and the reader
takes the highest complete version — a crashed merge leaves the prior
snapshot untouched (write-ahead by directory, the same
rename-into-place idea as the HLL compactor, sketches.py), and
re-merging the same batch onto the same base version is idempotent by
construction (same inputs ⇒ same snapshot content).

Scale note: a full-snapshot rewrite is the format-less cost of merge —
O(|table|) per merge regardless of |updates|.  At real scale you want
partition-scoped rewrites (dynamic partitionOverwriteMode on the
touched partitions, as `write_idempotent_batch` does for batch ids) or
a table format with deletion vectors; this operator documents that
cliff rather than hiding it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    delete_col: str | None = None,
    evolve_schema: bool = False,
) -> DataFrame:
    """SCD1 merge: rows of ``updates`` replace matching ``target`` rows
    by key, unmatched updates insert.  Duplicate keys inside
    ``updates`` resolve latest-wins by ``order_col`` (ties broken by
    the remaining column order via a deterministic row_number); with
    ``order_col=None`` duplicates still collapse to ONE row per key —
    remaining columns ASCENDING in column order (smallest tuple wins),
    a deterministic but arbitrary pick
    — so the one-row-per-key SCD1 invariant holds unconditionally
    (pass ``order_col`` whenever a meaningful recency exists).  If
    ``delete_col`` names a boolean column, updates with it true DELETE
    the key instead (and never insert).

    ``evolve_schema=True`` accepts schema drift between the sides (the
    CDC reality: upstream tables grow columns): the merged schema is
    the UNION of both, each side padded with typed NULLs for columns
    it lacks; a column present on both sides with different types
    raises.  Default False — silent widening would hide producer bugs.
    """
    upd = updates
    if not evolve_schema:
        extra = [
            c for c in upd.columns
            if c not in target.columns and c != delete_col
        ]
        if extra:
            raise ValueError(
                f"updates carry columns absent from target {extra}; "
                "pass evolve_schema=True to widen the table (the old "
                "behavior silently DROPPED them)"
            )
    if evolve_schema:
        t_types = dict(target.dtypes)
        u_types = {
            c: t for c, t in upd.dtypes
            if c != delete_col
        }
        for c in u_types:
            if c in t_types and t_types[c] != u_types[c]:
                raise TypeError(
                    f"column {c!r} type conflict: target {t_types[c]} "
                    f"vs updates {u_types[c]}"
                )
        target = target.select(
            "*",
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in u_types.items()
                if c not in t_types
            ],
        )
        upd = upd.select(
            "*",
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in t_types.items()
                if c not in u_types and c != delete_col
            ],
        )
    order_exprs = (
        [F.col(order_col).desc()] if order_col is not None else []
    )
    # same deterministic tie-break as always (remaining columns in
    # column order, ascending); with order_col=None it alone picks the
    # surviving duplicate
    tie_exprs = [F.col(c) for c in upd.columns if c != order_col]
    w = Window.partitionBy(*key_cols).orderBy(*order_exprs, *tie_exprs)
    upd = (
        upd.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    deletes = None
    if delete_col is not None:
        deletes = upd.filter(F.col(delete_col)).select(*key_cols)
        upd = upd.filter(~F.col(delete_col)).drop(delete_col)
        kept_cols = [c for c in upd.columns]
    survivors = target.join(
        upd.select(*key_cols), key_cols, "left_anti"
    )
    if deletes is not None:
        survivors = survivors.join(deletes, key_cols, "left_anti")
        upd = upd.select(*kept_cols)
    return survivors.unionByName(upd.select(*survivors.columns))


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        # strict integer suffix only: maintenance temp dirs (e.g. a
        # crashed purge's leftovers) and any other stray `_v=`-prefixed
        # name must be IGNORED, not crash every reader with ValueError
        if not d.startswith("_v="):
            continue
        if not d[3:].isdigit():
            continue
        if os.path.exists(os.path.join(path, d, "_SUCCESS")):
            out.append(int(d[3:]))
    return sorted(out)


def read_merged(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Latest COMPLETE snapshot (highest ``_v`` with a _SUCCESS
    marker), or — TIME TRAVEL — any earlier complete ``version``:
    snapshots are immutable once committed, so every past table state
    stays addressable until explicitly vacuumed."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no complete snapshot under {path}")
    if version is None:
        version = vs[-1]
    elif version not in vs:
        raise FileNotFoundError(
            f"no complete snapshot _v={version} under {path} "
            f"(have {vs})"
        )
    return spark.read.parquet(os.path.join(path, f"_v={version}"))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Keyed diff between two table states (e.g. two time-travel
    snapshots): one row per key that was INSERTED, DELETED, or UPDATED
    (any non-key column differs, null-safe), with the old and new
    values side by side (``old_*`` / ``new_*``); unchanged keys are
    omitted.  Both inputs must share the same schema.

    Scale shape: ONE full-outer equi-join on the keys — shuffle on
    both sides, AQE-sized; the change classification is pure codegen.
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(old.columns)} vs "
            f"{sorted(new.columns)}"
        )
    vals = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *[F.col(k).alias(f"_o_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in vals],
        F.lit(True).alias("_in_old"),
    )
    nw = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in vals],
        F.lit(True).alias("_in_new"),
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}"))
    j = o.join(nw, on=cond, how="full_outer")
    same_vals = F.lit(True)
    for c in vals:
        same_vals = same_vals & F.col(f"old_{c}").eqNullSafe(
            F.col(f"new_{c}")
        )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same_vals, F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            "change",
            *out_keys,
            *[F.col(f"old_{c}") for c in vals],
            *[F.col(f"new_{c}") for c in vals],
        )
    )


def vacuum(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` COMPLETE snapshots (and
    any incomplete ones older than the newest kept) — bounds the
    storage bill of full-snapshot versioning; returns the versions
    removed.  Never touches the latest snapshot: readers of
    :func:`read_merged` stay valid throughout."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(path)
    drop = vs[:-keep_last] if len(vs) > keep_last else []
    for v in drop:
        shutil.rmtree(os.path.join(path, f"_v={v}"), ignore_errors=True)
    if vs:
        # incomplete `_v=<n>` dirs (no _SUCCESS — crashed merges) at or
        # below the newest COMPLETE version are dead: a new merge always
        # writes newest+1, so only a version above newest can be
        # in-flight.  Without this they leak forever (the docstring's
        # contract); kept complete versions are untouched.
        keep = set(vs[-keep_last:])
        for d in os.listdir(path):
            if not (d.startswith("_v=") and d[3:].isdigit()):
                continue
            v = int(d[3:])
            if v <= vs[-1] and v not in keep and v not in drop:
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return drop


def purge_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    values: list,
) -> int:
    """Privacy erase ("right to be forgotten"): physically remove the
    given key values from EVERY complete snapshot — a MERGE delete
    only removes a key from the latest version, while time travel
    (:func:`read_merged` with ``version=``) would still surface it
    from history.  Each snapshot is rewritten without the keys and
    swapped in by RENAME.  A crash during the rewrite leaves the
    original intact; the only unsafe window is between the two renames
    (the original then survives under ``purge_old._v=<n>`` — a name
    ``_versions`` ignores, so the table stays READABLE, just missing
    that one version until the dir is restored or removed by hand — a
    table format's atomic pointer swap closes this).  NULL keys are
    never purge targets and are always kept.  Returns the number of
    snapshots rewritten.

    Scale note: cost is a filtered copy of every kept snapshot —
    exactly why :func:`vacuum` should bound the snapshot count before
    purges are routine.
    """
    import shutil

    n = 0
    for v in _versions(path):
        vdir = os.path.join(path, f"_v={v}")
        # temp/backup names must NOT start with `_v=`: _versions
        # ignores them, so crash leftovers can never brick the table
        tmp = os.path.join(path, f"purge_tmp._v={v}")
        shutil.rmtree(tmp, ignore_errors=True)
        df = spark.read.parquet(vdir)
        # NULL-key rows are kept: ~isin(NULL) is NULL, which a bare
        # filter would DROP — an erase request must never take
        # unrelated rows with it
        df.filter(
            F.col(key_col).isNull() | ~F.col(key_col).isin(values)
        ).write.mode("overwrite").parquet(tmp)
        old = os.path.join(path, f"purge_old._v={v}")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(vdir, old)
        os.rename(tmp, vdir)
        shutil.rmtree(old, ignore_errors=True)
        n += 1
    return n


def merge_into_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    order_col: str | None = None,
    delete_col: str | None = None,
    evolve_schema: bool = False,
) -> int:
    """Merge ``updates`` into the parquet table at ``path`` (creating
    it if absent) and return the new version number.  Crash-safe by
    snapshot versioning: the new `_v=<n+1>` directory only counts once
    its _SUCCESS marker exists; a partial write is ignored by
    :func:`read_merged` and overwritten by the retry."""
    vs = _versions(path)
    if vs:
        base = spark.read.parquet(os.path.join(path, f"_v={vs[-1]}"))
        merged = merge_upsert(
            base, updates, key_cols,
            order_col=order_col, delete_col=delete_col,
            evolve_schema=evolve_schema,
        )
    else:
        # fresh table: the synthesized empty target must NOT carry the
        # delete-flag column — merge_upsert's final select projects
        # updates onto the TARGET schema, which never stores the flag
        empty = updates.limit(0)
        if delete_col is not None:
            empty = empty.drop(delete_col)
        merged = merge_upsert(
            empty, updates, key_cols,
            order_col=order_col, delete_col=delete_col,
        )
    new_v = (vs[-1] + 1) if vs else 0
    merged.write.mode("overwrite").parquet(
        os.path.join(path, f"_v={new_v}")
    )
    return new_v
