"""Streaming materialized view — a continuously-maintained aggregate
snapshot: each micro-batch folds into the stored partial-aggregate
table via `operators/incremental.merge_agg_snapshot`, so the view over
an unbounded stream costs one aggregate per batch + a key-sized merge,
never a rescan.

Exactly-once WITHOUT idempotent algebra: unlike the CDC merge
(streaming/cdc.py), an aggregate fold is NOT a value no-op on replay —
re-applying a batch DOUBLE-COUNTS sums.  The sink therefore commits
each fold as a snapshot version whose directory records the batch id
(`_v=<n>__b=<batch_id>`), and `_apply` SKIPS any batch id at or below
the last committed one — the standard transactional-sink recipe
(version + batch id in one atomic commit), pinned by the replay test.

Scale shape: per batch, one partial aggregate over batch rows (shuffle
= #groups) + one full-outer merge against the snapshot (group-
cardinality-sized, broadcastable); snapshot writes are
O(#groups), not O(stream).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from spark_tensors_spark.operators.incremental import merge_agg_snapshot

_VDIR = re.compile(r"^_v=(\d+)__b=(\d+)$")


def _committed(path: str) -> list[tuple[int, int]]:
    """Sorted (version, batch_id) of COMPLETE snapshot versions."""
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        m = _VDIR.match(d)
        if m and os.path.exists(os.path.join(path, d, "_SUCCESS")):
            out.append((int(m.group(1)), int(m.group(2))))
    return sorted(out)


def prune_versions(path: str, keep_last: int) -> None:
    """Reclaim superseded snapshot versions: keep the newest
    ``keep_last`` COMMITTED versions, delete older committed ones and
    dead incomplete dirs below the newest committed version (crash
    leftovers — a writer only ever writes newest+1, so a complete
    newer version proves them dead; above-newest incompletes are left
    alone, same rule as operators/merge.vacuum).  Without pruning,
    snapshot storage grows O(batches × state): the compute per batch
    is delta-sized but each commit is a full snapshot."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    vs = _committed(path)
    if not vs:
        return
    newest = vs[-1][0]
    keep = {v for v, _ in vs[-keep_last:]}
    for d in os.listdir(path):
        m = _VDIR.match(d)
        if not m:
            continue
        v = int(m.group(1))
        complete = os.path.exists(os.path.join(path, d, "_SUCCESS"))
        if (complete and v not in keep) or (not complete and v < newest):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def read_view(spark: SparkSession, path: str) -> DataFrame:
    """The latest committed state of the view."""
    vs = _committed(path)
    if not vs:
        raise FileNotFoundError(f"no committed view state under {path}")
    v, b = vs[-1]
    return spark.read.parquet(os.path.join(path, f"_v={v}__b={b}"))


def streaming_agg_view(
    updates: DataFrame,
    view_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    keep_last: int | None = None,
) -> StreamingQuery:
    """Start an availableNow stream maintaining the aggregate view at
    ``view_path``; read it back with :func:`read_view`.  Pass
    ``keep_last`` to prune superseded snapshot versions after each
    commit (storage otherwise grows O(batches × state); opt-in so
    history readers keep their versions)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        vs = _committed(view_path)
        if vs and batch_id <= vs[-1][1]:
            return  # replayed batch: already folded in, skip
        spark = batch_df.sparkSession
        snapshot = (
            spark.read.parquet(
                os.path.join(view_path, f"_v={vs[-1][0]}__b={vs[-1][1]}")
            )
            if vs
            else None
        )
        merged = merge_agg_snapshot(snapshot, batch_df, key_cols, aggs)
        new_v = (vs[-1][0] + 1) if vs else 0
        out = os.path.join(view_path, f"_v={new_v}__b={batch_id}")
        shutil.rmtree(out, ignore_errors=True)
        merged.write.mode("overwrite").parquet(out)
        if keep_last is not None:
            prune_versions(view_path, keep_last)

    return (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
