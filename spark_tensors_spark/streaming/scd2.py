"""Streaming SCD2 maintenance — the TYPE-2 half of the CDC story
(streaming/cdc.py is the SCD1 MERGE): a change stream continuously
maintains a validity-range history table (`operators/scd2.py`
semantics) without ever recomputing history for keys a batch does not
touch.

Per micro-batch: keys NOT in the batch carry their history rows over
untouched; for TOUCHED keys the stored change points (one per history
row — the compressed representation is itself a change-point set) are
unioned with the batch's raw rows and re-compressed, so an open
version absorbs an unchanged-attribute continuation, closes at the
first changed row, and new versions chain after it.  COMPUTE per
batch = one window over (touched-key history + batch rows) —
delta-KEY-sized; the COMMIT, like streaming/mv.py's, is a full
snapshot write (history-sized I/O per batch), and superseded
snapshots accrete unless ``keep_last`` pruning is enabled
(`streaming/mv.prune_versions`).

Ordering contract (same as cdc.py's CDC apply): per key, event time
must not move backwards ACROSS batches — arrival order is the
cross-batch order.  A late row older than an already-compressed run
boundary would need the raw rows that compression already dropped;
feed such streams through a watermarked sort upstream, or re-run the
batch `history_table` over the affected horizon.

Exactly-once: an SCD2 fold IS a value no-op on replay (same points →
same compression), but the sink still commits snapshot versions
stamped with the batch id (`_v=<n>__b=<batch_id>`, streaming/mv.py
pattern) and skips re-delivered ids — belt and braces, pinned by
tests/test_streaming_scd2.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from spark_tensors_spark.streaming.mv import _committed


def compress_change_points(
    points: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
) -> DataFrame:
    """Collapse (keys, attrs, valid_from_us, tb) change-point rows into
    SCD2 validity ranges: equal-adjacent attribute tuples merge (the
    FIRST point of a run survives), ``valid_to_us`` chains half-open
    with the −1 open-end sentinel.  ``tb`` is the deterministic
    within-timestamp tiebreak (e.g. the source row id) and is carried
    through, so re-compression of already-compressed points is a
    no-op.  Two fused windows over one (key, t, tb) sort — the same
    shape as `operators/scd2.history_table`, lifted to epoch-µs inputs
    so stored history rows and raw batch rows compress together."""
    w = Window.partitionBy(*key_cols).orderBy("valid_from_us", "tb")
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = F.when(
        F.lag(attrs).over(w).isNull() | (F.lag(attrs).over(w) != attrs),
        F.lit(1),
    ).otherwise(F.lit(0))
    starts = points.withColumn("_chg", changed).filter(
        F.col("_chg") == 1
    )
    valid_to = F.lead("valid_from_us").over(w)
    return starts.select(
        *key_cols,
        *attr_cols,
        "tb",
        "valid_from_us",
        F.coalesce(valid_to, F.lit(-1)).alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    )


def read_history(spark: SparkSession, path: str) -> DataFrame:
    """The latest committed history snapshot."""
    vs = _committed(path)
    if not vs:
        raise FileNotFoundError(f"no committed history under {path}")
    v, b = vs[-1]
    return spark.read.parquet(os.path.join(path, f"_v={v}__b={b}"))


def streaming_scd2(
    updates: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    keep_last: int | None = None,
) -> StreamingQuery:
    """Start an availableNow stream maintaining the SCD2 history of
    ``attr_cols`` per ``key_cols`` at ``table_path``; read it back
    with :func:`read_history`.  Pass ``keep_last`` to prune superseded
    snapshot versions after each commit (storage otherwise grows
    O(batches × history); opt-in so history readers keep versions)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        vs = _committed(table_path)
        if vs and batch_id <= vs[-1][1]:
            return  # replayed batch: already folded in
        if batch_df.isEmpty():
            # no touched keys -> the fold is the identity; skip the
            # full-copy snapshot an empty batch would otherwise write
            # (cdc.py's guard; replaying a skipped empty batch is a
            # no-op either way)
            return
        spark = batch_df.sparkSession
        new_pts = batch_df.select(
            *key_cols,
            *attr_cols,
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.unix_micros(F.col(ts_col)).alias("valid_from_us"),
        )
        if vs:
            old = spark.read.parquet(
                os.path.join(table_path, f"_v={vs[-1][0]}__b={vs[-1][1]}")
            )
            keys_b = new_pts.select(*key_cols).distinct()
            untouched = old.join(keys_b, key_cols, "left_anti")
            touched_pts = old.join(keys_b, key_cols, "left_semi").select(
                *key_cols, *attr_cols, "tb", "valid_from_us"
            )
            hist = untouched.unionByName(
                compress_change_points(
                    touched_pts.unionByName(new_pts),
                    key_cols,
                    attr_cols,
                )
            )
        else:
            hist = compress_change_points(new_pts, key_cols, attr_cols)
        new_v = (vs[-1][0] + 1) if vs else 0
        out = os.path.join(table_path, f"_v={new_v}__b={batch_id}")
        shutil.rmtree(out, ignore_errors=True)
        hist.write.mode("overwrite").parquet(out)
        if keep_last is not None:
            from spark_tensors_spark.streaming.mv import prune_versions

            prune_versions(table_path, keep_last)

    return (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
