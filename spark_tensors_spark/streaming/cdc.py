"""Streaming CDC apply — continuous MERGE INTO of a keyed update
stream into a parquet table, the change-data-capture sink pattern
(Kafka topic of upserts/deletes → queryable warehouse table) built
from pieces the engine already ships: ``foreachBatch`` +
``operators/merge.merge_into_parquet``.

Each micro-batch merges atomically as a new snapshot version
(``_v=<n>`` + _SUCCESS, see merge.py); readers always see the last
COMPLETE version.  Replay safety comes from merge algebra, not
bookkeeping: re-applying the SAME update batch onto a table that
already absorbed it is a no-op by value (latest-wins re-selects the
same rows, deletes re-delete absent keys), so a post-crash batch
replay converges to the same state — pinned by
tests/test_streaming_cdc.py::test_replay_idempotent.

Scale shape: the per-batch merge is one left-anti + union over the
snapshot (the format-less full-rewrite cost documented in merge.py —
a table format with deletion vectors or partition-scoped overwrite
replaces that at real scale); the stream side adds only the
checkpointed source offsets.  Within a batch, duplicate keys collapse
latest-wins by ``order_col`` BEFORE touching the table, so batch size
never multiplies table rows.  Cross-batch ordering is the stream's
arrival order (standard CDC apply semantics): a key updated in two
batches ends at the later batch's value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from spark_tensors_spark.operators.merge import merge_into_parquet


def streaming_merge_into_parquet(
    updates: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_col: str | None = None,
    delete_col: str | None = None,
) -> StreamingQuery:
    """Start an availableNow stream applying each micro-batch of
    ``updates`` to the snapshot-versioned parquet table at
    ``table_path`` via SCD1 MERGE.  Returns the StreamingQuery;
    ``awaitTermination()`` it, then read the result with
    ``operators/merge.read_merged``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into_parquet(
            batch_df.sparkSession,
            table_path,
            batch_df,
            key_cols,
            order_col=order_col,
            delete_col=delete_col,
        )

    return (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
