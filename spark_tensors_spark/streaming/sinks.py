"""Streaming sinks (SURVEY §2.9 follow-up; ROUND_NOTES round-1 gap).

``foreachBatch`` is Structured Streaming's escape hatch for sinks Spark
doesn't ship natively; the failure mode at scale is REPLAY: after a
crash, the engine re-runs the last uncommitted micro-batch, and a naive
append sink duplicates it.  The standard fix implemented here is
batch-id partition overwrite — every micro-batch writes (exactly) the
partition ``_batch_id=<id>``, so a replayed batch overwrites itself
instead of appending twice.  Combined with the checkpoint directory
(which makes batch ids stable across restarts) this yields effective
exactly-once parquet output.

The same writer is exposed for batch use (`write_idempotent_batch`), so
the declared query surface can oracle-check the sink code path without
a streaming runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_idempotent_batch(df: DataFrame, batch_id: int, path: str) -> None:
    """Write one (micro-)batch to ``path/_batch_id=<id>``, overwriting
    ONLY that partition — re-running the same batch id is a no-op
    rather than a duplication."""
    (
        df.withColumn("_batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(path)
    )


def foreach_batch_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """Start a ``foreachBatch`` parquet sink with replay-idempotent
    writes.  ``available_now=True`` drains everything currently
    available then stops — the batch-job-over-a-stream pattern; pass
    False for a continuously-running query."""
    writer = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, bid: write_idempotent_batch(bdf, bid, path)
        )
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read a sink directory back, dropping the bookkeeping column."""
    return spark.read.parquet(path).drop("_batch_id")
