"""Streaming corpus dedup: admit documents from a stream only if they
are neither exact nor near duplicates of anything already admitted —
the continuous-ingestion form of the batch MinHash-LSH pipeline
(pipeline/dedup.py), the operator a training-data service actually runs
as new crawl data lands.

Architecture (the ``foreachBatch`` + external-state pattern):

- **State** lives in two append-only parquet directories, partitioned
  by ``_batch_id``: admitted content hashes (exact dedup) and admitted
  LSH band keys (near dedup).  Parquet-backed state (not
  ``applyInPandasWithState``) because dedup state is unbounded and
  keyed by content, not by a bounded entity key — at scale this is the
  "state too big for the state store" case, and the standard answer is
  an external table joined per batch (compaction/Delta when available).
- **Per micro-batch**: exact-dedupe within the batch (min doc_id per
  md5), anti-join state hashes, anti-join state band keys, then
  resolve within-batch near-dups via the transitive candidate-pair
  components (pipeline/components.py).  Survivors' hashes + band keys
  append under the batch's own ``_batch_id`` partition.
- **Replay safety**: every write (state and output) is the
  batch-id-partition overwrite of ``streaming/sinks.py`` — a replayed
  micro-batch overwrites its own partitions, and because its decisions
  are a pure function of (batch content, state partitions < id), the
  rewritten rows are identical.  Effective exactly-once.

All shuffles are equi-joins on content hash / band key; nothing in the
loop grows with corpus size except the state scan, which partition
prunes to nothing for the exact path when AQE sees an empty batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from spark_tensors_spark.pipeline import dedup as D
from spark_tensors_spark.pipeline.components import duplicate_components
from spark_tensors_spark.streaming.sinks import write_idempotent_batch

BANDS = 4
ROWS_PER_BAND = 2


def _band_keys(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) — one row per LSH band of each signature."""
    band_vals = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"m{i * ROWS_PER_BAND + r}")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("sig"),
            )
            for i in range(BANDS)
        ]
    )
    return sigs.select(
        "doc_id", F.explode(band_vals).alias("bk")
    ).select("doc_id", "bk.band", "bk.sig")


def _read_state(spark: SparkSession, path: str) -> DataFrame | None:
    """State parquet, or None when no state exists yet.  Partition dirs
    are named `_batch_id=<n>` — the leading underscore does NOT make
    them hidden (Spark special-cases names with '='), so
    presence-of-data means "any partition dir or visible file"."""
    if os.path.isdir(path) and any(
        "=" in n or not n.startswith(("_", "."))
        for n in os.listdir(path)
    ):
        return spark.read.parquet(path)
    return None


def dedup_one_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    out_dir: str,
    text_col: str = "text",
) -> None:
    """Process one micro-batch of documents(doc_id, text, …): write
    admitted rows to ``out_dir`` and their dedup state under
    ``state_dir``, both keyed by ``_batch_id`` for replay idempotence."""
    spark = batch.sparkSession
    hash_path = os.path.join(state_dir, "hashes")
    band_path = os.path.join(state_dir, "bands")
    # a replayed batch must not see its own (or any later) half-written
    # state — decisions depend only on strictly older partitions
    seen_hashes = _read_state(spark, hash_path)
    seen_bands = _read_state(spark, band_path)
    if seen_hashes is not None:
        seen_hashes = seen_hashes.filter(F.col("_batch_id") < batch_id)
    if seen_bands is not None:
        seen_bands = seen_bands.filter(F.col("_batch_id") < batch_id)

    hashed = batch.withColumn("content_hash", F.md5(F.col(text_col)))
    # within-batch exact dedup: deterministic keeper = min doc_id
    w_min = F.min("doc_id").over(Window.partitionBy("content_hash"))
    batch_unique = (
        hashed.withColumn("_keep", w_min)
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
    )
    # cross-batch exact dedup (identity on the first batch — skip the
    # anti-join shuffles rather than joining against a frame Spark
    # cannot know is empty)
    fresh = batch_unique
    if seen_hashes is not None:
        fresh = batch_unique.join(
            seen_hashes.select("content_hash"), "content_hash", "left_anti"
        )
    # three consumers (signature build, admitted re-join, the hash
    # state write) would each re-run the source scan + window + antijoin
    fresh = fresh.persist()

    sigs = D.minhash_signatures(fresh, text_col=text_col).persist()
    bands = _band_keys(sigs)
    # cross-batch near dedup: ANY band key already admitted kills the doc
    survivors = sigs.select("doc_id")
    if seen_bands is not None:
        hit = (
            bands.join(
                seen_bands.select("band", "sig"),
                ["band", "sig"],
                "left_semi",
            )
            .select("doc_id")
            .distinct()
        )
        survivors = survivors.join(hit, "doc_id", "left_anti")
    # within-batch near dedup: transitive components over the capped
    # candidate-pair graph (same anti-skew guard as the batch pipeline);
    # keeper = component min
    surviving_sigs = (
        sigs
        if seen_bands is None  # survivors ≡ sigs: skip the no-op join
        else sigs.join(survivors, "doc_id")
    )
    pairs = D.lsh_candidate_pairs(
        surviving_sigs, bands=BANDS, rows_per_band=ROWS_PER_BAND
    )
    dropped = duplicate_components(pairs).select(F.col("doc_id"))
    admitted_ids = survivors.join(dropped, "doc_id", "left_anti")

    # materialize the admission decision ONCE — the sink writes are
    # then projections of it, not re-executions of the whole join DAG
    admitted = fresh.join(admitted_ids, "doc_id").localCheckpoint()
    write_idempotent_batch(admitted.drop("content_hash"), batch_id, out_dir)
    # state records everything SEEN this batch (all exact-unique docs),
    # not just what was admitted: a later copy of a *dropped* doc must
    # also be rejected, including docs dropped through a transitive
    # component whose bands never touched the component keeper's
    write_idempotent_batch(
        fresh.select("content_hash"), batch_id, hash_path
    )
    write_idempotent_batch(
        _band_keys(sigs).select("band", "sig"), batch_id, band_path
    )
    sigs.unpersist()
    fresh.unpersist()


def streaming_dedup(
    stream_df: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Attach the incremental dedup to a document stream.  With
    ``available_now`` the query drains what exists and stops — the
    batch-job-over-a-stream mode the tests and oracle use."""
    writer = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, bid: dedup_one_batch(
                bdf, bid, state_dir, out_dir, text_col=text_col
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
