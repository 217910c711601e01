"""Incremental ANN index maintenance: streaming IVF cell assignment.

A production vector store does not rebuild its inverted lists per
batch — new vectors are assigned to their coarse cell as they arrive
and appended to that cell's list.  This module is that maintenance
loop on Structured Streaming:

- **Per micro-batch** (`assign_cells_batch`): one Arrow pass computes
  each vector's nearest centroid (argmin L2², ties to the lower cell —
  the `similarity.ivf_index` metric) and appends (id, cell, d2) rows
  under the batch's own ``_batch_id`` partition
  (`sinks.write_idempotent_batch`) — a replayed batch overwrites
  itself, never duplicates.
- **Centroids are fixed** for the stream's lifetime (they ride in the
  task closure, O(n_cells·d)); re-training is an offline job that
  rewrites the state, exactly like FAISS/SCaNN deployments.
- **Read side** (`assignments_from_state`): the accumulated state IS
  the inverted-list index — `ivf_topk`-style probing reads only the
  probed cells' partitions.

With integer-valued vectors and the integer pseudo-centroids every
assignment and d2 is exact, so the streamed index state shares a
DuckDB oracle with the batch assignment (`emb_stream_ivf_assign`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from spark_tensors_spark.streaming.sinks import write_idempotent_batch


def assign_cells_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "codes",
) -> None:
    """Append one micro-batch's (id, cell, d2) assignments under the
    batch's own partition."""
    c_sq = (centroids * centroids).sum(axis=1)

    def f(it):
        for pdf in it:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * (m @ centroids.T)
                + c_sq[None, :]
            )
            cell = d2.argmin(axis=1)  # ties → lower cell id
            d2_sel = d2[np.arange(len(cell)), cell]
            # the long output schema assumes integer geometry (integer
            # vectors + integer centroids, e.g. pseudo_centroids on
            # int8 codes): guard instead of silently truncating a
            # fractional distance from float vectors
            if not np.array_equal(d2_sel, np.rint(d2_sel)):
                raise ValueError(
                    "assign_cells_batch: non-integer squared distance "
                    "— the long d2 schema requires integer-valued "
                    "vectors and centroids (see pseudo_centroids); "
                    "quantize the stream (scalar_quantize_int8) or "
                    "extend the sink schema to double"
                )
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col],
                    "cell": cell.astype(np.int64),
                    "d2": d2_sel.astype(np.int64),
                }
            )

    rows = batch.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).mapInPandas(f, "vid long, cell long, d2 long")
    write_idempotent_batch(rows, batch_id, state_dir)


def streaming_ivf_assign(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "codes",
    available_now: bool = True,
) -> StreamingQuery:
    """Attach the incremental IVF assignment to a vector stream."""
    writer = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, bid: assign_cells_batch(
                bdf, bid, state_dir, centroids, id_col, vec_col
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def assignments_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated inverted-list index: (vid, cell, d2)."""
    return spark.read.parquet(state_dir).select("vid", "cell", "d2")
