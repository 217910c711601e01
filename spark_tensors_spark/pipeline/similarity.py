"""Similarity search over embedding columns (north-star M4).

Two tiers, same API:
  - :func:`cosine_topk` — exact brute-force top-k (baseline + oracle).
    The candidate side is broadcast when small; Spark plans the scored
    cross join + per-query rank without materializing beyond the shuffle
    of the top rows.
  - :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
    buckets (deterministic planes from the hash-init), candidates meet
    only within a bucket (plus optional multiprobe neighbors), exact
    cosine re-rank inside the bucket.  Recall is tunable via
    n_planes/probes; probes=0 with few planes degrades gracefully to
    near-exact.

Vector math is JVM column expressions (``functions.columns``) — no
Python in the scoring loop; the LSH projection is one Arrow batch pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_tensors_spark.functions.columns import cosine_col
from spark_tensors_spark.functions.init import _hash_uniform


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    cand = emb.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qv"),
    )
    pairs = q.crossJoin(cand)
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("nn_id"))
    scored = pairs.select(
        "query_id",
        "nn_id",
        F.round(cosine_col("_qv", "_cv"), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("nn_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection bucket id per vector (random hyperplanes drawn
    from the deterministic hash init — same buckets on any cluster)."""
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    planes = (
        _hash_uniform(seed, np.arange(n_planes), dim) * 2 - 1
    )  # (n_planes, dim)

    def project(batches):
        for pdf in batches:
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            signs = (mat @ planes.T) > 0  # (n, n_planes)
            bucket = (
                signs.astype(np.int64)
                * (1 << np.arange(n_planes, dtype=np.int64))
            ).sum(axis=1)
            yield pd.DataFrame({"_id": pdf["_id"], "bucket": bucket})

    out = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(project, "_id long, bucket long")
    return out.select(F.col("_id").alias(id_col), "bucket")


def lsh_bucketed_topk(
    emb: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN self-top-k: bucket every vector, exact cosine within bucket.

    The join key is the bucket id, so comparisons (and the shuffle) scale
    with Σ bucket² rather than N² — the IVF/LSH scale path.

    ``probes=1`` additionally probes every bucket at Hamming distance 1
    from the query's bucket (multiprobe LSH): recall rises from
    ~|bucket|/N to ~(1+n_planes)·|bucket|/N for a proportional cost
    increase, still far below N².
    """
    b = lsh_buckets(emb, n_planes=n_planes, seed=seed, id_col=id_col,
                    vec_col=vec_col)
    with_b = emb.join(b, id_col)
    probe_buckets = F.array(
        F.col("bucket"),
        *(
            [
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ]
            if probes >= 1
            else []
        ),
    )
    left = with_b.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probe_buckets).alias("bucket"),
    )
    right = with_b.select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv"), "bucket"
    )
    scored = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("nn_id"))
        .select(
            "query_id",
            "nn_id",
            F.round(cosine_col("_qv", "_cv"), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("nn_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )
