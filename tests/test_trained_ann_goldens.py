"""GOLDEN digests for the Lloyd-TRAINED float ANN paths.

Since r5 the four declared ANN queries run the oracle-exact integer
pseudo-geometry configuration (hash-gated by the driver), so the
engine-trained configurations — hash-seeded Lloyd centroids/codebooks,
random-hyperplane LSH — are pinned here instead, with the exact same
sf0.001 digests they carried as rows-only queries in r4.  Any drift in
seeding, Lloyd updates, probe order, or tie-breaks shows up as a
digest change.

(r7: digests re-pinned once — the shared normalize() float encoding
became sign-of-zero-faithful (repr-based); every underlying value was
verified unchanged under the old encoding before re-pinning.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle_harness import normalize


def _digest(df):
    cols, rows = normalize(df.columns, [tuple(r) for r in df.collect()])
    return len(rows), hashlib.md5(repr((cols, rows)).encode()).hexdigest()


def test_trained_lsh_topk_digest(spark):
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = _digest(
        similarity.lsh_bucketed_topk(emb, k=5, n_planes=6).orderBy(
            "query_id", "rk"
        )
    )
    assert got == (2500, "d0e922f8697b8d60c86eeb3d6eb93da9")


def test_trained_ivf_topk_digest(spark):
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = _digest(
        similarity.ivf_topk(emb, k=5, n_cells=16, nprobe=2).orderBy(
            "query_id", "rk"
        )
    )
    assert got == (2500, "ad25275b7145a768afff2d9853afa49d")


def test_trained_pq_topk_digest(spark):
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline import pq

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cb = pq.pq_train(emb, m=8, n_codes=16, lloyd_iters=1)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = _digest(
        pq.pq_topk(emb, queries, cb, k=5).orderBy("query_id", "rk")
    )
    assert got == (50, "b20d05697b53af512f16836aad4c8870")


def test_trained_ivfpq_topk_digest(spark):
    from spark_tensors_spark.io.readers import (
        ensure_scan_parallelism,
        load_table,
    )
    from spark_tensors_spark.pipeline import pq

    emb = ensure_scan_parallelism(load_table(spark, SF_SMOKE, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = _digest(
        pq.ivfpq_topk(
            emb, queries, k=5, n_cells=8, nprobe=3, m=8, n_codes=16
        ).orderBy("query_id", "rk")
    )
    assert got == (50, "aa66e95591633b61cb015777657daab0")


def test_production_xxhash_simhash_digest(spark):
    """The xxhash64 SimHash production path (the declared query runs
    the polynomial pseudo-token hash since r6, oracled) — pinned with
    the exact digest it carried as the rows-only declared query
    through r5."""
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline import dedup

    docs = load_table(spark, SF_SMOKE, "documents")
    got = _digest(
        dedup.simhash_candidates(dedup.simhash64(docs)).orderBy(
            "doc_a", "doc_b"
        )
    )
    assert got == (2459, "63f884fdea4a18068c6754fa25916c08")


def test_production_float_near_dup_bucketed_digest(spark):
    """The random-hyperplane float near-dup path on the raw embedding
    table (the declared query runs int8 codes + pseudo_planes since
    r6, oracled) — pinned with the exact digest it carried as the
    rows-only declared query through r5."""
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline import dedup

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = _digest(
        dedup.embedding_near_dups_bucketed(emb, threshold=-1.0, n_planes=8)
        .orderBy(F.desc("cos"), "id_a", "id_b")
        .limit(50)
    )
    assert got == (50, "8250785a59367a25ae935c28f73c9e58")
