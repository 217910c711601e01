"""MinHash-LSH quality-eval harness — the dedup analogue of
emb_ann_ivf_recall: measure the production candidate generator's
RECALL against exact shingle-Jaccard ground truth on a bounded doc
subset, and pin it against the S-curve the banding scheme implies.

Config under test: minhash_signatures (8 hashes) banded 4×2 —
collision probability p(j) = 1 − (1 − j²)⁴, so p(0.7) ≈ 0.94 and
p(0.5) ≈ 0.68; the bucket cap (max_bucket_size=64) only ever REMOVES
candidates, so measured recall sits under the curve on this heavily
templated corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.pipeline import dedup
from tests.conftest import SF_SMOKE


def _exact_and_candidates(spark, threshold: float):
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 150
    )
    codes = dedup._with_char_codes(docs, "text").select(
        "doc_id",
        F.array_distinct(dedup.shingle_codes_col("text", 3)).alias("sh"),
    )
    a = codes.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    b = codes.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    j = F.size(F.array_intersect("sa", "sb")) / F.size(
        F.array_union("sa", "sb")
    )
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", j.alias("j"))
        .filter(F.col("j") >= threshold)
        .collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(docs)
        ).collect()
    }
    return exact, cand


def test_lsh_recall_above_scurve_band(spark):
    """High-similarity pairs (j ≥ 0.7, p_collide ≈ 0.94) must be
    recalled near-perfectly; mid-band pairs (j ≥ 0.6) keep a usable
    fraction even after the anti-skew bucket cap."""
    exact_hi, cand = _exact_and_candidates(spark, 0.7)
    assert exact_hi, "fixture degenerate: no high-similarity pairs"
    recall_hi = len(exact_hi & cand) / len(exact_hi)
    assert recall_hi >= 0.9, recall_hi

    exact_mid, _ = _exact_and_candidates(spark, 0.6)
    recall_mid = len(exact_mid & cand) / len(exact_mid)
    assert recall_mid >= 0.35, recall_mid
    # candidate volume stays far under all-pairs (the point of LSH):
    # 150 docs → 11,175 pairs; the banded join proposes a fraction
    assert len(cand) < 0.3 * (150 * 149) / 2, len(cand)
