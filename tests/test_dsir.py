"""Property pins for DSIR importance weights (corpus.dsir_weights):
weights are monotone in target overlap, hashing/smoothing edge cases
behave, and the declared query's split covers every doc exactly once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.pipeline.corpus import dsir_weights
from tests.conftest import SF_SMOKE


def test_weights_monotone_in_target_overlap(spark):
    """Docs composed of i target tokens and (10 − i) junk tokens must
    score in strictly increasing weight order with i — the defining
    DSIR property (likelihood ratio rises with target-domain mass).
    Junk tokens are doc-unique so their raw-model mass is flat.
    n_buckets is 2³⁰ here so the ~250 fixture features cannot collide
    (at the declared 1024 buckets, collisions legitimately bend
    per-doc weights — that's hashing semantics, not a bug; md5 is
    fixed, so this fixture's bucketing is deterministic forever)."""
    tgt_toks = [
        "alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa",
    ]
    target = spark.createDataFrame(
        [(1000 + j, " ".join(tgt_toks)) for j in range(20)],
        "doc_id long, text string",
    )
    raws = []
    for i in range(11):
        toks = tgt_toks[:i] + [f"junk{i}x{j}" for j in range(10 - i)]
        raws.append((i, " ".join(toks)))
    raw = spark.createDataFrame(raws, "doc_id long, text string")
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_weights(raw, target, n_buckets=1 << 30).collect()
    }
    assert set(w) == set(range(11))
    for i in range(10):
        assert w[i] < w[i + 1], (i, w)


def test_all_feature_docs_scored_once(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    target = docs.filter(F.col("doc_id") % 7 == 0)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    out = dsir_weights(raw, target)
    n_raw_with_feats = (
        raw.filter(
            F.size(F.filter(F.split("text", " "), lambda t: t != "")) > 0
        ).count()
    )
    assert out.count() == n_raw_with_feats
    assert out.select("doc_id").distinct().count() == out.count()
    # n_feat = unigrams + bigrams = 2·tokens − 1 for every tokenized doc
    bad = (
        out.join(raw, "doc_id")
        .withColumn(
            "n_tok",
            F.size(F.filter(F.split("text", " "), lambda t: t != "")),
        )
        .filter(F.col("n_feat") != 2 * F.col("n_tok") - 1)
        .count()
    )
    assert bad == 0


def test_target_distribution_doc_beats_raw_distribution_doc(spark):
    """When target and raw are DIFFERENT distributions, a probe doc
    drawn from the target distribution must outscore a probe drawn
    from the raw distribution — the selection direction DSIR exists
    for.  (With target = a random slice of the same corpus, both
    ratios are ≈1 by construction, so this contrast needs distinct
    distributions.)"""
    target = spark.createDataFrame(
        [(1000 + j, "solar panel efficiency improves yearly")
         for j in range(20)],
        "doc_id long, text string",
    )
    raw_rows = [
        (j, f"market prices rose {j} percent on friday")
        for j in range(50)
    ]
    raw_rows += [
        (9000, "solar panel efficiency improves yearly"),
        (9001, "market prices rose 7 percent on friday"),
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_weights(raw, target).collect()
    }
    assert w[9000] > w[9001]
