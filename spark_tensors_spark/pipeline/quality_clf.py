"""In-engine quality-classifier fit (VERDICT r13 item 4).

The one GPT-3/CCNet curation stage the pipeline previously covered
only by proxy signals (DSIR importance weights, perplexity): a TRAINED
quality filter.  GPT-3's recipe (Brown et al. 2020, appendix A) is a
logistic-regression classifier over hashed text features, positives =
curated corpus, negatives = raw crawl; docs are kept by classifier
score.  This module fits that classifier INSIDE the engine — the
hashed-feature extraction, the full-batch gradient steps, and the
scoring are all DataFrame operations (no collect, no driver matrix),
so the fit runs where the corpus lives.

Exactness doctrine (``train/exactstep.py`` generalized beyond KGE
scores): every quantity in the fit is integer or dyadic-rational —
  * features: token counts (integers) hashed into ``n_features``
    buckets by the engine-portable md5-prefix hash (the same
    Spark ``conv(substr(md5(tok),1,8),16,10)`` ≡ DuckDB
    ``CAST('0x'||substr(md5(tok),1,8) AS BIGINT)`` identity the PII
    scrub checksum already gates);
  * the sigmoid is the HARD sigmoid clamp(z/4 + 1/2, 0, 1) — the
    standard piecewise-linear logistic surrogate (quantized-NN
    practice); z/4 and +1/2 are exact dyadic ops, so p is dyadic
    wherever weights are;
  * learning rate 2^-lr_bits (power of two), update by SUM gradient —
    so after any number of steps every weight is a dyadic double with
    numerator far below 2^53 (bounds in ``exact_fit_steps``), and
    DuckDB replays the entire trajectory symbolically.
The reference's loss semantics are the logistic objective of
``kge/hole.py:25-26``; the hard-sigmoid surrogate stands in for σ in
the EXACT declared query exactly as the integer margin steps stand in
for the float KGE loops (pin mechanics, not convergence — the float σ
path is what the held-out-AUC golden test exercises on a separable
corpus, where both surrogate and true σ rank identically).

100 TB shape: the weight table is ``n_features + 1`` rows (broadcast
side of every join); the corpus side is scanned once per step for z
and once for gradients, both map-side-combinable aggregations keyed by
doc_id / feat; nothing driver-side ever scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_features(
    docs: DataFrame,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, feat, cnt): hashing-trick bag-of-words — token count
    per md5-hash bucket — plus one bias feature (id = ``n_features``,
    cnt = 1) for every doc, so each doc has at least one feature row
    and the model has an intercept."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    counts = (
        toks.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast(
                    "long"
                )
                % n_features
            ).alias("feat"),
        )
        .groupBy("doc_id", "feat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bias = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(n_features).cast("long").alias("feat"),
        F.lit(1).cast("long").alias("cnt"),
    )
    return counts.unionByName(bias)


def _hard_sigmoid(z):
    """clamp(z/4 + 1/2, 0, 1) — exact dyadic wherever z is."""
    return F.least(
        F.greatest(z / F.lit(4.0) + F.lit(0.5), F.lit(0.0)), F.lit(1.0)
    )


def exact_fit_steps(
    feats: DataFrame,
    labels: DataFrame,
    n_steps: int = 2,
    lr_bits: int = 10,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``n_steps`` full-batch gradient steps of the hard-sigmoid
    logistic fit, w₀ = 0, wₛ = wₛ₋₁ − 2^-lr_bits · Σᵢ (pᵢ − yᵢ)·xᵢ.

    Exactness bounds (why every double is a dyadic rational with no
    rounding anywhere): after step s the weight denominator is
    2^(s·lr_bits + 2(s−1)); with lr_bits=10 and 2 steps that is 2⁻²²,
    and every numerator is bounded by corpus token volume ≤ ~2^33 —
    eleven orders below 2⁵³, so Spark's partial-sum order and DuckDB's
    serial sum produce bit-identical doubles.

    ``feats``: (doc_id, feat, cnt); ``labels``: (doc_id, y ∈ {0,1}).
    Returns (per_step, stats, weights):
      per_step — (step, feat, grad, w): summed gradient and updated
        weight after each step;
      stats — (step, n_docs, sum_p, brier): Σpᵢ and Σ(pᵢ−yᵢ)² per
        step (both exact dyadics);
      weights — (feat, w): the final weight table, for scoring.
    """
    lr = 2.0**-lr_bits
    # the feature table is traversed by EVERY step's activation and
    # gradient aggregation and again by every returned frame (the
    # per-step/stat outputs are lazy) — without a barrier each of those
    # actions re-runs the corpus tokenize+explode+groupBy (guide §5:
    # cache what is reused and expensive to recompute).  One eager
    # materialization here collapses O(n_steps·consumers) corpus
    # passes into one; the table is (doc_id, feat, cnt) — tiny next to
    # the corpus it derives from.
    feats = feats.localCheckpoint()
    lab = labels.select("doc_id", F.col("y").cast("long").alias("y"))
    w = None
    step_frames = []
    stat_frames = []
    for s in range(1, n_steps + 1):
        if w is None:
            z = lab.select("doc_id", F.lit(0.0).alias("z"))
        else:
            z = (
                feats.join(F.broadcast(w), "feat")
                .groupBy("doc_id")
                .agg(F.sum(F.col("cnt") * F.col("w")).alias("z"))
            )
        p = z.select("doc_id", _hard_sigmoid(F.col("z")).alias("p"))
        # n_docs rows, consumed by the gradient aggregation AND the
        # per-step stats frame — barrier so the activation join/agg
        # over feats runs once per step, not once per consumer
        pj = p.join(lab, "doc_id").localCheckpoint()
        grad = (
            feats.join(pj, "doc_id")
            .groupBy("feat")
            .agg(
                F.sum(
                    (F.col("p") - F.col("y")) * F.col("cnt")
                ).alias("grad")
            )
            # n_features rows, consumed by the weight update AND the
            # per-step output frame
            .localCheckpoint()
        )
        if w is None:
            new_w = grad.select(
                "feat", (-F.lit(lr) * F.col("grad")).alias("w")
            )
        else:
            # every feat present in `feats` received a gradient row
            # (the grad aggregation runs over feats itself), so the
            # join is complete — no outer-join null handling needed
            new_w = w.join(grad, "feat").select(
                "feat",
                (F.col("w") - F.lit(lr) * F.col("grad")).alias("w"),
            )
        # one small action per step: the weight table is n_features+1
        # rows — localCheckpoint truncates the per-step lineage so
        # step s+1's plan does not re-run step s's corpus aggregations
        w = new_w.localCheckpoint()
        step_frames.append(
            grad.join(w, "feat").select(
                F.lit(s).cast("long").alias("step"),
                "feat",
                "grad",
                "w",
            )
        )
        stat_frames.append(
            pj.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("p").alias("sum_p"),
                F.sum(
                    (F.col("p") - F.col("y"))
                    * (F.col("p") - F.col("y"))
                ).alias("brier"),
            ).select(F.lit(s).cast("long").alias("step"), "*")
        )
    per_step = step_frames[0]
    for fr in step_frames[1:]:
        per_step = per_step.unionByName(fr)
    stats = stat_frames[0]
    for fr in stat_frames[1:]:
        stats = stats.unionByName(fr)
    return per_step, stats, w


def score(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, z, p): classifier margin and hard-sigmoid probability
    for every doc in ``feats`` under the fitted ``weights`` — the
    keep/drop signal GPT-3 thresholds (they keep docs where
    score > 1 − β·pareto_draw; the deterministic analogue is a plain
    threshold on p)."""
    z = (
        feats.join(F.broadcast(weights), "feat")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("z"))
    )
    return z.select("doc_id", "z", _hard_sigmoid(F.col("z")).alias("p"))
