"""Exact-arithmetic distributed TransE training step.

One FULL-BATCH SGD step of margin-ranking TransE with **L1 distance**
(the other distance the original TransE paper trains with), expressed
entirely as DataFrame operations — gather (join), margin filter,
per-parameter segment-sum, SGD update — with NO Python evaluator in
the plan.  Reference semantics mirrored: the gather → margin loss →
backward → update loop of `TransE.scala:98-134` (L2Similarity there;
L1 here) and the violation-gated gradient flow of `hole.py:22-42`.

Why L1 + integers: on integer embeddings the L1 distance, the margin
test, and every gradient component (a difference of signs) are exact
BIGINT arithmetic, and with a power-of-two learning rate the updated
parameters are exact dyadic doubles — so the whole step is
bit-reproducible across engines and can sit under a DuckDB value
oracle (the EWMA α=½ / histogram-rank doctrine applied to training).

At 100 TB scale this is the shape that matters: embeddings live in a
TABLE (never a driver matrix), the three entity gathers + one relation
gather are shuffle joins on the id key, the gradient aggregation is
one map-side-combinable groupBy, and the update is a join-merge
projection — the same topology as `train/joinmerge.py`'s float
trainer, with no collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _isign(col):
    """Integer sign in {-1, 0, 1} as BIGINT (F.signum returns DOUBLE)."""
    return (
        F.when(col > 0, F.lit(1))
        .when(col < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )


def _gather_and_score(
    triples: DataFrame,
    entity_emb: DataFrame,
    relation_emb: DataFrame,
    n_entities: int,
    margin: int,
) -> DataFrame:
    """Shared gather + scoring pipeline: deterministic corruption,
    three entity joins + one relation join, per-dim differences and
    the raw margin loss — the single source both the SGD step and the
    loss summary derive from (they must never drift apart)."""
    t = triples.select(
        "s_id",
        "p_id",
        "o_id",
        ((F.col("o_id") + 1 + F.col("p_id")) % F.lit(n_entities)).alias(
            "n_id"
        ),
    )
    e = entity_emb.select(F.col("id"), F.col("vec"))
    r = relation_emb.select(F.col("id"), F.col("vec"))
    g = (
        t.join(e.select(F.col("id").alias("s_id"), F.col("vec").alias("sv")), "s_id")
        .join(r.select(F.col("id").alias("p_id"), F.col("vec").alias("pv")), "p_id")
        .join(e.select(F.col("id").alias("o_id"), F.col("vec").alias("ov")), "o_id")
        .join(e.select(F.col("id").alias("n_id"), F.col("vec").alias("nv")), "n_id")
    )
    dp = F.zip_with(
        F.zip_with("sv", "pv", lambda a, b: a + b), "ov", lambda a, b: a - b
    )
    dn = F.zip_with(
        F.zip_with("sv", "pv", lambda a, b: a + b), "nv", lambda a, b: a - b
    )
    zero = F.lit(0).cast("long")
    l1 = lambda arr: F.aggregate(  # noqa: E731 — local plumbing
        F.transform(arr, lambda x: F.abs(x)), zero, lambda acc, x: acc + x
    )
    return g.select(
        "s_id",
        "p_id",
        "o_id",
        "n_id",
        dp.alias("dp"),
        dn.alias("dn"),
        (F.lit(margin) + l1(dp) - l1(dn)).alias("raw_loss"),
    )


def transe_l1_sgd_step(
    triples: DataFrame,
    entity_emb: DataFrame,
    relation_emb: DataFrame,
    dim: int,
    n_entities: int,
    margin: int = 4,
    lr: float = 0.25,
) -> DataFrame:
    """One full-batch L1-TransE SGD step over integer embeddings.

    Parameters
    ----------
    triples : DataFrame(s_id, p_id, o_id) — positive triples.
    entity_emb : DataFrame(id, vec array<bigint> of length ``dim``).
    relation_emb : DataFrame(id, vec array<bigint> of length ``dim``).
    n_entities : corruption modulus for the deterministic negative
        ``o_neg = (o_id + 1 + p_id) % n_entities`` (the reference
        corrupts the tail with a random entity, `TransE.scala:94`;
        seeded determinism is this repo's doctrine).
    margin : integer margin of max(0, margin + ‖s+p−o⁺‖₁ − ‖s+p−o⁻‖₁).
    lr : learning rate; MUST be a power of two for dyadic exactness.

    Returns (kind, id, d, old_val, grad, new_val):
      kind 'E'/'R', old_val/grad BIGINT, new_val = old − lr·grad
      (exact dyadic DOUBLE).  Covers every parameter slot of the two
      embedding tables (grad 0 where no violating triple touches it).
    """
    scored = _gather_and_score(
        triples, entity_emb, relation_emb, n_entities, margin
    )
    zero = F.lit(0).cast("long")

    # margin filter: gradients flow only through violations (P4 shape)
    viol = scored.filter(F.col("raw_loss") > 0)
    sgn = lambda arr: F.transform(arr, _isign)  # noqa: E731
    gh = F.zip_with(sgn(F.col("dp")), sgn(F.col("dn")), lambda a, b: a - b)
    contrib = viol.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("E").alias("kind"),
                    F.col("s_id").alias("id"),
                    gh.alias("g"),
                ),
                F.struct(
                    F.lit("E").alias("kind"),
                    F.col("o_id").alias("id"),
                    F.transform(
                        sgn(F.col("dp")), lambda x: -x
                    ).alias("g"),
                ),
                F.struct(
                    F.lit("E").alias("kind"),
                    F.col("n_id").alias("id"),
                    sgn(F.col("dn")).alias("g"),
                ),
                F.struct(
                    F.lit("R").alias("kind"),
                    F.col("p_id").alias("id"),
                    gh.alias("g"),
                ),
            )
        ).alias("c")
    ).select("c.kind", "c.id", "c.g")

    # segment-sum without exploding dims (A6 shape, trainer.py doctrine)
    grads = (
        contrib.groupBy("kind", "id")
        .agg(
            *[
                F.sum(F.get("g", i)).cast("long").alias(f"_g{i}")
                for i in range(dim)
            ]
        )
        .select(
            "kind",
            "id",
            F.array(*[F.col(f"_g{i}") for i in range(dim)]).alias("g"),
        )
    )

    params = entity_emb.select(
        F.lit("E").alias("kind"), "id", "vec"
    ).unionByName(
        relation_emb.select(F.lit("R").alias("kind"), "id", "vec")
    )

    merged = params.join(grads, ["kind", "id"], "left")
    out = merged.select(
        "kind",
        "id",
        F.posexplode(
            F.zip_with(
                "vec",
                F.coalesce(
                    "g", F.array_repeat(zero, dim)
                ),
                lambda v, gr: F.struct(
                    v.alias("old_val"), gr.alias("grad")
                ),
            )
        ).alias("d", "s"),
    ).select(
        "kind",
        "id",
        F.col("d").cast("long").alias("d"),
        F.col("s.old_val").alias("old_val"),
        F.col("s.grad").alias("grad"),
        (
            F.col("s.old_val")
            - F.lit(lr).cast("double") * F.col("s.grad")
        ).alias("new_val"),
    )
    return out


def transe_l1_loss_summary(
    triples: DataFrame,
    entity_emb: DataFrame,
    relation_emb: DataFrame,
    dim: int,
    n_entities: int,
    margin: int = 4,
) -> DataFrame:
    """1-row (n_triples, n_violations, total_loss) for the SAME step —
    total_loss = Σ max(0, margin + ‖·‖₁ − ‖·‖₁), exact BIGINT.  Derives
    from the same _gather_and_score pipeline as the SGD step."""
    scored = _gather_and_score(
        triples, entity_emb, relation_emb, n_entities, margin
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.sum(
            F.when(F.col("raw_loss") > 0, 1).otherwise(0)
        ).cast("long").alias("n_violations"),
        F.sum(
            F.greatest(F.lit(0).cast("long"), F.col("raw_loss"))
        ).cast("long").alias("total_loss"),
    )
