"""GOLDEN pins for the three KGE training smokes (rows-only in the
driver gate — iterative SGD is not SQL-expressible, so a fixed-seed
exact trajectory is the strongest check available; same doctrine as
`tns_cp_als_fit`).  The whole pipeline is deterministic by design:
hash-seeded init, xxhash64-ordered sample, closed-form gradients —
the 6-dp metrics are pinned EXACTLY, and a drift in any stage
(sampling, remap, kernels, optimizer, ranking) shows up here."""

from __future__ import annotations

from spark_tensors_spark.queries import mlops
from tests.conftest import SF_SMOKE

GOLDEN = {
    "kge_transe_train_metrics": (0.103647, 53.2, 20, 0.05, 0.1, 0.25),
    "kge_rescal_train_metrics": (0.005834, 349.2, 10, 0.0, 0.0, 0.0),
    "kge_hole_train_metrics": (0.002689, 623.2, 10, 0.0, 0.0, 0.0),
    # HELD-OUT filtered eval on the clustered fixture (SURVEY §7.1 M3):
    # every test edge was never trained on, yet ranks ~2/112
    "kge_generalization_metrics": (0.5, 2.0, 120, 0.0, 1.0, 1.0),
}


def test_kge_training_smokes_golden(spark):
    for name, want in GOLDEN.items():
        df = mlops.QUERIES[name](spark, SF_SMOKE)
        assert df.columns == [
            "mrr", "mean_rank", "n", "hits1", "hits3", "hits10"
        ]
        rows = [tuple(r) for r in df.collect()]
        assert rows == [want], (name, rows)


def test_generalization_beats_random_10x(spark):
    """The M3 exit criterion itself, independent of the exact golden:
    held-out filtered Hits@10 ≥ 10× the random baseline (10 of 112
    candidates after filtering ⇒ random ≈ 0.0893)."""
    df = mlops.QUERIES["kge_generalization_metrics"](spark, SF_SMOKE)
    m = df.collect()[0]
    assert m["hits10"] >= 10 * (10.0 / 112.0), m
    assert m["n"] == 120


import pytest


@pytest.mark.parametrize(
    "qname, descends",
    [
        ("kge_transe_two_step_exact", True),
        ("kge_rescal_two_step_exact", False),
        ("kge_hole_two_step_exact", False),
    ],
)
def test_two_step_exact_loop_chains(spark, qname, descends):
    """Every declared two-step LOOP query must prove the chain was
    applied between its per-step 'L' rows, and lr=1 must keep every
    step-2 parameter slot integral (the exact-BIGINT closure the
    oracle relies on).

    Descent is asserted ONLY for TransE: its sign gradients are
    bounded by the violation count, so a full-batch lr=1 step is a
    contraction on this data.  RESCAL / HolE gradients scale with
    parameter PRODUCTS — at lr=1 the loop measurably overshoots
    (fewer/other violators but exploding residual margins), which the
    DuckDB oracle replays exactly; the queries pin the loop MECHANICS,
    not convergence (convergent float training is the train_metrics
    family)."""
    df = mlops.QUERIES[qname](spark, SF_SMOKE)
    l1, l2 = [
        r for r in df.filter("kind = 'L'").orderBy("step").collect()
    ]
    assert l1["old_val"] == l2["old_val"]          # same triple count
    # the chain was applied: step 2 was scored on DIFFERENT parameters
    assert (l2["grad"], l2["new_val"]) != (l1["grad"], l1["new_val"])
    if descends:
        assert l2["grad"] < l1["grad"]             # fewer violations
        assert l2["new_val"] < l1["new_val"]       # lower total loss
    # lr=1 keeps parameters integer: every step-2 slot must be integral
    frac = df.filter(
        "kind <> 'L' AND new_val <> CAST(new_val AS BIGINT)"
    ).count()
    assert frac == 0


def test_three_step_entity_loop_chains(spark):
    """kge_transe_three_step_entity: the FULL-KG three-iteration loop
    must (a) keep the triple count constant across its three 'L' rows,
    (b) strictly shrink the VIOLATION count at every step while the
    loss values stay pairwise distinct (the chain was applied), and
    (c) keep every final-step parameter slot integral (the
    exact-BIGINT closure its DuckDB oracle replays).

    Unlike the mod-11 subset of kge_transe_two_step_exact, the full KG
    does NOT descend in total loss at lr=1: only 3 relations exist, so
    each full-batch R-slot gradient is a sign-sum over O(|KG|) triples
    and the relation step overshoots (violations fall, residual
    margins explode) — the loop pins MECHANICS, not convergence, and
    the DuckDB oracle replays the overshooting trajectory exactly
    (the kge-exact-loop doctrine; convergent float training is the
    train_metrics family)."""
    df = mlops.QUERIES["kge_transe_three_step_entity"](spark, SF_SMOKE)
    losses = df.filter("kind = 'L'").orderBy("step").collect()
    assert len(losses) == mlops.ENTITY_LOOP_STEPS
    assert len({r["old_val"] for r in losses}) == 1   # same triple count
    viol = [r["grad"] for r in losses]
    loss = [r["new_val"] for r in losses]
    assert viol == sorted(viol, reverse=True) and len(set(viol)) == len(viol)
    assert len(set(loss)) == len(loss)  # every step rescored the chain
    frac = df.filter(
        "kind <> 'L' AND new_val <> CAST(new_val AS BIGINT)"
    ).count()
    assert frac == 0


@pytest.mark.parametrize(
    "qname", ["kge_rescal_two_step_entity", "kge_hole_two_step_entity"]
)
def test_bilinear_entity_loops_chain_and_stay_int64(spark, qname):
    """The ENTITY-SCALE bilinear/holographic two-step loops (r12
    verdict item 8): the r12 rejection held only for the ±6/±5 init —
    the ternary init keeps the whole chain int64-exact.  Pin (a) the
    chain really ran (two distinct 'L' rows over a constant triple
    count), (b) every final-step parameter slot is integral (the
    BIGINT closure the DuckDB oracle replays), and (c) the REALIZED
    magnitudes sit at least a decade inside int64 (the analytic bound
    in queries/mlops.py, checked numerically — the same discipline as
    tns_cp_als_rank3_exact's overflow docstring)."""
    df = mlops.QUERIES[qname](spark, SF_SMOKE).localCheckpoint()
    losses = df.filter("kind = 'L'").orderBy("step").collect()
    assert len(losses) == 2
    assert len({r["old_val"] for r in losses}) == 1   # same triple count
    assert len({r["new_val"] for r in losses}) == 2   # both steps scored
    frac = df.filter(
        "kind <> 'L' AND new_val <> CAST(new_val AS BIGINT)"
    ).count()
    assert frac == 0
    bound = (2**63 - 1) // 10  # a decade of headroom
    mx = (
        df.filter("kind <> 'L'")
        .selectExpr(
            "max(abs(old_val)) AS a",
            "max(abs(grad)) AS b",
            "max(abs(new_val)) AS c",
        )
        .first()
    )
    assert max(mx["a"], mx["b"], int(mx["c"])) < bound, mx
