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


def test_two_step_exact_loss_decreases(spark):
    """The declared two-step LOOP query must show learning between its
    per-step 'L' rows: fewer margin violations and lower total loss at
    step 2 (step 2 is evaluated on step 1's updated parameters, so a
    non-decrease would mean the chained update was not applied)."""
    df = mlops.QUERIES["kge_transe_two_step_exact"](spark, SF_SMOKE)
    l1, l2 = [
        r for r in df.filter("kind = 'L'").orderBy("step").collect()
    ]
    assert l1["old_val"] == l2["old_val"]          # same triple count
    assert l2["grad"] < l1["grad"]                 # fewer violations
    assert l2["new_val"] < l1["new_val"]           # lower total loss
    # lr=1 keeps parameters integer: every step-2 slot must be integral
    frac = df.filter(
        "kind <> 'L' AND new_val <> CAST(new_val AS BIGINT)"
    ).count()
    assert frac == 0
