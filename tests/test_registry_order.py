"""Registration-order policy + type-faithful harness regression tests.

The driver's correctness gate samples the FIRST N registered queries,
so the ordering policy (`__spark_entry__._order_queries`) is itself
contract surface: failed / never-gated / newly-oracled queries must
always rotate INTO the window, green queries rotate by staleness, and
no hand-ordering exists to steer modified queries out (ADVICE r3).
"""

from __future__ import annotations

import json

import __spark_entry__ as entry


def _order(queries, oracles, hist):
    q, _ = entry._order_queries(
        {name: (lambda *_: None) for name in queries},
        {name: "SELECT 1" for name in oracles},
        hist,
    )
    return list(q)


def test_failed_and_never_gated_sort_first():
    hist = {
        "green_r1": (1, "ok"),
        "green_r3": (3, "ok"),
        "failed": (0, "fail"),
    }
    order = _order(
        ["green_r3", "green_r1", "failed", "brand_new"],
        ["green_r3", "green_r1", "failed", "brand_new"],
        hist,
    )
    assert order == ["brand_new", "failed", "green_r1", "green_r3"]


def test_new_oracle_on_weak_query_fronts_it():
    hist = {"was_rows_only": (2, "weak"), "green_r1": (1, "ok")}
    # oracle now declared → never hash-verified → front of the window
    order = _order(
        ["green_r1", "was_rows_only"],
        ["green_r1", "was_rows_only"],
        hist,
    )
    assert order[0] == "was_rows_only"
    # still rows-only by design → keeps its weak-gate round (rotates)
    order2 = _order(["green_r1", "was_rows_only"], ["green_r1"], hist)
    assert order2 == ["green_r1", "was_rows_only"]


def test_rotation_by_staleness_not_by_family():
    hist = {f"q{i}": ((i % 3) + 1, "ok") for i in range(9)}
    order = _order([f"q{i}" for i in range(9)],
                   [f"q{i}" for i in range(9)], hist)
    rounds = [hist[q][0] for q in order]
    assert rounds == sorted(rounds)


def test_gate_history_fail_then_fix_uses_fix_round(tmp_path):
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q": {"hash_match": False, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "q": {"hash_match": True, "err": None},
        "r": {"hash_match": False, "err": None},
        "w": {"hash_match": None, "err": "no_oracle"},
    }))
    hist = entry._gate_history(str(tmp_path))
    assert hist["q"] == (3, "ok")      # fixed and re-verified
    assert hist["r"] == (0, "fail")    # failure pins to round 0
    assert hist["w"] == (3, "weak")    # rows-only record


def test_live_registry_window_covers_failed_and_stale():
    """The real registry (real CORRECTNESS files): every query whose
    last gate FAILED or whose oracle is newer than its last gate (score
    0) must be inside the driver's 50-query window, as long as they fit."""
    import os

    qs, oracles = entry._registry()
    names = list(qs)
    hist = entry._gate_history(os.path.dirname(entry.__file__))

    def score(q):
        rnd, kind = hist.get(q, (0, "never"))
        if kind == "ok":
            return rnd
        if kind == "weak":
            return 0 if q in oracles else rnd
        return 0

    urgent = {q for q in names if score(q) == 0}
    window = set(names[:50])
    if len(urgent) <= 50:
        assert urgent <= window, urgent - window
    # and the ordering is globally non-decreasing in staleness score
    scores = [score(q) for q in names]
    assert scores == sorted(scores)


def _front_cohort(names, oracles, hist):
    """All score-0 queries (failed / never gated / newly-oracled) —
    the registry fronts EXACTLY this set, so per-round window tests
    must assert membership in this slice, not in a slice sized by the
    round's own set (a later round's ungated addition that sorts
    alphabetically earlier would otherwise break older tests)."""
    def score(q):
        rnd, kind = hist.get(q, (0, "never"))
        if kind == "ok":
            return rnd
        if kind == "weak":
            return 0 if q in oracles else rnd
        return 0

    n_front = sum(1 for q in names if score(q) == 0)
    return set(names[:n_front])


def test_r10_new_oracles_lead_the_window():
    """The five round-10 oracles (two exact KGE steps, the exact ALS
    solve, and the two rows-only→oracled conversions) must front the
    driver window UNTIL a correctness record gates them — after that
    they rotate like everyone else (the assertion self-retires)."""
    import os

    qs, oracles = entry._registry()
    names = list(qs)
    hist = entry._gate_history(os.path.dirname(entry.__file__))
    new10 = {
        "kge_rescal_step_exact",
        "kge_hole_step_exact",
        "tns_cp_als_step_exact",
        "emb_pca_topvar",
        "doc_compression_stats",
    }
    ungated = {
        q for q in new10
        if hist.get(q, (0, "never"))[1] != "ok"
    }
    front = _front_cohort(names, oracles, hist)
    assert ungated <= front, ungated - front


def test_r11_new_oracles_lead_window_without_displacing_stale_trio():
    """The three round-11 oracles (the two-step exact training LOOP,
    the fused e2e curation pipeline, the rank-3 exact ALS solve) front
    the window until gated (self-retiring, like the r10 assertion) —
    AND the three r6-stale queries the r10 verdict flagged
    (q21_basket_lift, q22_sales_opportunity, tns_als_normal_eq) must
    still sit inside the 50-slot window behind them."""
    import os

    qs, oracles = entry._registry()
    names = list(qs)
    hist = entry._gate_history(os.path.dirname(entry.__file__))
    new11 = {
        "kge_transe_two_step_exact",
        "doc_pipeline_e2e",
        "tns_cp_als_rank3_exact",
        "doc_pad_sequences",
        "kge_rescal_two_step_exact",
        "kge_hole_two_step_exact",
        "kge_rescal_rank_join",
        "kge_hole_rank_join",
    }
    ungated = {
        q for q in new11
        if hist.get(q, (0, "never"))[1] != "ok"
    }
    front = _front_cohort(names, oracles, hist)
    assert ungated <= front, ungated - front
    stale_trio = {
        "q21_basket_lift", "q22_sales_opportunity", "tns_als_normal_eq",
    }
    still_stale = {
        q for q in stale_trio if hist.get(q, (99, "ok"))[0] <= 6
    }
    assert still_stale <= set(names[:50]), still_stale - set(names[:50])


def test_r12_new_oracles_lead_window_without_displacing_r7_set():
    """The round-12 entries (the fixed doc_pad_sequences — r11's sole
    gate failure, now scalar-output — and the new entity-scale 3-step
    loop) front the window until gated (self-retiring), AND the full
    r7-stale set the r11 verdict flagged must still sit inside the
    50-slot window behind them (the rotation must re-gate them in
    r12)."""
    import os

    qs, oracles = entry._registry()
    names = list(qs)
    hist = entry._gate_history(os.path.dirname(entry.__file__))
    new12 = {
        "doc_pad_sequences",
        "kge_transe_three_step_entity",
        "doc_temperature_mixture",
        "doc_decontaminate_ratio",
    }
    ungated = {
        q for q in new12
        if hist.get(q, (0, "never"))[1] != "ok"
    }
    front = _front_cohort(names, oracles, hist)
    assert ungated <= front, ungated - front
    r7_set = {
        "graph_link_prediction", "graph_sssp", "mm_media_catalog",
        "mm_wav_energy", "q20_dominant_supplier", "q23_portable_sql",
        "q24_local_supplier_revenue", "q25_fk_orphans", "tns_cp_als_fit",
        "tns_mttkrp",
    }
    still_stale = {
        q for q in r7_set if hist.get(q, (99, "ok"))[0] <= 7
    }
    assert still_stale <= set(names[:50]), still_stale - set(names[:50])


def test_r13_new_oracles_lead_window_with_r8_set_inside():
    """Round-13 entries (the five new oracles: the exact CP-ALS
    trajectory that retired the rows-only slot, the unigram EM fit,
    DSIR, and both entity-scale bilinear loops) front the window until
    gated, AND the 10 r8-stale queries the r12 verdict flagged must
    still sit inside the 50-slot window behind them — after
    CORRECTNESS_r13 lands, no query's last green record should predate
    r9."""
    import os

    qs, oracles = entry._registry()
    names = list(qs)
    hist = entry._gate_history(os.path.dirname(entry.__file__))
    new13 = {
        "tns_cp_als_fit",
        "doc_unigram_fit",
        "doc_dsir_weights",
        "kge_rescal_two_step_entity",
        "kge_hole_two_step_entity",
    }
    ungated = {
        q for q in new13 if hist.get(q, (0, "never"))[1] != "ok"
    }
    front = _front_cohort(names, oracles, hist)
    assert ungated <= front, ungated - front
    r8_set = {
        "kg_void_stats", "mm_thumbnails", "q14_pivot", "q18_bloom_join",
        "q19_lateral_topn", "q26_volume_shipping", "q27_fastss_name_pairs",
        "q28_cust_distribution", "q29_waiting_supplier",
        "tns_mttkrp_shuffle",
    }
    still_stale = {
        q for q in r8_set if hist.get(q, (99, "ok"))[0] <= 8
    }
    assert still_stale <= set(names[:50]), still_stale - set(names[:50])
