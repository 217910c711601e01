"""Repo-wide physical-plan hygiene for EVERY declared query:

- ``BatchEvalPython`` (row-at-a-time Python UDF) appears NOWHERE — all
  Python is Arrow-batched (pandas_udf / mapInPandas / applyInPandas).
- ``CartesianProduct`` (unbroadcast cross product) appears NOWHERE.
- ``BroadcastNestedLoopJoin`` only where a small broadcast side is the
  intended plan, each with a reason in the allowlist below.

One sweep builds all plans at sf0.001 (the streaming-state and
training queries execute their driver work once — that is what makes
their returned frame's plan real).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_SMOKE

# BroadcastNestedLoopJoin is the CORRECT plan when one side is a scalar
# or a capped/bounded broadcast; every entry documents why.
BNLJ_ALLOWED = {
    # 1-row corpus-size scalar cross-joined into the TF-IDF scoring
    "doc_tfidf_top_terms",
    # two 1-row statistics (N, Σdl) cross-joined into the BM25 scoring
    "doc_bm25_topk",
    # 1-row LM statistics (T, V) cross-joined into the per-token scorer
    "doc_lm_perplexity",
    # 1-row global-average-balance scalar cross-joined into the filter
    "q22_sales_opportunity",
    # declared all-pairs baseline, oracle-bounded to vec_id < 300; the
    # scale path is emb_near_dup_bucketed
    "emb_near_dup_pairs",
    # 1-row (total, n_keys) scalar cross-joined into the hot-key
    # threshold comparison
    "ev_skew_split_join",
    # 1-row total-pair-count scalar cross-joined onto the bounded
    # top-100 verified fuzzy pairs
    "q27_fastss_name_pairs",
    # 1-row total-span-count scalar cross-joined onto the bounded
    # top-25 maximal repeated spans
    "doc_max_dup_spans",
    # |event_types|² pair enumeration (≤ 25 rows each side); everything
    # downstream of the pair frame is sketch-sized (≤ k rows per type)
    "ev_kmv_user_overlap",
    # bounded negative-sample frame broadcast against the rejection set
    "kg_q18_neg_reject",
    # 1-row normal-equation matrix G (R(R+1)/2 aggregate) broadcast
    # onto the mode-sized MTTKRP result — the ALS solve never leaves
    # the executors
    "tns_cp_als_step_exact",
    # same shape at rank 3: 1-row G/adjugate broadcast onto the
    # mode-sized MTTKRP result
    "tns_cp_als_rank3_exact",
    # exact objective trajectory: four 1-row scalar frames (nnz/ip0,
    # norm0, tr1, G) cross-joined into the 2-row stage output; the
    # only data-sized work is the two COO aggregates upstream
    "tns_cp_als_fit",
    # 1-row (T, V) model-total scalars cross-joined into the
    # vocab-bounded cost/log-ratio tables (unigram EM fit / DSIR)
    "doc_unigram_fit",
    "doc_dsir_weights",
    # bounded query frame (vec_id % 500) broadcast onto the coarse
    # prefix-dot scan — the Matryoshka cascade's cheap stage
    "emb_matryoshka_topk",
    # 1-row count scalar (n) cross-joined into the variance numerators
    "emb_pca_topvar",
    # J7 eval expansion: entity matrix broadcast by design (closure/
    # broadcast guarded); metrics variants inherit the ranks plan
    "kg_q19_ranks",
    "kg_q19_metrics",
    "kg_q19_filtered_ranks",
    "kg_q19_filtered_metrics",
    # candidate generation against ALL entities IS the semantics: the
    # tiny test-triple side broadcasts, the entity range stays
    # distributed — the intended 100×-scale ranking plan
    "kge_transe_rank_join",
    "kge_rescal_rank_join",
    "kge_hole_rank_join",
}


@pytest.fixture(scope="module")
def all_frames(spark):
    import __spark_entry__ as entry

    frames = {}
    for name, fn in sorted(entry.queries().items()):
        frames[name] = fn(spark, SF_SMOKE)
    return frames


@pytest.fixture(scope="module")
def all_plans(all_frames):
    plans = {}
    for name, df in all_frames.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plans[name] = buf.getvalue()
    return plans


def test_compared_output_is_scalar_only(all_frames):
    """Driver-contract invariant: the driver's canonicalizer sorts the
    compared result as a pandas DataFrame, and ``sort_values`` on a
    list/dict-typed column throws ``TypeError: unhashable type`` — the
    sole r11 CORRECTNESS failure (doc_pad_sequences' array<bigint>
    column).  Every declared query's output schema must therefore be
    scalar-only; arrays are compared element-wise via posexplode rows
    or joined into strings."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {
        name: [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        for name, df in all_frames.items()
    }
    assert {n: c for n, c in offenders.items() if c} == {}


def test_no_row_at_a_time_python(all_plans):
    offenders = [n for n, p in all_plans.items() if "BatchEvalPython" in p]
    assert offenders == []


def test_no_cartesian_product(all_plans):
    offenders = [n for n, p in all_plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_nested_loop_joins_are_allowlisted(all_plans):
    offenders = [
        n
        for n, p in all_plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == []
    # the allowlist must not rot: entries that no longer plan a BNLJ
    # should be removed so the gate stays tight
    stale = [
        n
        for n in BNLJ_ALLOWED
        if n in all_plans and "BroadcastNestedLoopJoin" not in all_plans[n]
    ]
    assert stale == []
