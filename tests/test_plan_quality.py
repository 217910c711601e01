"""Physical-plan regression tests: the scale properties SCALE.md claims
(pushdown, pruning, broadcast, partial agg, top-k pushdown) must be
visible in the actual plans — a refactor that silently loses one of
these passes value-correctness but regresses at scale.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from spark_tensors_spark.queries import relational as rq
from tests.conftest import SF_SMOKE

SF = SF_SMOKE


def plan(spark, fn):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(spark, SF).explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    p = plan(spark, rq.QUERIES["q1_pricing_summary"])
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # projection pruning: no unused lineitem columns in the scan schema
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]


def test_q1_partial_aggregation(spark):
    p = plan(spark, rq.QUERIES["q1_pricing_summary"])
    assert p.count("HashAggregate") >= 2  # partial + final


def test_q3_broadcasts_filtered_dim(spark):
    p = plan(spark, rq.QUERIES["q3_filtered_dim_join"])
    assert "BroadcastHashJoin" in p
    assert "EqualTo(c_mktsegment,BUILDING)" in p  # filter pushed pre-broadcast


def test_q9_topk_never_full_sorts(spark):
    p = plan(spark, rq.QUERIES["q9_topk"])
    assert "TakeOrderedAndProject" in p


def test_q7_window_group_limit(spark):
    p = plan(spark, rq.QUERIES["q7_rank_topk"])
    assert "WindowGroupLimit" in p  # rank<=k truncates before exchange


def test_q4_plans_anti_join(spark):
    p = plan(spark, rq.QUERIES["q4_anti_join"])
    assert "LeftAnti" in p


def test_q5_plans_semi_join(spark):
    p = plan(spark, rq.QUERIES["q5_semi_join"])
    assert "LeftSemi" in p


def test_multimodal_catalog_prunes_payload(spark):
    """Metadata rollup must not deserialize document text beyond the
    projection — the payload-free-scan property of SCALE.md."""
    from spark_tensors_spark.queries import multimodal_queries as mq

    p = plan(spark, mq.QUERIES["mm_media_catalog"])
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read


def test_asof_join_is_windowed_not_joined(spark):
    """The as-of join must plan as union + window (single shuffle on the
    key) — any Join node means the pairwise-expansion form snuck back."""
    from spark_tensors_spark.queries import temporal_queries as tq

    p = plan(spark, tq.QUERIES["ev_asof_last_click"])
    assert "Window" in p
    assert "Join" not in p


def test_interval_join_is_equi_not_cartesian(spark):
    from spark_tensors_spark.queries import temporal_queries as tq

    p = plan(spark, tq.QUERIES["ev_range_click_stats"])
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )


def test_mttkrp_broadcasts_factors(spark):
    from spark_tensors_spark.queries import tensor_queries as tq

    p = plan(spark, tq.QUERIES["tns_mttkrp"])
    assert p.count("BroadcastHashJoin") >= 2  # both factor sides
    assert "CartesianProduct" not in p


def test_q19_expansion_broadcasts_test_side(spark):
    from spark_tensors_spark.queries import kg as kq

    p = plan(spark, kq.QUERIES["kg_q19_ranks"])
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p


def _raw_plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lsh_bucket_cap_broadcasts_oversized_side(spark):
    """The anti-skew guard must broadcast the OVERSIZED-bucket aggregate
    (bounded: < N/cap rows) and left-anti against it — broadcasting the
    small-bucket list is O(N) rows and OOMs at scale."""
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline import dedup

    sigs = dedup.minhash_signatures(load_table(spark, SF, "documents"))
    p = _raw_plan(dedup.lsh_candidate_pairs(sigs, max_bucket_size=64))
    assert "LeftAnti" in p and "LeftSemi" not in p
    # the broadcast side is the count>cap aggregate, not the banded table
    assert "BroadcastExchange" in p
    assert "> 64" in p and "<= 64" not in p


def test_simhash_bucket_cap_broadcasts_oversized_side(spark):
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.pipeline import dedup

    sim = dedup.simhash64(load_table(spark, SF, "documents"))
    p = _raw_plan(dedup.simhash_candidates(sim, max_bucket_size=64))
    assert "LeftAnti" in p and "LeftSemi" not in p
    assert "BroadcastExchange" in p
    assert "> 64" in p and "<= 64" not in p
