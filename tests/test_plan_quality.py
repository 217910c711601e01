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


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A fact table partitioned on the join key must be scanned with a
    dynamicpruning subquery when joined to a filtered dim — at 100 TB
    this is the difference between scanning 3 partitions and 3,000."""
    fact_dir = str(tmp_path / "fact_part")
    spark.range(0, 50_000).selectExpr(
        "id", "id % 20 AS part_key", "id * 2 AS v"
    ).write.partitionBy("part_key").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.range(0, 20).selectExpr(
        "id AS part_key", "CASE WHEN id < 3 THEN 'hot' ELSE 'cold' END AS tag"
    )
    joined = fact.join(dim.filter("tag = 'hot'"), "part_key").groupBy(
        "part_key"
    ).count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(True)
    p = buf.getvalue()
    assert "dynamicpruning" in p.lower(), p[:2000]
    joined.collect()  # and it executes


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE must mark the skewed sort-merge join (skew=true) and split
    the hot partition — the runtime answer to power-law keys."""
    a_dir, b_dir = str(tmp_path / "skew_a"), str(tmp_path / "skew_b")
    # left: key 0 carries ~490k rows (several shuffle blocks), others
    # tiny.  Right: ONE row per key — the join output stays |left|, the
    # skew is purely a partition-size imbalance (a same-key many×many
    # join would self-multiply: 490k² pairs).
    spark.range(0, 500_000).selectExpr(
        "CASE WHEN id < 490000 THEN 0 ELSE id % 100 END AS k",
        "id AS va",
    ).write.mode("overwrite").parquet(a_dir)
    spark.range(0, 100).selectExpr(
        "id AS k", "id * 7 AS vb"
    ).write.mode("overwrite").parquet(b_dir)
    a, b = spark.read.parquet(a_dir), spark.read.parquet(b_dir)
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        # disable BOTH broadcast paths (static + AQE runtime) so the
        # join stays sort-merge — skew splitting only applies to SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "512KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB"
        )
        # downstream must be a GLOBAL agg: a groupBy(k) would reuse the
        # join's hash partitioning, so skew-splitting would introduce an
        # extra shuffle and AQE (correctly) declines; a row filter gets
        # pushed below the exchange and drains the skew before the join
        joined = a.join(b, "k").selectExpr("sum(va + vb) AS s")
        joined.collect()  # AQE decisions exist only in the FINAL plan
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        p = buf.getvalue()
        assert "skew=true" in p, p[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_adam_merge_update_is_codegen_not_python(spark):
    """The Adam join-merge update (m/v EMAs + bias-corrected step) must
    plan as pure array expressions — any Python evaluator in the merge
    stage would put the optimizer on the slow path at every epoch."""
    from pyspark.sql import functions as F

    from spark_tensors_spark.train.joinmerge import JoinMergeKGETrainer

    t = JoinMergeKGETrainer(
        spark, n_entities=20, n_relations=2, dim=4,
        model="transe", optimizer="adam", seed=11,
    )
    agg = spark.createDataFrame(
        [("E", 0, [0.1, 0.2, 0.3, 0.4], 2)],
        "param string, id long, g array<double>, c long",
    )
    merged = t._merge_step(agg, t.E_df, "E")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        merged.explain("formatted")
    p = buf.getvalue()
    # the init path is mapInPandas (ArrowEvalPython) by design; the
    # merge must not ADD any Python stage beyond it
    assert "BatchEvalPython" not in p
    assert p.count("ArrowEvalPython") == 0


def test_cpals_solve_merge_is_codegen_not_python(spark):
    """JoinMergeCPALS's normal-equation solve (M @ G⁻¹) is a LEFT-JOIN
    array projection — no Python evaluator may appear in it."""
    import numpy as np

    from spark_tensors_spark.train.parafac import JoinMergeCPALS

    jm = JoinMergeCPALS(spark, 5, 4, 3, rank=2, seed=3)
    m_wide = spark.createDataFrame(
        [(0, [1.0, 2.0])], "i long, m array<double>"
    )
    # localCheckpoint in _solve_merge materializes; plan-check the
    # expression BEFORE checkpoint via the same construction
    r = jm.rank
    from pyspark.sql import functions as F
    ginv = np.eye(2)
    joined = jm.A_df.select("i").join(m_wide, "i", "left")
    has_m = F.col("m").isNotNull()
    cols = []
    for col_r in range(r):
        acc = F.lit(0.0)
        for s in range(r):
            acc = acc + F.get("m", s) * F.lit(float(ginv[s, col_r]))
        cols.append(F.when(has_m, acc).otherwise(F.lit(0.0)))
    out = joined.select("i", F.array(*cols).alias("vec"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p


def test_pii_scrub_pure_codegen(spark):
    """PII scrub is scan-side codegen: no Python evaluator anywhere,
    partial+final agg, and a 2-column pruned documents scan."""
    from spark_tensors_spark.queries import pipeline_queries as pq

    p = plan(spark, pq.QUERIES["doc_pii_scrub"])
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in p
    assert p.count("HashAggregate") >= 2
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "text" in read and "source" in read and "lang" not in read


def test_zorder_stats_pure_codegen(spark):
    """Morton interleave is shift/mask codegen — no Python, partial
    agg, 2-column events scan."""
    from spark_tensors_spark.queries import temporal_queries as tq

    p = plan(spark, tq.QUERIES["ev_zorder_stats"])
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in p
    assert p.count("HashAggregate") >= 2
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "event_type" not in read and "props" not in read


def test_gram_aggregates_batch_partials(spark):
    """The Gram shuffle carries per-batch partials (MapInPandas feeding
    the aggregate), never an exploded per-row d^2 expansion."""
    from spark_tensors_spark.queries import pipeline_queries as pq

    p = plan(spark, pq.QUERIES["emb_gram_int8"])
    assert "MapInPandas" in p
    assert "Generate" not in p  # no explode in the statistic path
    assert p.count("HashAggregate") >= 2
