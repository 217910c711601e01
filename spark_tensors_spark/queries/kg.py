"""KG-surface queries Q14–Q19 (SURVEY §2.11, group A).

The driver's DuckDB oracle only pre-registers the star-schema views, so
every KG query *derives* its triple table from those views — identically
on both sides: Spark via ``kg.graph_source.triples_raw`` +
``kg.dictionary``, DuckDB via the ``TRIPLES_CTE`` below.

Determinism notes:
  - ids are ``row_number() over (order by uri) - 1`` on both sides (the
    Spark side computes it distributed; see ``kg/dictionary.py``);
  - the Q19 pseudo-score is pure integer arithmetic + one division —
    bit-identical across engines (no libm transcendentals);
  - Q18's corruption candidates are the deterministic FIXTURES.md A4
    formula ``(o_id + k*7919) % N``, k=1..4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.kg.dictionary import build_dictionaries, encode_triples
from spark_tensors_spark.kg.graph_source import triples_raw
from spark_tensors_spark.kg.tensor import to_coo, with_block_ids

TRIPLES_CTE = """
WITH triples_raw AS (
    SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS s,
           'in_nation' AS p,
           'n:' || CAST(c_nationkey AS VARCHAR) AS o
    FROM customer
    UNION ALL
    SELECT 's:' || CAST(s_suppkey AS VARCHAR), 'in_nation',
           'n:' || CAST(s_nationkey AS VARCHAR)
    FROM supplier
    UNION ALL
    SELECT 'n:' || CAST(n_nationkey AS VARCHAR), 'in_region',
           'rg:' || CAST(n_regionkey AS VARCHAR)
    FROM nation
    UNION ALL
    SELECT 'o:' || CAST(o_orderkey AS VARCHAR), 'placed_by',
           'c:' || CAST(o_custkey AS VARCHAR)
    FROM orders
),
entity_dict AS (
    SELECT uri, CAST(ROW_NUMBER() OVER (ORDER BY uri) - 1 AS BIGINT) AS id
    FROM (SELECT DISTINCT uri
          FROM (SELECT s AS uri FROM triples_raw
                UNION ALL
                SELECT o FROM triples_raw) u) d
),
relation_dict AS (
    SELECT uri, CAST(ROW_NUMBER() OVER (ORDER BY uri) - 1 AS BIGINT) AS id
    FROM (SELECT DISTINCT p AS uri FROM triples_raw) d
),
triples_encoded AS (
    SELECT es.id AS s_id, r.id AS p_id, eo.id AS o_id
    FROM triples_raw t
    JOIN entity_dict es ON t.s = es.uri
    JOIN entity_dict eo ON t.o = eo.uri
    JOIN relation_dict r ON t.p = r.uri
)
"""


# Dictionary encoding is one-time ingestion work (the reference builds
# its dictionaries once per dataset, RDFDatasetReader.scala:28-33) —
# memoize the encoded KG per (session, dataset) so each declared query
# pays query cost, not repeated ingestion cost.  Entries persist for the
# session lifetime; size is the encoded triple table (3 longs/row).
_ENCODED_CACHE: dict[tuple[int, str], tuple] = {}


def _encoded(spark: SparkSession, sf_dir: str):
    # applicationId, not id(spark): a recycled object address must not
    # resurrect DataFrames bound to a stopped SparkContext
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _ENCODED_CACHE.get(key)
    if hit is not None:
        return hit
    # raw is scanned by BOTH dictionary builds (entity sample + counts,
    # relation sample + counts) AND the encode joins — persist it once
    # up front or the 4-table union recomputes on every one of those
    # five actions (measured ~2× slowdown of the cold build)
    raw = triples_raw(spark, sf_dir).persist()
    ent, rel = build_dictionaries(raw)
    ent = ent.persist()
    rel = rel.persist()
    enc = encode_triples(raw, ent, rel).persist()
    _ENCODED_CACHE[key] = (raw, ent, rel, enc)
    return _ENCODED_CACHE[key]


def kg_q14_entity_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    _raw, ent, _rel, _enc = _encoded(spark, sf_dir)
    return ent.orderBy("uri")


def kg_q14_relation_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    _raw, _ent, rel, _enc = _encoded(spark, sf_dir)
    return rel.orderBy("uri")


def kg_q15_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _raw, _e, _r, enc = _encoded(spark, sf_dir)
    return enc.orderBy("s_id", "p_id", "o_id")


def kg_q16_lcwa_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCWA (s,p) co-occurrence counts ≡ A4 (`sample.py:99-101`)."""
    _raw, _e, _r, enc = _encoded(spark, sf_dir)
    return (
        enc.groupBy("s_id", "p_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("s_id", "p_id")
    )


def kg_q17_type_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-relation distinct subject/object counts ≡ A5 deterministic
    form (`sample.py:114-121`)."""
    _raw, _e, _r, enc = _encoded(spark, sf_dir)
    return (
        enc.groupBy("p_id")
        .agg(
            F.countDistinct("s_id").alias("ns"),
            F.countDistinct("o_id").alias("no"),
        )
        .orderBy("p_id")
    )


def kg_q18_neg_reject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join rejection count over deterministic corruption
    candidates ≡ J4/Q18 (`sample.py:39-47`; FIXTURES.md A4)."""
    _raw, ent, _r, enc = _encoded(spark, sf_dir)
    n_ent = ent.agg(F.count(F.lit(1)).alias("_n"))
    cands = (
        enc.crossJoin(F.broadcast(n_ent))
        .withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(4))))
        .select(
            "s_id",
            "p_id",
            ((F.col("o_id") + F.col("k") * 7919) % F.col("_n")).alias("o_id"),
        )
    )
    return (
        cands.join(enc, on=["s_id", "p_id", "o_id"], how="left_anti")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _q19_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Q19 core: rank the true customer of sampled orders among
    all customer-entity candidates with a deterministic pseudo-score.

    ≡ W1 ranking (`kge/hole.py:394-405`): per test triple, score every
    candidate, rank the true object (ties broken by o_id).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    _raw, ent, rel, _enc = _encoded(spark, sf_dir)

    test = orders.filter(F.col("o_orderkey") % 1009 == 0).select(
        F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("su"),
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("ou"),
    )
    ent_s = ent.select(F.col("uri").alias("su"), F.col("id").alias("s_id"))
    ent_o = ent.select(F.col("uri").alias("ou"), F.col("id").alias("true_o"))
    p_id = rel.filter(F.col("uri") == "placed_by").select(
        F.col("id").alias("p_id")
    )
    test_ids = (
        test.join(ent_s, "su")
        .join(ent_o, "ou")
        .crossJoin(F.broadcast(p_id))
        .select("s_id", "p_id", "true_o")
    )

    cand = (
        customer.select(
            F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias(
                "cu"
            )
        )
        .join(
            ent.select(F.col("uri").alias("cu"), F.col("id").alias("o_id")),
            "cu",
        )
        .select("o_id")
    )

    # J7 expansion: broadcast the tiny test side so the cross product
    # plans as BroadcastNestedLoopJoin over cand's partitions — without
    # the hint both sides shuffle and the cartesian stage explodes to
    # (#part)² tasks (observed 200×200 = 40k under default partitions)
    scored = F.broadcast(test_ids).crossJoin(cand).select(
        "s_id",
        "p_id",
        "true_o",
        "o_id",
        (
            ((F.col("s_id") * 31 + F.col("p_id") * 17 + F.col("o_id") * 13)
             % 1000003)
            / F.lit(1000003.0)
        ).alias("score"),
    )
    w = Window.partitionBy("s_id").orderBy(F.col("score").desc(), "o_id")
    return scored.withColumn("r", F.rank().over(w))


def kg_q19_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _q19_ranked(spark, sf_dir)
        .filter(F.col("o_id") == F.col("true_o"))
        .select("s_id", "p_id", "o_id", F.col("r").cast("long").alias("r"))
        .orderBy("s_id")
    )


def kg_q19_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR / Hits@10 / mean rank ≡ W2/W3 (`kge/hole.py:411-420`)."""
    ranked = _q19_ranked(spark, sf_dir).filter(
        F.col("o_id") == F.col("true_o")
    )
    return ranked.agg(
        # reciprocal ranks are non-terminating rationals: snap each to
        # DECIMAL(18,12) (identical IEEE 1/r on both engines quantizes
        # identically), then the sum is associative — no order-dependent
        # 6th-decimal wobble
        F.round(
            F.sum((1.0 / F.col("r")).cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mrr"),
        F.round(
            F.avg(F.when(F.col("r") <= 10, 1.0).otherwise(0.0)), 6
        ).alias("hits10"),
        F.round(F.avg(F.col("r")), 6).alias("mean_rank"),
        F.count(F.lit(1)).alias("n"),
    )


def _q19_filtered_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED-protocol ranking (the setting every published FB15k
    number uses; reference scaffolding `kge/hole.py:394-399,435-436`):
    candidates that are themselves known-true triples — other than the
    test triple's own — are removed before ranking.

    Subject-side corruption is ranked (candidate orders for a given
    customer): `placed_by` is functional on the object side, so object
    filtering would be a no-op here, while a customer has many orders —
    the exclusion genuinely changes ranks.
    """
    from spark_tensors_spark.kg.eval import filter_known_candidates

    orders = load_table(spark, sf_dir, "orders")
    _raw, ent, rel, enc = _encoded(spark, sf_dir)

    test = orders.filter(F.col("o_orderkey") % 1009 == 0).select(
        F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias("su"),
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("ou"),
    )
    ent_s = ent.select(F.col("uri").alias("su"), F.col("id").alias("true_s"))
    ent_o = ent.select(F.col("uri").alias("ou"), F.col("id").alias("o_id"))
    p_id = rel.filter(F.col("uri") == "placed_by").select(
        F.col("id").alias("p_id")
    )
    test_ids = (
        test.join(ent_s, "su")
        .join(ent_o, "ou")
        .crossJoin(F.broadcast(p_id))
        .select("true_s", "p_id", "o_id")
    )

    cand = (
        orders.select(
            F.concat(F.lit("o:"), F.col("o_orderkey").cast("string")).alias(
                "cu"
            )
        )
        .join(
            ent.select(F.col("uri").alias("cu"), F.col("id").alias("s_id")),
            "cu",
        )
        .select("s_id")
    )

    scored = F.broadcast(test_ids).crossJoin(cand).select(
        "s_id",
        "p_id",
        "o_id",
        "true_s",
        (
            ((F.col("s_id") * 31 + F.col("p_id") * 17 + F.col("o_id") * 13)
             % 1000003)
            / F.lit(1000003.0)
        ).alias("score"),
    )
    filtered = filter_known_candidates(
        scored,
        enc,
        group_cols=("p_id", "o_id"),
        cand_col="s_id",
        true_col="true_s",
    )
    w = Window.partitionBy("true_s").orderBy(F.col("score").desc(), "s_id")
    return filtered.withColumn("r", F.rank().over(w))


def kg_q19_filtered_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _q19_filtered_ranked(spark, sf_dir)
        .filter(F.col("s_id") == F.col("true_s"))
        .select("s_id", "p_id", "o_id", F.col("r").cast("long").alias("r"))
        .orderBy("s_id")
    )


def kg_q19_filtered_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = _q19_filtered_ranked(spark, sf_dir).filter(
        F.col("s_id") == F.col("true_s")
    )
    return ranked.agg(
        # reciprocal ranks are non-terminating rationals: snap each to
        # DECIMAL(18,12) (identical IEEE 1/r on both engines quantizes
        # identically), then the sum is associative — no order-dependent
        # 6th-decimal wobble
        F.round(
            F.sum((1.0 / F.col("r")).cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mrr"),
        F.round(
            F.avg(F.when(F.col("r") <= 10, 1.0).otherwise(0.0)), 6
        ).alias("hits10"),
        F.round(F.avg(F.col("r")), 6).alias("mean_rank"),
        F.count(F.lit(1)).alias("n"),
    )


def kg_tensor_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COO blockification histogram ≡ F19/A10 (`rdfio.py:12-35,73-78`,
    completed).  Block grid (8, 8, 2) over (entities, entities,
    relations)."""
    _raw, ent, rel, enc = _encoded(spark, sf_dir)
    n_ent = ent.count()
    n_rel = rel.count()
    coo = to_coo(enc)
    blocked = with_block_ids(coo, (n_ent, n_ent, n_rel), (8, 8, 2))
    return (
        blocked.groupBy("block_id")
        .agg(F.count(F.lit(1)).alias("c"), F.round(F.sum("v"), 6).alias("v"))
        .orderBy("block_id")
    )


def kg_salted_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top in-degree entities on the Zipf-skewed object side, computed
    with explicit two-phase salting (operators/skew.salted_agg) — the
    aggregation-skew mitigation AQE does not provide.  The oracle is the
    plain GROUP BY: salting must be result-invisible."""
    from spark_tensors_spark.operators.skew import salted_agg

    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    deg = salted_agg(
        enc,
        ["o_id"],
        {
            "n": ("s_id", "count"),
            "min_s": ("s_id", "min"),
            "max_s": ("s_id", "max"),
        },
        n_salts=16,
    )
    return deg.orderBy(F.col("n").desc(), "o_id").limit(100)


def kg_two_hop_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop reachability (order → customer → nation): chained
    self-joins on the encoded triple table — the multi-hop traversal
    pattern (each hop is one equi-join; relation filters push to the
    persisted scan).  Returns per-nation path counts."""
    _raw, _ent, rel, enc = _encoded(spark, sf_dir)
    placed = rel.filter(F.col("uri") == "placed_by").first()["id"]
    in_nation = rel.filter(F.col("uri") == "in_nation").first()["id"]
    hop1 = enc.filter(F.col("p_id") == placed).select(
        F.col("s_id").alias("order_id"), F.col("o_id").alias("cust_id")
    )
    hop2 = enc.filter(F.col("p_id") == in_nation).select(
        F.col("s_id").alias("cust_id"), F.col("o_id").alias("nation_id")
    )
    return (
        hop1.join(hop2, "cust_id")
        .groupBy("nation_id")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.countDistinct("cust_id").alias("n_customers"),
        )
        .orderBy("nation_id")
    )


def kg_distmult_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DistMult trilinear scoring of the whole encoded KG, scan-side.

    The embeddings are the deterministic integer pseudo-embeddings of
    ``hash_embedding_col`` so the *plan* — embed three ids, zip-multiply,
    aggregate — is exactly the production scoring plan (F4's diagonal
    special case) while staying bit-exact under the DuckDB oracle.
    No Python, no shuffle: one projection over the triple scan."""
    from spark_tensors_spark.functions.columns import (
        hash_embedding_col,
        trilinear_score_col,
    )

    _raw, _e, _r, enc = _encoded(spark, sf_dir)
    es = hash_embedding_col("s_id", 8, seed=0)
    ep = hash_embedding_col("p_id", 8, seed=1)
    eo = hash_embedding_col("o_id", 8, seed=2)
    return (
        enc.select(
            "s_id", "p_id", "o_id",
            trilinear_score_col(ep, es, eo).cast("long").alias("score"),
        )
        .orderBy("s_id", "p_id", "o_id")
    )


def kg_complex_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ComplEx scoring Re⟨r, s, conj(o)⟩ of the encoded KG, scan-side
    (Trouillon 2016; equivalent to the reference's HolE by the Fourier
    map — see kernels.complex_np).  Split real/imag integer
    pseudo-embeddings keep it oracle-exact; plan shape identical to the
    float production path."""
    from spark_tensors_spark.functions.columns import (
        complex_score_col,
        hash_embedding_col,
    )

    _raw, _e, _r, enc = _encoded(spark, sf_dir)
    m = 4
    rr = hash_embedding_col("p_id", m, seed=3)
    ri = hash_embedding_col("p_id", m, seed=4)
    sr = hash_embedding_col("s_id", m, seed=5)
    si = hash_embedding_col("s_id", m, seed=6)
    or_ = hash_embedding_col("o_id", m, seed=7)
    oi = hash_embedding_col("o_id", m, seed=8)
    return (
        enc.select(
            "s_id", "p_id", "o_id",
            complex_score_col(rr, ri, sr, si, or_, oi)
            .cast("long").alias("score"),
        )
        .orderBy("s_id", "p_id", "o_id")
    )


# ---------------------------------------------------------------- the
# clustered generalization fixture (SURVEY §7.1 M3): 12 clusters × 10
# entities, relation 0 = "same cluster" — every ordered intra-cluster
# pair, deterministically split into train/test by (s·7 + o·13) % 10 = 1
# (exactly one held-out object per subject: o ≡ s+7 mod 10).
# Unlike the TPC-H KG (object side functional: one true object per
# (s,p)), each subject here has ~9 true objects, so OBJECT-side
# filtered evaluation genuinely changes ranks — the missing half of the
# Bordes protocol.  Pure codegen (range + explode, no joins), and small
# integer formulas a DuckDB oracle restates exactly.
FIX_CLUSTERS = 12
FIX_SIZE = 10
FIX_ENT = FIX_CLUSTERS * FIX_SIZE


def _fixture_triples(spark: SparkSession) -> DataFrame:
    """All ordered intra-cluster pairs (s, 0, o), s ≠ o."""
    return (
        spark.range(FIX_ENT)
        .select(F.col("id").alias("s_id"))
        .select(
            "s_id",
            F.lit(0).cast("long").alias("p_id"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.lit(FIX_SIZE - 1).cast("long"),
                )
            ).alias("k"),
        )
        .select(
            "s_id",
            "p_id",
            (F.expr(f"s_id div {FIX_SIZE}") * FIX_SIZE + F.col("k"))
            .cast("long")
            .alias("o_id"),
        )
        .filter(F.col("o_id") != F.col("s_id"))
    )


def _fixture_test(tri: DataFrame) -> DataFrame:
    return tri.filter(
        (F.col("s_id") * 7 + F.col("o_id") * 13) % 10 == 1
    )


def _object_filtered_ranked(spark: SparkSession) -> DataFrame:
    """Score every entity as candidate object for each held-out triple
    (pseudo-score: +1000 same-cluster bonus − integer hash noise),
    remove known-true competitors via the REAL filtered-protocol
    machinery (`kg/eval.filter_known_candidates`), rank with
    `kg/eval.rank_candidates` — ties by candidate id."""
    from spark_tensors_spark.kg.eval import (
        filter_known_candidates,
        rank_candidates,
    )

    tri = _fixture_triples(spark)
    test = _fixture_test(tri)
    cands = test.select(
        "s_id",
        "p_id",
        F.col("o_id").alias("true_o"),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(FIX_ENT - 1).cast("long")
            )
        ).alias("o_id"),
    )
    scored = cands.withColumn(
        "score",
        F.when(
            F.expr(f"s_id div {FIX_SIZE}") == F.expr(f"o_id div {FIX_SIZE}"),
            F.lit(1000),
        ).otherwise(F.lit(0))
        - F.pmod(F.col("s_id") * 31 + F.col("o_id") * 17, F.lit(97)),
    )
    filtered = filter_known_candidates(
        scored, tri.select("s_id", "p_id", "o_id")
    )
    # several test triples share (s_id, p_id) — each test row ranks its
    # own candidate list, so true_o joins the partition key
    return rank_candidates(
        filtered, group_cols=("s_id", "p_id", "true_o")
    )


def kg_q19_object_filtered_ranks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OBJECT-side filtered-protocol ranks on the clustered fixture —
    the half of the Bordes setting the TPC-H KG cannot exercise (its
    object side is functional).  Filtering removes each subject's ~8
    known-true cluster peers from the candidate list, so the held-out
    object's rank drops from ~cluster position to near-1 — the oracle
    recomputes every score, exclusion, and tie-broken rank exactly."""
    return (
        _object_filtered_ranked(spark)
        .filter(F.col("o_id") == F.col("true_o"))
        .select("s_id", "p_id", "o_id", F.col("r").cast("long").alias("r"))
        .orderBy("s_id", "o_id")
    )


def kg_q19_object_filtered_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """W2/W3 metrics over the object-side filtered ranks (decimal-
    snapped reciprocal ranks — the kg_q19_metrics doctrine)."""
    ranked = _object_filtered_ranked(spark).filter(
        F.col("o_id") == F.col("true_o")
    )
    return ranked.agg(
        F.round(
            F.sum((1.0 / F.col("r")).cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mrr"),
        F.round(
            F.avg(F.when(F.col("r") <= 10, 1.0).otherwise(0.0)), 6
        ).alias("hits10"),
        F.round(F.avg(F.col("r")), 6).alias("mean_rank"),
        F.count(F.lit(1)).alias("n"),
    )


def kg_q14_bucketed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → decode the whole KG through the SURVEY §7.3 100 TB
    dictionary path: two-level hash-bucketed ids
    (`dictionary.assign_ids(mode='bucketed')` — xxhash bucket · 2^40 +
    in-bucket rank; ZERO driver collects, no boundary sample, no count
    pass).  Ids differ from the dense range-mode ids by design; what
    the oracle checks is the ROUND TRIP — decode(encode(T)) ≡ T exactly
    (an id collision would fan rows out through the decode joins, a
    dropped URI would lose rows, instability between the two dictionary
    references would mis-join)."""
    from spark_tensors_spark.kg.dictionary import decode_triples

    # no persist: everything runs in ONE action, raw is a cheap 4-table
    # union projection, and a per-call persist would leak across the
    # session (this query is its only consumer, unlike _encoded's memo)
    raw = triples_raw(spark, sf_dir)
    ent, rel = build_dictionaries(raw, mode="bucketed")
    dec = decode_triples(encode_triples(raw, ent, rel), ent, rel)
    return dec.orderBy("s", "p", "o")


def kg_void_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VoID-style dataset statistics (W3C VoID property partitions —
    the `void:propertyPartition` / `void:triples` / `void:distinct-
    Subjects` / `void:distinctObjects` vocabulary): one row per
    predicate plus a '*' dataset-total row.  The profile every RDF
    store publishes about a loaded graph; the reference's loaders
    (`rdfio.py:42-50`) expose no equivalent summary.

    Scale: one groupBy over the triples with two COUNT(DISTINCT)s
    (Catalyst plans a single expand + two-phase hash agg, map-side
    partials included) plus the same agg globally — no window, no
    join."""
    raw, _ent, _rel, _enc = _encoded(spark, sf_dir)
    per = raw.groupBy(F.col("p").alias("predicate")).agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("o").alias("n_objects"),
    )
    total = raw.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("o").alias("n_objects"),
    ).select(F.lit("*").alias("predicate"), "n_triples", "n_subjects", "n_objects")
    return per.unionByName(total).orderBy("predicate")


_VOID_STATS_SQL = f"""{TRIPLES_CTE}
SELECT predicate, n_triples, n_subjects, n_objects FROM (
    SELECT p AS predicate,
           CAST(COUNT(*) AS BIGINT) AS n_triples,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_subjects,
           CAST(COUNT(DISTINCT o) AS BIGINT) AS n_objects
    FROM triples_raw
    GROUP BY p
    UNION ALL
    SELECT '*',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(DISTINCT s) AS BIGINT),
           CAST(COUNT(DISTINCT o) AS BIGINT)
    FROM triples_raw
)
ORDER BY predicate
"""


QUERIES = {
    "kg_void_stats": kg_void_stats,
    "kg_two_hop_paths": kg_two_hop_paths,
    "kg_q14_bucketed_roundtrip": kg_q14_bucketed_roundtrip,
    "kg_salted_degree": kg_salted_degree,
    "kg_distmult_scores": kg_distmult_scores,
    "kg_complex_scores": kg_complex_scores,
    "kg_q14_entity_dict": kg_q14_entity_dict,
    "kg_q14_relation_dict": kg_q14_relation_dict,
    "kg_q15_encode": kg_q15_encode,
    "kg_q16_lcwa_counts": kg_q16_lcwa_counts,
    "kg_q17_type_index": kg_q17_type_index,
    "kg_q18_neg_reject": kg_q18_neg_reject,
    "kg_q19_ranks": kg_q19_ranks,
    "kg_q19_metrics": kg_q19_metrics,
    "kg_q19_filtered_ranks": kg_q19_filtered_ranks,
    "kg_q19_filtered_metrics": kg_q19_filtered_metrics,
    "kg_q19_object_filtered_ranks": kg_q19_object_filtered_ranks,
    "kg_q19_object_filtered_metrics": kg_q19_object_filtered_metrics,
    "kg_tensor_blocks": kg_tensor_blocks,
}

_Q19_RANKED_SQL = """
test AS (
    SELECT es.id AS s_id,
           (SELECT id FROM relation_dict WHERE uri = 'placed_by') AS p_id,
           eo.id AS true_o
    FROM orders
    JOIN entity_dict es ON es.uri = 'o:' || CAST(o_orderkey AS VARCHAR)
    JOIN entity_dict eo ON eo.uri = 'c:' || CAST(o_custkey AS VARCHAR)
    WHERE o_orderkey % 1009 = 0
),
cand AS (
    SELECT e.id AS o_id
    FROM (SELECT DISTINCT 'c:' || CAST(c_custkey AS VARCHAR) AS cu
          FROM customer) c
    JOIN entity_dict e ON e.uri = c.cu
),
ranked AS (
    SELECT s_id, p_id, true_o, o_id,
           RANK() OVER (
               PARTITION BY s_id
               ORDER BY ((s_id*31 + p_id*17 + o_id*13) % 1000003)
                        / 1000003.0 DESC, o_id) AS r
    FROM test CROSS JOIN cand
)
"""

_Q19_FILTERED_RANKED_SQL = """
test AS (
    SELECT es.id AS true_s,
           (SELECT id FROM relation_dict WHERE uri = 'placed_by') AS p_id,
           eo.id AS o_id
    FROM orders
    JOIN entity_dict es ON es.uri = 'o:' || CAST(o_orderkey AS VARCHAR)
    JOIN entity_dict eo ON eo.uri = 'c:' || CAST(o_custkey AS VARCHAR)
    WHERE o_orderkey % 1009 = 0
),
cand AS (
    SELECT e.id AS s_cand
    FROM orders o
    JOIN entity_dict e ON e.uri = 'o:' || CAST(o_orderkey AS VARCHAR)
),
pairs AS (
    SELECT t.true_s, t.p_id, t.o_id, c.s_cand
    FROM test t CROSS JOIN cand c
    WHERE NOT EXISTS (
        SELECT 1 FROM triples_encoded k
        WHERE k.s_id = c.s_cand AND k.p_id = t.p_id AND k.o_id = t.o_id
          AND c.s_cand <> t.true_s
    )
),
ranked AS (
    SELECT true_s, p_id, o_id, s_cand,
           RANK() OVER (
               PARTITION BY true_s
               ORDER BY ((s_cand*31 + p_id*17 + o_id*13) % 1000003)
                        / 1000003.0 DESC, s_cand) AS r
    FROM pairs
)
"""

_OBJECT_FILTERED_RANKED_SQL = f"""
WITH ent AS (SELECT CAST(UNNEST(range({FIX_ENT})) AS BIGINT) AS e),
tri AS (
    SELECT s.e AS s_id, CAST(0 AS BIGINT) AS p_id,
           (s.e // {FIX_SIZE}) * {FIX_SIZE} + k.k AS o_id
    FROM ent s, UNNEST(range({FIX_SIZE})) AS k(k)
    WHERE (s.e // {FIX_SIZE}) * {FIX_SIZE} + k.k <> s.e
),
test AS (SELECT * FROM tri WHERE (s_id * 7 + o_id * 13) % 10 = 1),
scored AS (
    SELECT t.s_id, t.p_id, t.o_id AS true_o, c.e AS cand,
           CASE WHEN t.s_id // {FIX_SIZE} = c.e // {FIX_SIZE}
                THEN 1000 ELSE 0 END
           - (t.s_id * 31 + c.e * 17) % 97 AS score
    FROM test t, ent c
),
filtered AS (
    SELECT sc.* FROM scored sc
    WHERE sc.cand = sc.true_o OR NOT EXISTS (
        SELECT 1 FROM tri kn
        WHERE kn.s_id = sc.s_id AND kn.p_id = sc.p_id
          AND kn.o_id = sc.cand)
),
ranked AS (
    SELECT s_id, p_id, true_o, cand,
           RANK() OVER (PARTITION BY s_id, p_id, true_o
                        ORDER BY score DESC, cand) AS r
    FROM filtered
)
"""

ORACLES = {
    "kg_void_stats": _VOID_STATS_SQL,
    # the bucketed-id round trip must reproduce the raw triples exactly
    # (ids themselves are engine-internal and never surface)
    "kg_q14_bucketed_roundtrip": TRIPLES_CTE
    + """SELECT s, p, o FROM triples_raw ORDER BY s, p, o""",
    "kg_q19_object_filtered_ranks": _OBJECT_FILTERED_RANKED_SQL
    + """SELECT s_id, p_id, true_o AS o_id, CAST(r AS BIGINT) AS r
         FROM ranked WHERE cand = true_o ORDER BY s_id, o_id""",
    "kg_q19_object_filtered_metrics": _OBJECT_FILTERED_RANKED_SQL
    + """SELECT ROUND(CAST(SUM(CAST(CAST(1 AS DOUBLE) / r
                                   AS DECIMAL(18,12)))
                     AS DOUBLE) / COUNT(*), 6) AS mrr,
                ROUND(AVG(CASE WHEN r <= 10 THEN 1.0 ELSE 0 END), 6)
                    AS hits10,
                ROUND(AVG(r), 6) AS mean_rank,
                COUNT(*) AS n
         FROM ranked WHERE cand = true_o""",
    "kg_two_hop_paths": TRIPLES_CTE
    + """SELECT h2.o_id AS nation_id,
                COUNT(*) AS n_paths,
                COUNT(DISTINCT h1.o_id) AS n_customers
         FROM triples_encoded h1
         JOIN triples_encoded h2 ON h1.o_id = h2.s_id
         JOIN relation_dict r1 ON h1.p_id = r1.id AND r1.uri = 'placed_by'
         JOIN relation_dict r2 ON h2.p_id = r2.id AND r2.uri = 'in_nation'
         GROUP BY h2.o_id ORDER BY nation_id""",
    "kg_salted_degree": TRIPLES_CTE
    + """SELECT o_id, COUNT(*) AS n,
                MIN(s_id) AS min_s, MAX(s_id) AS max_s
         FROM triples_encoded GROUP BY o_id
         ORDER BY n DESC, o_id LIMIT 100""",
    "kg_q14_entity_dict": TRIPLES_CTE
    + "SELECT uri, id FROM entity_dict ORDER BY uri",
    "kg_q14_relation_dict": TRIPLES_CTE
    + "SELECT uri, id FROM relation_dict ORDER BY uri",
    "kg_q15_encode": TRIPLES_CTE
    + "SELECT s_id, p_id, o_id FROM triples_encoded ORDER BY s_id, p_id, o_id",
    "kg_q16_lcwa_counts": TRIPLES_CTE
    + """SELECT s_id, p_id, COUNT(*) AS c
         FROM triples_encoded GROUP BY s_id, p_id ORDER BY s_id, p_id""",
    "kg_q17_type_index": TRIPLES_CTE
    + """SELECT p_id, COUNT(DISTINCT s_id) AS ns, COUNT(DISTINCT o_id) AS no
         FROM triples_encoded GROUP BY p_id ORDER BY p_id""",
    "kg_q18_neg_reject": TRIPLES_CTE
    + """, cands AS (
            SELECT s_id, p_id,
                   (o_id + k * 7919) % (SELECT COUNT(*) FROM entity_dict)
                       AS o_id
            FROM triples_encoded
            CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS k) ks
        )
        SELECT COUNT(*) AS c
        FROM cands c
        WHERE NOT EXISTS (
            SELECT 1 FROM triples_encoded t
            WHERE t.s_id = c.s_id AND t.p_id = c.p_id AND t.o_id = c.o_id
        )""",
    "kg_q19_ranks": TRIPLES_CTE + "," + _Q19_RANKED_SQL
    + """SELECT s_id, p_id, o_id, r
         FROM ranked WHERE o_id = true_o ORDER BY s_id""",
    "kg_q19_metrics": TRIPLES_CTE + "," + _Q19_RANKED_SQL
    + """SELECT ROUND(CAST(SUM(CAST(CAST(1 AS DOUBLE) / r AS DECIMAL(18,12)))
                     AS DOUBLE) / COUNT(*), 6) AS mrr,
                ROUND(AVG(CASE WHEN r <= 10 THEN 1.0 ELSE 0 END), 6)
                    AS hits10,
                ROUND(AVG(r), 6) AS mean_rank,
                COUNT(*) AS n
         FROM ranked WHERE o_id = true_o""",
    "kg_q19_filtered_ranks": TRIPLES_CTE + "," + _Q19_FILTERED_RANKED_SQL
    + """SELECT true_s AS s_id, p_id, o_id, r
         FROM ranked WHERE s_cand = true_s ORDER BY s_id""",
    "kg_q19_filtered_metrics": TRIPLES_CTE + "," + _Q19_FILTERED_RANKED_SQL
    + """SELECT ROUND(CAST(SUM(CAST(CAST(1 AS DOUBLE) / r AS DECIMAL(18,12)))
                     AS DOUBLE) / COUNT(*), 6) AS mrr,
                ROUND(AVG(CASE WHEN r <= 10 THEN 1.0 ELSE 0 END), 6)
                    AS hits10,
                ROUND(AVG(r), 6) AS mean_rank,
                COUNT(*) AS n
         FROM ranked WHERE s_cand = true_s""",
    # pseudo-embedding component (id·31 + j·17 + seed) % 97 − 48 is pure
    # BIGINT arithmetic → DuckDB recomputes the trilinear sums exactly
    "kg_distmult_scores": TRIPLES_CTE
    + """, js AS (SELECT UNNEST(range(0, 8)) AS j)
        SELECT s_id, p_id, o_id,
               CAST(SUM(((p_id*31 + j*17 + 1) % 97 - 48)
                      * ((s_id*31 + j*17 + 0) % 97 - 48)
                      * ((o_id*31 + j*17 + 2) % 97 - 48)) AS BIGINT)
                   AS score
        FROM triples_encoded CROSS JOIN js
        GROUP BY s_id, p_id, o_id
        ORDER BY s_id, p_id, o_id""",
    "kg_complex_scores": TRIPLES_CTE
    + """, js AS (SELECT UNNEST(range(0, 4)) AS j),
        comp AS (
            SELECT s_id, p_id, o_id,
                   (p_id*31 + j*17 + 3) % 97 - 48 AS rr,
                   (p_id*31 + j*17 + 4) % 97 - 48 AS ri,
                   (s_id*31 + j*17 + 5) % 97 - 48 AS sr,
                   (s_id*31 + j*17 + 6) % 97 - 48 AS si,
                   (o_id*31 + j*17 + 7) % 97 - 48 AS orr,
                   (o_id*31 + j*17 + 8) % 97 - 48 AS oi
            FROM triples_encoded CROSS JOIN js
        )
        SELECT s_id, p_id, o_id,
               CAST(SUM(rr*sr*orr + rr*si*oi + ri*sr*oi - ri*si*orr)
                    AS BIGINT) AS score
        FROM comp GROUP BY s_id, p_id, o_id
        ORDER BY s_id, p_id, o_id""",
    "kg_tensor_blocks": TRIPLES_CTE
    + """, consts AS (
            SELECT CAST(CEIL((SELECT COUNT(*) FROM entity_dict) / 8.0)
                        AS BIGINT) AS bs1,
                   CAST(CEIL((SELECT COUNT(*) FROM entity_dict) / 8.0)
                        AS BIGINT) AS bs2,
                   CAST(CEIL((SELECT COUNT(*) FROM relation_dict) / 2.0)
                        AS BIGINT) AS bs3
        )
        SELECT CAST(FLOOR(s_id / bs1) + FLOOR(o_id / bs2) * 8
                   + FLOOR(p_id / bs3) * 64 AS BIGINT) AS block_id,
               COUNT(*) AS c, ROUND(SUM(CAST(1.0 AS DOUBLE)), 6) AS v
        FROM triples_encoded CROSS JOIN consts
        GROUP BY 1 ORDER BY block_id""",
}
