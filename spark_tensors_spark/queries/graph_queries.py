"""Graph-analytics queries: PageRank over the KG adjacency and triangle
counting over the order co-purchase graph (operators/graph.py).

Both are oracled: PageRank's fixed-iteration power method unrolls into
chained CTEs; triangle counting's degree-oriented plan is result-equal
to the canonical u<v<w three-way self-join the oracle states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.operators.graph import (
    hits_scores,
    pagerank,
    triangle_counts,
)
from spark_tensors_spark.queries.kg import TRIPLES_CTE, _encoded

PR_ITERATIONS = 5
PR_DAMPING = 0.85


def kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the encoded KG edge list (s_id → o_id).  Ranks are
    scaled by N (mean 1.0) and rounded to 8 dp.  Why FINE rounding is
    the stable choice: with damping 17/20 and integer outdegrees the
    exact ranks are rationals whose decimal expansions terminate after
    a few digits, so values like 69.7395 land EXACTLY on the half-
    boundary of any coarser rounding (3–4 dp) and ±1 ulp of engine
    noise flips the direction (round-2 mismatch: 78.01425; round-3
    repro: 69.73950000000002 vs ...007).  At 8 dp every such value is a
    grid POINT, 5e-9 from the nearest boundary — 5 orders of magnitude
    above the ~1e-13 cross-engine double-sum wobble — so both engines
    snap to the identical double."""
    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    edges = enc.select("s_id", "o_id")
    ranks = pagerank(
        edges, "s_id", "o_id", iterations=PR_ITERATIONS, damping=PR_DAMPING
    )
    n = ranks.count()
    return (
        ranks.select(
            F.col("node").alias("node_id"),
            F.round(F.col("rank") * n, 8).alias("rank_scaled"),
        )
        .orderBy("node_id")
    )


def _pagerank_oracle() -> str:
    # float constants are CAST(… AS DOUBLE): bare literals are DECIMAL
    # in DuckDB, whose exact-decimal division differs from the IEEE
    # double ops the Spark side performs.  The repr of (1-d) reproduces
    # Python's 0.15000000000000002 so both engines share every bit.
    n_expr = "(SELECT COUNT(*) FROM nodes)"
    d = f"CAST({PR_DAMPING!r} AS DOUBLE)"
    base = f"CAST({(1.0 - PR_DAMPING)!r} AS DOUBLE) / {n_expr}"
    its = []
    prev = "r0"
    for i in range(1, PR_ITERATIONS + 1):
        its.append(
            f"""r{i} AS (
    SELECT n.node,
           {base}
           + {d} * COALESCE(SUM(p.rank / od.outdeg), 0) AS rank
    FROM nodes n
    LEFT JOIN edges e ON e.o_id = n.node
    LEFT JOIN {prev} p ON p.node = e.s_id
    LEFT JOIN outdeg od ON od.node = e.s_id
    GROUP BY n.node
)"""
        )
        prev = f"r{i}"
    iters_sql = ",\n".join(its)
    return f"""{TRIPLES_CTE},
edges AS (SELECT DISTINCT s_id, o_id FROM triples_encoded),
nodes AS (
    SELECT s_id AS node FROM edges
    UNION SELECT o_id FROM edges
),
outdeg AS (
    SELECT s_id AS node, COUNT(*) AS outdeg FROM edges GROUP BY s_id
),
r0 AS (
    SELECT node, CAST(1.0 AS DOUBLE) / {n_expr} AS rank FROM nodes
),
{iters_sql}
SELECT node AS node_id,
       ROUND(rank * {n_expr}, 8) AS rank_scaled
FROM {prev}
ORDER BY node_id
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1995-H1 co-purchase part graph (u < v) — shared by the triangle
    and community queries."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
        )
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    other = op.select(F.col("ok"), F.col("pk").alias("pk2"))
    return (
        op.join(other, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .select(F.col("pk").alias("u"), F.col("pk2").alias("v"))
        .distinct()
    )


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 parts by triangle participation in the 1995-H1
    co-purchase graph (parts linked when they appear in the same order)
    — the degree-oriented O(m^{3/2}) plan; ties broken by part id.

    The order-date window is a *predicate-pushdown* scope, not a scale
    crutch: it keeps every intra-order clique (where the triangle mass
    lives) while bounding the cross-order edge merge, exactly how a
    production co-occurrence job scopes by time.  The operator itself
    is windowless."""
    edges = _copurchase_edges(spark, sf_dir)
    return (
        triangle_counts(edges)
        .select(F.col("node").alias("part_id"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "part_id")
        .limit(100)
    )


COPURCHASE_TRIANGLES_SQL = """
WITH op AS (
    SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1995-07-01'
),
e AS (
    SELECT DISTINCT a.pk AS u, b.pk AS v
    FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
),
tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM e e1
    JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
    JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
    SELECT a AS part_id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
SELECT part_id, COUNT(*) AS n_triangles
FROM corners
GROUP BY part_id
ORDER BY n_triangles DESC, part_id
LIMIT 100
"""


LPA_ITERATIONS = 3


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the co-purchase graph: 3 synchronous
    label-propagation rounds (`operators/graph.label_propagation` —
    deterministic argmax-count with min-label ties), summarized per
    community.  The oracle unrolls the same 3 rounds as chained CTEs,
    integer counts throughout."""
    from spark_tensors_spark.operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf_dir)
    labels = label_propagation(edges, iterations=LPA_ITERATIONS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy(F.desc("n_nodes"), "community")
        .limit(50)
    )


def _communities_oracle() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, LPA_ITERATIONS + 1):
        rounds.append(
            f"""l{i} AS (
    SELECT node, label FROM (
        SELECT s.v AS node, l.label AS label,
               ROW_NUMBER() OVER (
                   PARTITION BY s.v
                   ORDER BY COUNT(*) DESC, l.label ASC) AS rk
        FROM sym s JOIN {prev} l ON l.node = s.u
        GROUP BY s.v, l.label
    ) WHERE rk = 1
)"""
        )
        prev = f"l{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH op AS (
    SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1995-07-01'
),
e AS (
    SELECT DISTINCT a.pk AS u, b.pk AS v
    FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
),
sym AS (
    SELECT u, v FROM e UNION ALL SELECT v, u FROM e
),
l0 AS (
    SELECT node, node AS label
    FROM (SELECT DISTINCT u AS node FROM sym)
),
{rounds_sql}
SELECT label AS community, COUNT(*) AS n_nodes,
       MIN(node) AS min_node, MAX(node) AS max_node
FROM {prev}
GROUP BY label
ORDER BY n_nodes DESC, community
LIMIT 50
"""


def copurchase_link_prediction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-30 predicted links in the co-purchase graph by
    common-neighbor count (`operators/graph.common_neighbor_scores`) —
    the classic link-prediction baseline, integer-exact under the
    wedge-join oracle.  Ties broken by (u, v)."""
    from spark_tensors_spark.operators.graph import common_neighbor_scores

    edges = _copurchase_edges(spark, sf_dir)
    return (
        common_neighbor_scores(edges, min_common=2)
        .orderBy(F.desc("n_common"), "u", "v")
        .limit(30)
    )


LINK_PREDICTION_SQL = """
WITH op AS (
    SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1995-07-01'
),
e AS (
    SELECT DISTINCT a.pk AS u, b.pk AS v
    FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
),
sym AS (
    SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e
),
pairs AS (
    SELECT a.x AS u, b.x AS v, COUNT(*) AS n_common
    FROM sym a JOIN sym b ON a.w = b.w AND a.x < b.x
    GROUP BY a.x, b.x
)
SELECT p.u, p.v, p.n_common
FROM pairs p
LEFT JOIN e ON e.u = p.u AND e.v = p.v
WHERE e.u IS NULL AND p.n_common >= 2
ORDER BY p.n_common DESC, p.u, p.v
LIMIT 30
"""


def copurchase_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 predicted links by Adamic-Adar score
    (`operators/graph.adamic_adar_scores`): rare shared neighbors count
    more.  Per-term DECIMAL(18,12) quantization makes the sum exact on
    both engines; ties by (n_common, u, v)."""
    from spark_tensors_spark.operators.graph import adamic_adar_scores

    edges = _copurchase_edges(spark, sf_dir)
    return (
        adamic_adar_scores(edges, min_common=2)
        .orderBy(F.desc("aa"), F.desc("n_common"), "u", "v")
        .limit(30)
    )


ADAMIC_ADAR_SQL = """
WITH op AS (
    SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1995-07-01'
),
e AS (
    SELECT DISTINCT a.pk AS u, b.pk AS v
    FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
),
sym AS (
    SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e
),
deg AS (
    SELECT w, COUNT(*) AS d FROM sym GROUP BY w
),
weighted AS (
    SELECT s.w, s.x,
           CAST(1.0 / LN(CAST(deg.d AS DOUBLE)) AS DECIMAL(18,12)) AS aa_t
    FROM sym s JOIN deg ON deg.w = s.w
),
pairs AS (
    SELECT a.x AS u, b.x AS v,
           COUNT(*) AS n_common,
           ROUND(CAST(SUM(a.aa_t) AS DOUBLE), 6) AS aa
    FROM weighted a JOIN weighted b ON a.w = b.w AND a.x < b.x
    GROUP BY a.x, b.x
)
SELECT p.u, p.v, p.n_common, p.aa
FROM pairs p
LEFT JOIN e ON e.u = p.u AND e.v = p.v
WHERE e.u IS NULL AND p.n_common >= 2
ORDER BY p.aa DESC, p.n_common DESC, p.u, p.v
LIMIT 30
"""


KCORE_K = 3
KCORE_ROUNDS = 4


def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph after 4 fixed peeling rounds
    (`operators/graph.kcore_peel`): surviving nodes with their core
    degree — the density filter run before graph embedding at scale.
    Integer-exact; the oracle unrolls the same peels."""
    from spark_tensors_spark.operators.graph import kcore_peel

    edges = _copurchase_edges(spark, sf_dir)
    return (
        kcore_peel(edges, k=KCORE_K, rounds=KCORE_ROUNDS)
        .orderBy(F.desc("degree"), "node")
        .limit(100)
    )


def _kcore_oracle() -> str:
    # every e{i}/k{i} is referenced twice by the next round — without
    # MATERIALIZED DuckDB inlines the CTE chain and recomputes it
    # exponentially (the unmaterialized form took ~110 s at sf0.01 vs
    # ~2 s materialized; identical values either way)
    rounds = []
    prev = "e0"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"""k{i} AS MATERIALIZED (
    SELECT u AS node FROM (
        SELECT u, COUNT(*) AS d
        FROM (SELECT u, v FROM {prev} UNION ALL SELECT v, u FROM {prev})
        GROUP BY u
    ) WHERE d >= {KCORE_K}
),
e{i} AS MATERIALIZED (
    SELECT e.u, e.v FROM {prev} e
    JOIN k{i} a ON a.node = e.u
    JOIN k{i} b ON b.node = e.v
)"""
        )
        prev = f"e{i}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH op AS MATERIALIZED (
    SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1995-07-01'
),
e0 AS MATERIALIZED (
    SELECT DISTINCT a.pk AS u, b.pk AS v
    FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
),
{rounds_sql}
SELECT u AS node, COUNT(*) AS degree
FROM (SELECT u, v FROM {prev} UNION ALL SELECT v, u FROM {prev})
GROUP BY u
ORDER BY degree DESC, node
LIMIT 100
"""


PPR_SEEDS = 8  # power of 2: 1/|S| stays dyadic → the terminating-
#                decimal rounding argument of kg_pagerank carries over


def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the encoded KG edge list, teleporting
    to the 8 smallest source entities (`operators/graph.py:368`).  Same
    unrolled-power-iteration oracle as kg_pagerank — the teleport
    vector is just one more CTE — and the same 8-dp fine-rounding
    doctrine (see kg_pagerank's docstring); |S| = 8 keeps the base term
    (1−d)/|S| a terminating decimal."""
    from spark_tensors_spark.operators.graph import personalized_pagerank

    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    edges = enc.select("s_id", "o_id")
    seeds = (
        edges.select(F.col("s_id").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(PPR_SEEDS)
    )
    ranks = personalized_pagerank(
        edges, seeds, "s_id", "o_id", seed_col="node",
        iterations=PR_ITERATIONS, damping=PR_DAMPING,
    )
    n = ranks.count()
    return (
        ranks.select(
            F.col("node").alias("node_id"),
            F.round(F.col("rank") * n, 8).alias("rank_scaled"),
        )
        .orderBy("node_id")
    )


def _ppr_oracle() -> str:
    n_expr = "(SELECT COUNT(*) FROM nodes)"
    d = f"CAST({PR_DAMPING!r} AS DOUBLE)"
    # the Spark operator computes (1-d)/n_seeds DRIVER-side in Python;
    # repr() reproduces that exact double (division by 8 is exact)
    base = f"CAST({(1.0 - PR_DAMPING) / PPR_SEEDS!r} AS DOUBLE)"
    tele = f"CASE WHEN n.is_seed = 1 THEN {base} ELSE CAST(0.0 AS DOUBLE) END"
    its = []
    prev = "r0"
    for i in range(1, PR_ITERATIONS + 1):
        its.append(
            f"""r{i} AS (
    SELECT n.node, n.is_seed,
           {tele}
           + {d} * COALESCE(SUM(p.rank / od.outdeg), 0) AS rank
    FROM nodes n
    LEFT JOIN edges e ON e.o_id = n.node
    LEFT JOIN {prev} p ON p.node = e.s_id
    LEFT JOIN outdeg od ON od.node = e.s_id
    GROUP BY n.node, n.is_seed
)"""
        )
        prev = f"r{i}"
    iters_sql = ",\n".join(its)
    return f"""{TRIPLES_CTE},
edges AS MATERIALIZED (SELECT DISTINCT s_id, o_id FROM triples_encoded),
seeds AS (
    SELECT DISTINCT s_id AS node FROM edges ORDER BY node LIMIT {PPR_SEEDS}
),
nodes AS (
    SELECT n.node,
           CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
    FROM (SELECT s_id AS node FROM edges
          UNION SELECT o_id FROM edges) n
    LEFT JOIN seeds s ON s.node = n.node
),
outdeg AS (
    SELECT s_id AS node, COUNT(*) AS outdeg FROM edges GROUP BY s_id
),
r0 AS (
    SELECT node, is_seed,
           CASE WHEN is_seed = 1 THEN {base}
                ELSE CAST(0.0 AS DOUBLE) END AS rank
    FROM nodes
),
{iters_sql}
SELECT node AS node_id,
       ROUND(rank * {n_expr}, 8) AS rank_scaled
FROM {prev}
ORDER BY node_id
"""


def q21_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over 1995-H1 orders: for part
    pairs co-purchased in ≥ 2 orders, support count and LIFT
    = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b).  Two hash aggregates
    (item counts, pair counts over the order-local self-join) + one
    1-row basket count broadcast; lift is ONE division of exact
    integers (CAST(n_ab·N AS DOUBLE) / (n_a·n_b)) — bit-identical
    cross-engine unrounded.  Top-100 by (lift desc, a, b)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
        )
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
        # four consumers (the eager basket count, the item counts, both
        # sides of the pair self-join); without a barrier each re-runs
        # the lineitem⋈orders join + distinct
        .localCheckpoint()
    )
    n_orders = op.select("ok").distinct().count()
    item = op.groupBy(F.col("pk")).agg(F.count(F.lit(1)).alias("n_item"))
    other = op.select("ok", F.col("pk").alias("pk2"))
    pair = (
        op.join(other, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .groupBy("pk", "pk2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    ia = item.select(F.col("pk"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("pk").alias("pk2"), F.col("n_item").alias("n_b"))
    return (
        pair.join(ia, "pk")
        .join(ib, "pk2")
        .select(
            F.col("pk").alias("part_a"),
            F.col("pk2").alias("part_b"),
            "n_pair", "n_a", "n_b",
            (
                (F.col("n_pair") * F.lit(n_orders)).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(100)
    )


Q21_BASKET_LIFT_SQL = """
WITH op AS (
    SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1995-07-01'
),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
item AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_item FROM op GROUP BY pk),
pair AS (
    SELECT a.pk AS part_a, b.pk AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_pair
    FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2
)
SELECT p.part_a, p.part_b, p.n_pair,
       ia.n_item AS n_a, ib.n_item AS n_b,
       CAST(p.n_pair * (SELECT n_orders FROM n) AS DOUBLE)
       / (ia.n_item * ib.n_item) AS lift
FROM pair p
JOIN item ia ON ia.pk = p.part_a
JOIN item ib ON ib.pk = p.part_b
ORDER BY lift DESC, part_a, part_b
LIMIT 100
"""


BFS_DEPTH = 6


def graph_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS depth over the encoded KG (seed set = the 8
    smallest source entities, same as graph_ppr): min hop distance
    within 6 rounds, −1 if unreached (`operators/graph.bfs_depths`).
    Pure integer relax rounds — the oracle unrolls them verbatim."""
    from spark_tensors_spark.operators.graph import bfs_depths

    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    edges = enc.select("s_id", "o_id")
    seeds = (
        edges.select(F.col("s_id").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(PPR_SEEDS)
    )
    return (
        bfs_depths(edges, seeds, "s_id", "o_id", max_depth=BFS_DEPTH)
        .select(F.col("node").alias("node_id"), "depth")
        .orderBy("node_id")
    )


def _bfs_oracle() -> str:
    inf = 999_999_999
    its = []
    prev = "d0"
    for k in range(1, BFS_DEPTH + 1):
        its.append(
            f"""d{k} AS MATERIALIZED (
    SELECT n.node,
           least(n.depth, COALESCE(MIN(p.depth + 1), {inf})) AS depth
    FROM {prev} n
    LEFT JOIN edges e ON e.o_id = n.node
    LEFT JOIN {prev} p ON p.node = e.s_id
    GROUP BY n.node, n.depth
)"""
        )
        prev = f"d{k}"
    iters_sql = ",\n".join(its)
    return f"""{TRIPLES_CTE},
edges AS (SELECT DISTINCT s_id, o_id FROM triples_encoded),
seeds AS (
    SELECT DISTINCT s_id AS node FROM edges ORDER BY node LIMIT {PPR_SEEDS}
),
d0 AS (
    SELECT n.node,
           CASE WHEN s.node IS NULL THEN {inf} ELSE 0 END AS depth
    FROM (SELECT s_id AS node FROM edges
          UNION SELECT o_id FROM edges) n
    LEFT JOIN seeds s ON s.node = n.node
),
{iters_sql}
SELECT node AS node_id,
       CAST(CASE WHEN depth >= {inf} THEN -1 ELSE depth END AS BIGINT)
           AS depth
FROM {prev}
ORDER BY node_id
"""


SSSP_ROUNDS = 6


def graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-source shortest path over the encoded KG
    (seed set = the 8 smallest source entities, same as graph_bfs) with
    a synthetic deterministic integer weight w(s,o) = (7s + 3o) mod 9
    + 1 — cheapest cost within 6 relax rounds, −1 if unreached
    (`operators/graph.sssp_distances`).  Pure integer Bellman-Ford
    rounds; the oracle unrolls them verbatim (graph_bfs_depth doctrine
    with +w in place of +1)."""
    from spark_tensors_spark.operators.graph import sssp_distances

    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    edges = (
        enc.select("s_id", "o_id")
        .distinct()
        .select(
            "s_id",
            "o_id",
            ((F.col("s_id") * 7 + F.col("o_id") * 3) % 9 + 1).alias("w"),
        )
    )
    seeds = (
        edges.select(F.col("s_id").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(PPR_SEEDS)
    )
    return (
        sssp_distances(
            edges, seeds, "s_id", "o_id", "w", max_rounds=SSSP_ROUNDS
        )
        .select(F.col("node").alias("node_id"), "dist")
        .orderBy("node_id")
    )


def _sssp_oracle() -> str:
    inf = 999_999_999_999
    its = []
    prev = "d0"
    for k in range(1, SSSP_ROUNDS + 1):
        its.append(
            f"""d{k} AS MATERIALIZED (
    SELECT n.node,
           least(n.dist, COALESCE(MIN(p.dist + e.w), {inf})) AS dist
    FROM {prev} n
    LEFT JOIN edges e ON e.o_id = n.node
    LEFT JOIN {prev} p ON p.node = e.s_id
    GROUP BY n.node, n.dist
)"""
        )
        prev = f"d{k}"
    iters_sql = ",\n".join(its)
    return f"""{TRIPLES_CTE},
edges AS MATERIALIZED (
    SELECT s_id, o_id, (s_id * 7 + o_id * 3) % 9 + 1 AS w
    FROM (SELECT DISTINCT s_id, o_id FROM triples_encoded)
),
seeds AS (
    SELECT DISTINCT s_id AS node FROM edges ORDER BY node LIMIT {PPR_SEEDS}
),
d0 AS (
    SELECT n.node,
           CASE WHEN s.node IS NULL THEN {inf} ELSE 0 END AS dist
    FROM (SELECT s_id AS node FROM edges
          UNION SELECT o_id FROM edges) n
    LEFT JOIN seeds s ON s.node = n.node
),
{iters_sql}
SELECT node AS node_id,
       CAST(CASE WHEN dist >= {inf} THEN -1 ELSE dist END AS BIGINT)
           AS dist
FROM {prev}
ORDER BY node_id
"""


HITS_ITERATIONS = 2


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the encoded KG edge list
    (`operators/graph.hits_scores`): unnormalized integer power
    iteration — exact BIGINT scores, oracle-unrollable — reporting the
    top 25 authorities (ties by node id).  Top-k plans as
    TakeOrderedAndProject: per-partition heaps, no global sort."""
    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    scores = hits_scores(
        enc.select("s_id", "o_id"), "s_id", "o_id",
        iterations=HITS_ITERATIONS,
    )
    return (
        scores.select(
            F.col("node").alias("node_id"), "authority", "hub"
        )
        .orderBy(F.col("authority").desc(), "node_id")
        .limit(25)
    )


def _hits_oracle() -> str:
    half_steps = []
    prev_h = "h0"
    prev_a = None
    for i in range(1, HITS_ITERATIONS + 1):
        half_steps.append(
            f"""a{i} AS (
    SELECT n.node,
           CAST(COALESCE(SUM(h.hub), 0) AS BIGINT) AS authority
    FROM nodes n
    LEFT JOIN edges e ON e.o_id = n.node
    LEFT JOIN {prev_h} h ON h.node = e.s_id
    GROUP BY n.node
)"""
        )
        half_steps.append(
            f"""h{i} AS (
    SELECT n.node,
           CAST(COALESCE(SUM(a.authority), 0) AS BIGINT) AS hub
    FROM nodes n
    LEFT JOIN edges e ON e.s_id = n.node
    LEFT JOIN a{i} a ON a.node = e.o_id
    GROUP BY n.node
)"""
        )
        prev_h, prev_a = f"h{i}", f"a{i}"
    steps_sql = ",\n".join(half_steps)
    return f"""{TRIPLES_CTE},
edges AS (SELECT DISTINCT s_id, o_id FROM triples_encoded),
nodes AS (
    SELECT s_id AS node FROM edges
    UNION SELECT o_id FROM edges
),
h0 AS (SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes),
{steps_sql}
SELECT a.node AS node_id, a.authority, h.hub
FROM {prev_a} a JOIN {prev_h} h ON h.node = a.node
ORDER BY a.authority DESC, node_id
LIMIT 25
"""


WCC_ROUNDS = 7


def graph_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-connected components over the encoded KG edge list —
    the first graph question after PageRank ("how many islands?").
    FORCES the distributed large-star/small-star alternation
    (`pipeline/components.two_star_components`, Kiveris et al. SoCC
    2014 — O(log log n) rounds, the 100 TB path for pathological
    diameters), so that implementation itself sits under the value
    oracle; the min-label + pointer-jumping alternative stays gated
    via doc_lsh_components_dist (the r4 dual-path doctrine).

    The oracle unrolls {WCC_ROUNDS} plain label-propagation rounds
    (label_{{k+1}}(v) = min(label_k(v), min over neighbours
    label_k(u))), which provably converges on THIS graph: every node
    is ≤3 undirected hops from its region hub (order→customer→nation→
    region), so any two nodes of a component are ≤6 hops apart and
    round k holds the min label within k hops — 7 ≥ 6 rounds reach
    the component minimum everywhere, at every scale factor."""
    from spark_tensors_spark.pipeline import components

    _raw, _ent, _rel, enc = _encoded(spark, sf_dir)
    edges = enc.select("s_id", "o_id").distinct()
    cc = components.connected_components(
        edges, "s_id", "o_id", driver_threshold=0, method="twostar"
    )
    return (
        cc.select(
            F.col("node").alias("node_id"),
            F.col("comp").alias("component_id"),
        )
        .orderBy("node_id")
    )


def _wcc_oracle() -> str:
    its = []
    prev = "l0"
    for k in range(1, WCC_ROUNDS + 1):
        its.append(
            f"""l{k} AS MATERIALIZED (
    SELECT n.node,
           least(n.lbl, COALESCE(MIN(p.lbl), n.lbl)) AS lbl
    FROM {prev} n
    LEFT JOIN sym e ON e.u = n.node
    LEFT JOIN {prev} p ON p.node = e.v
    GROUP BY n.node, n.lbl
)"""
        )
        prev = f"l{k}"
    iters_sql = ",\n".join(its)
    return f"""{TRIPLES_CTE},
pairs AS (
    SELECT DISTINCT s_id AS u, o_id AS v
    FROM triples_encoded WHERE s_id <> o_id
),
sym AS MATERIALIZED (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM sym),
{iters_sql}
SELECT node AS node_id, lbl AS component_id
FROM {prev}
ORDER BY node_id
"""


QUERIES = {
    "graph_wcc": graph_wcc,
    "graph_hits": graph_hits,
    "kg_pagerank": kg_pagerank,
    "graph_sssp": graph_sssp,
    "graph_ppr": graph_ppr,
    "graph_bfs_depth": graph_bfs_depth,
    "q21_basket_lift": q21_basket_lift,
    "graph_triangles": copurchase_triangles,
    "graph_communities": copurchase_communities,
    "graph_link_prediction": copurchase_link_prediction,
    "graph_kcore": copurchase_kcore,
    "graph_adamic_adar": copurchase_adamic_adar,
}

ORACLES = {
    "graph_wcc": _wcc_oracle(),
    "graph_hits": _hits_oracle(),
    "kg_pagerank": _pagerank_oracle(),
    "graph_sssp": _sssp_oracle(),
    "graph_ppr": _ppr_oracle(),
    "graph_bfs_depth": _bfs_oracle(),
    "q21_basket_lift": Q21_BASKET_LIFT_SQL,
    "graph_triangles": COPURCHASE_TRIANGLES_SQL,
    "graph_communities": _communities_oracle(),
    "graph_link_prediction": LINK_PREDICTION_SQL,
    "graph_kcore": _kcore_oracle(),
    "graph_adamic_adar": ADAMIC_ADAR_SQL,
}
