"""Relational core queries Q1–Q13 (SURVEY §2.11, group B tables).

These exercise every relational operator class in SURVEY §2: scans with
predicate pushdown, projections/filters (P-class), all join flavors
(J-class: shuffle equi, broadcast, anti, semi), aggregations (A-class),
window/ranking (W-class), set ops / sort / limit (O-class).

Scale intent: every query keeps filters and projections at the scan
(Catalyst pushes them into the parquet reader), broadcasts genuinely
small sides explicitly, and otherwise leaves physical strategy to
Catalyst + AQE — on a 1000-executor cluster the same code auto-broadcasts,
coalesces post-shuffle partitions, and splits skewed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_tensors_spark.io.readers import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + group-agg (A1/A7/A11)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integer-valued doubles: their double sum is
            # EXACT (< 2^53), order-independent — no hardening needed
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            # money sums accumulate in DECIMAL (exact cents, associative
            # — double partial-agg order can flip the 6th decimal); the
            # discount product is computed per-row in identical IEEE
            # doubles on both engines, then decimal-snapped before SUM
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            )
            .cast("double")
            .alias("sum_disc"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q2_region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop equi join — the J1–J3 dictionary-encode shape.

    nation (25 rows) and region (5 rows) are broadcast: zero shuffle of
    the fact side beyond the final group-by.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("bal"),
        )
        .orderBy("r_name", "n_name")
    )


def q3_filtered_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-sized dim join + filter (J1 + P-class)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("o_orderpriority")
    )


def q4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join ≡ J4 negative-sample rejection (`sample.py:39-47`)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def q5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join ≡ J5 LCWA admissibility (`sample.py:92-111`)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def q6_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup union ≡ A2/O4 `(subjects ++ objects).distinct`
    (`RDFDatasetReader.scala:30-33`)."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.select(F.col("l_partkey").alias("k")).union(
        li.select(F.col("l_suppkey").alias("k"))
    )
    return keys.distinct().agg(F.count(F.lit(1)).alias("c"))


def q7_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank ≡ W1 candidate ranking (`kge/hole.py:400-405`)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.select("c_custkey", F.rank().over(w).cast("long").alias("r"))
        .filter(F.col("r") <= 3)
        .orderBy("c_custkey")
    )


def q8_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window (rowsBetween) over orders."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            # exact-decimal sum (price data is exact cents): partial-agg
            # ordering can flip the 6th decimal of a double sum between
            # runs/engines; DECIMAL(18,2) accumulation is associative.
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("w"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(1000)
    )


def q9_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k ≡ O2/O3 — Spark plans TakeOrderedAndProject (no full
    sort shuffle; per-partition heaps then merge on driver)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q9b_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (SURVEY §4.2 "subquery decorrelation … free"):
    Catalyst rewrites the scalar agg into a broadcast single-row join —
    no per-row re-evaluation at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS c,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders_v
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders_v)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


def q12_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (`percentile` agg ≡
    DuckDB quantile_cont).  Exact percentile sorts each group — the
    documented scale path is `approx_percentile` (t-digest sketch,
    mergeable map-side), declared here with the exact form so the oracle
    stays deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
            F.round(
                F.expr("percentile(l_extendedprice, 0.25)"), 6
            ).alias("price_p25"),
        )
        .orderBy("l_returnflag")
    )


def q10_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("c"))
        .intersect(supplier.select(F.col("s_nationkey").alias("c")))
        .orderBy("c")
    )


def q10_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("c"))
        .subtract(supplier.select(F.col("s_nationkey").alias("c")))
        .orderBy("c")
    )


def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            # sentinel instead of NULL grouping markers: cross-engine
            # row-hashing over NULL sort order is not guaranteed
            F.coalesce("l_returnflag", F.lit("*")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("l_linestatus"),
            "c",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^n grouping combinations (SURVEY §2.4 — free in Spark
    SQL, absent in the reference)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("l_quantity"), 6).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("l_linestatus"),
            "c",
            "qty",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with an arbitrary set list — ((flag), (status), ())
    is expressible by neither ROLLUP nor CUBE, the general form SURVEY
    §2.4 promises.  Plans as a single Expand + hash aggregate: one scan,
    one shuffle, regardless of how many sets are requested."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("*")).alias("l_linestatus"),
            "c",
            "revenue",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q12_scalar_belt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function belt: string/math exprs stay in codegen."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 5)).alias("s"),
            F.length("p_brand").alias("l"),
            F.round(F.col("p_retailprice") * 1.1, 6).alias("m"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


def q12_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("c"),
        F.min(F.col("l_shipdate").cast("date")).alias("mn"),
        F.max(F.col("l_shipdate").cast("date")).alias("mx"),
    )


def q13_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour bucketing over events — the batch-checkable twin of the
    streaming tumbling window (SURVEY §2.9)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            # DECIMAL(18,6) accumulation — associative, cross-engine safe
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v"),
        )
        .orderBy("h", "event_type")
    )


def q14_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts + total price per priority, one column pair
    per order status (fixed value list so the output schema is static —
    the deployable form of pivot at any scale: one partial-agg shuffle,
    no second pass to discover values)."""
    orders = load_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact-decimal sum — see q8: double sums of ~1e8 need ~16
            # significant digits at 6 dp, the edge of double precision.
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )
    cols = [F.col("o_orderpriority")]
    for s in statuses:
        cols.append(
            F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"n_{s.lower()}")
        )
        cols.append(
            F.coalesce(F.col(f"{s}_total"), F.lit(0.0)).alias(
                f"total_{s.lower()}"
            )
        )
    return out.select(*cols).orderBy("o_orderpriority")


def q15_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions per customer order history: lag /
    lead / ntile / cumulative share — one shuffle on the partition key,
    rows ordered uniquely by (date, key) so results are deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_all = Window.partitionBy("o_custkey")
    return (
        orders.filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("price"),
            F.round(
                F.coalesce(F.lag("o_totalprice").over(w), F.lit(-1.0)), 6
            ).alias("prev_price"),
            F.round(
                F.coalesce(F.lead("o_totalprice").over(w), F.lit(-1.0)), 6
            ).alias("next_price"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(
                F.col("o_totalprice")
                / F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .over(w_all)
                .cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def q16_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through spark.sql: customers with
    an urgent order but no low-priority order, counted per nation.
    Catalyst rewrites the subqueries to semi/anti hash joins — the same
    physical plan q4/q5 declare explicitly."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '5-LOW')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


def q17_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long) with per-metric stats — `DataFrame.unpivot`
    maps to a scan-side Expand, no shuffle until the final agg."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    long = part.unpivot(
        ["p_partkey"], ["size", "retailprice"], "metric", "value"
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_v"),
        )
        .orderBy("metric")
    )


def q18_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact/dim semi-join (operators/bloom.py): lineitem
    rows for a selective part subset, pre-filtered scan-side by the
    dim's broadcast bloom bit set before any exchange touches the fact.
    Result-identical to the plain semi-join the oracle states — the
    bloom is transparent by construction (false positives die in the
    exact join), so correctness checks the whole pruning path."""
    from spark_tensors_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") > 40) & F.col("p_type").startswith("SMALL")
    )
    kept = bloom_semi_join(li, dim, "l_partkey", "p_partkey")
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


Q18_BLOOM_JOIN_SQL = """
    SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 6) AS sum_qty
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_size > 40 AND p_type LIKE 'SMALL%')
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


def q19_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (per-customer top-2 orders by price)
    — the SQL-surface form of grouped top-n.  Catalyst decorrelates the
    LATERAL into a ranked window/join plan; the declared subset keeps
    the output bounded.  Ties by o_orderkey."""
    from spark_tensors_spark.io.readers import load_tables

    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               ROUND(t.o_totalprice, 2) AS price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey % 10 = 0
        ORDER BY c.c_custkey, price DESC, t.o_orderkey
        """
    )


Q19_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS price
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey % 10 = 0
    ORDER BY c.c_custkey, price DESC, t.o_orderkey
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average threshold — the
    average yearly revenue lost if small-quantity orders (below 20% of
    the part's mean quantity) stopped shipping, for one brand.  The
    per-part threshold is a join against a grouped aggregate (Catalyst
    de-correlates the classic scalar subquery into exactly this);
    revenue sums in DECIMAL (money doctrine), the /7 division is one
    bit-identical double op.  The threshold compare needs no rounding:
    both engines derive 0.2·avg from the same exact integer quantity
    sums."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    thr = li.groupBy(F.col("l_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(
            F.broadcast(pa.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
        )
        .join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SMALL_QTY_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
       / CAST(7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
JOIN (SELECT l_partkey,
             CAST(0.2 AS DOUBLE) * AVG(l_quantity) AS qty_thr
      FROM lineitem GROUP BY l_partkey) t
  ON t.l_partkey = l.l_partkey
WHERE l.l_quantity < t.qty_thr
"""


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and NO orders (scalar subquery + anti-join), rolled up per nation.
    Balance sums in DECIMAL; the global average is one 1-row broadcast;
    the anti-join is the 100 TB-correct plan (never a NOT IN over a
    collected list)."""
    cu = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # the average feeds a COMPARISON, so it must be bit-identical
    # cross-engine: exact DECIMAL cents sum, one double division —
    # a raw double AVG is partial-agg-order dependent
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ab")
    )
    rich = cu.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    no_orders = rich.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SALES_OPPORTUNITY_SQL = """
SELECT c_nationkey, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                               AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


Q20_DOMINANT_SUPPLIER_SQL = """
WITH pair AS (
    SELECT l_suppkey, l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
),
part_tot AS (
    SELECT l_partkey, SUM(qty) AS total, CAST(COUNT(*) AS BIGINT) AS n
    FROM pair GROUP BY l_partkey
)
SELECT s.s_name AS s_name, n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_dominant_parts,
       CAST(SUM(p.qty) AS DOUBLE) AS dominant_qty
FROM pair p
JOIN part_tot t ON t.l_partkey = p.l_partkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.qty * t.n > CAST(2 AS DECIMAL(18,2)) * t.total
GROUP BY s.s_name, n.n_name
ORDER BY s_name
"""


def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style double aggregation with a correlated threshold:
    suppliers who DOMINATE a part's 1995 volume (their (supplier,
    part) quantity exceeds 2× the part's average pair quantity).  The
    correlated "vs the part's average" compare is expressed
    MULTIPLICATIVELY (qty·n > 2·total) so both engines compare exact
    DECIMALs — never a float division.  Two aggregations reuse the
    same (partkey) partitioning; the supplier/nation dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    tot = pair.groupBy("l_partkey").agg(
        F.sum("qty").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        pair.join(tot, "l_partkey")
        .filter(
            F.col("qty") * F.col("n")
            > F.lit(2).cast("decimal(18,2)") * F.col("total")
        )
        .join(
            F.broadcast(sup),
            pair["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dominant_parts"),
            F.sum("qty").cast("double").alias("dominant_qty"),
        )
        .orderBy("s_name")
    )


# ONE ANSI string, TWO engines: the Spark side runs this verbatim via
# spark.sql over registered temp views, and the SAME constant is the
# DuckDB oracle — the strongest possible demonstration that the
# engine's SQL surface is portable (any drift in parsing, coercion,
# DECIMAL math, or date semantics between the engines would hash-fail).
Q23_PORTABLE_SQL = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY nation
"""


def q23_portable_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface portability: `spark.sql` executes the IDENTICAL
    ANSI text DuckDB runs as the oracle (`Q23_PORTABLE_SQL`) — no
    DataFrame translation layer at all.  Catalyst still plans it like
    the DataFrame queries (broadcast dim joins, partial aggregation),
    which the plan-hygiene gate checks like every other entry."""
    from spark_tensors_spark.io.readers import load_tables

    load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(Q23_PORTABLE_SQL)


def q24_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the classic join-ORDERING benchmark: a 6-table
    chain (lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region)
    with the local-supplier condition c_nationkey = s_nationkey.  The
    dims (supplier, customer-filtered, nation, region) broadcast; the
    two fact tables meet in ONE shuffle on orderkey; revenue follows
    q1's DECIMAL money doctrine.  At 100 TB the join order is the whole
    game — filters reach the scans, the region filter prunes nation and
    supplier BEFORE any fact row moves."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    asia_supp = supplier.join(
        F.broadcast(asia_nations),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


def q25_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — the data-quality rule
    engine's missing half (operators/quality.py covers single-table
    rules): for each foreign-key relationship, count child rows and
    orphans (children whose parent key finds no match — NULL keys
    count as orphans on both engines) in ONE aggregate over a
    broadcast left join per relation.  At 100 TB each relation is one
    scan + one probe against a broadcast/bloom of parent keys; the
    relations are independent and union at the end (no barrier)."""
    out = None
    for rel, child_t, child_k, parent_t, parent_k in _Q25_CHECKS:
        child = load_table(spark, sf_dir, child_t)
        parent = (
            load_table(spark, sf_dir, parent_t)
            .select(F.col(parent_k).alias(child_k))
            .distinct()
            .withColumn("_parent_hit", F.lit(1))
        )
        one = (
            child.select(child_k)
            .join(F.broadcast(parent), child_k, "left")
            .agg(
                F.lit(rel).alias("relation"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    F.when(F.col("_parent_hit").isNull(), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_orphans"),
            )
        )
        out = one if out is None else out.unionByName(one)
    return out.select("relation", "n_child", "n_orphans").orderBy("relation")


def q26_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bidirectional two-nation trade
    — supplier-nation × customer-nation revenue by ship year.  The
    6-table join q24 (Q5 shape) lacks: the SAME dimension (nation)
    joined twice under different roles, with a cross-pair predicate.

    Scale shape: nation is filtered to the two names AT THE SCAN and
    explicitly broadcast into supplier and customer, shrinking both to
    2/25 of their rows BEFORE the fact joins; lineitem⋈orders is the
    one unavoidable big shuffle (orderkey), and AQE is left to choose
    broadcast vs shuffle for the pre-shrunk supplier/customer sides —
    at 100 TB those are 100M-row subsets, broadcastable by neither.
    Revenue accumulates in DECIMAL(18,6) per the q1 money doctrine.
    """
    names = [f"NATION_{i}" for i in range(10)]
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(names)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q26_VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN (SELECT s_suppkey, n_name AS supp_nation
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name LIKE 'NATION!__' ESCAPE '!') s
  ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN (SELECT c_custkey, n_name AS cust_nation
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name LIKE 'NATION!__' ESCAPE '!') c
  ON o.o_custkey = c.c_custkey
WHERE s.supp_nation <> c.cust_nation
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q27_fastss_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join (entity resolution): all customer-name pairs
    within Levenshtein distance 1, found WITHOUT an all-pairs compare —
    the FastSS / SymSpell deletion-neighborhood algorithm (Bocek et al.
    2007): each name expands to itself plus every delete-one-character
    variant (len+1 rows), candidates are pairs sharing ANY variant
    (covers every substitution, insertion, and deletion), and only
    candidates pay the exact levenshtein verify.

    Scale shape (position-refined FastSS, r14): a bare join on the
    variant string explodes on templated names (`Customer#00000NNNN`
    makes delete-one-digit variants collide en masse — the r13 sf1.0
    decade measured 17.2×).  The refinement is LOSSLESS: a pair at
    Levenshtein ≤ 1 is either (a) a substitution pair — both names
    yield the same variant by deleting the SAME position i (the
    differing one), or (b) an indel/equal pair — one name IS a
    delete-variant of the other, i.e. matches the other side's i=0
    self-row.  So two narrow equi-joins cover every true pair: join A
    on (v, i) with i ≥ 1 (bucket ≤ |alphabet| names — the inserts of
    one char at position i into v), and join B of the n self-rows
    against all variants on v (left bucket ≈ 1 name per string).  No
    bucket grows with n, candidates ⊆ the single-join candidate set,
    and the exact levenshtein verify makes the OUTPUT identical — the
    oracle is unchanged.  Output is the 100 lexicographically-smallest
    verified pairs plus the total pair count, bounded at any SF.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    # variant rows carry ONLY (key, pos, variant): the candidate dedup
    # shuffles narrow int pairs, not two 36-char names per row (the
    # wide-distinct form measured 2-3x slower at sf0.1); names attach
    # after dedup via two broadcast joins against the customer dim
    variants = cust.select(
        "c_custkey",
        F.explode(
            F.sequence(F.lit(0), F.length("c_name"))
        ).alias("_i"),
        F.when(F.col("_i") == 0, F.col("c_name"))
        .otherwise(
            F.concat(
                F.expr("substr(c_name, 1, _i - 1)"),
                F.expr("substr(c_name, _i + 1)"),
            )
        )
        .alias("v"),
    ).select("c_custkey", "_i", "v")
    # join A: substitution pairs share (variant, delete-position)
    va = variants.filter(F.col("_i") >= 1)
    cand_sub = (
        va.select(F.col("c_custkey").alias("k1"), "_i", "v")
        .join(
            va.select(F.col("c_custkey").alias("k2"), "_i", "v"),
            ["v", "_i"],
        )
        .filter(F.col("k1") < F.col("k2"))
        .select("k1", "k2")
    )
    # join B: indel/equal pairs — one side's full name (i=0 self-row)
    # equals a variant of the other
    cand_indel = (
        variants.filter(F.col("_i") == 0)
        .select(F.col("c_custkey").alias("ka"), "v")
        .join(variants.select(F.col("c_custkey").alias("kb"), "v"), "v")
        .filter(F.col("ka") != F.col("kb"))
        .select(
            F.least("ka", "kb").alias("k1"),
            F.greatest("ka", "kb").alias("k2"),
        )
    )
    cand = cand_sub.union(cand_indel).distinct()
    a = cust.select(
        F.col("c_custkey").alias("k1"), F.col("c_name").alias("name_a")
    )
    b = cust.select(
        F.col("c_custkey").alias("k2"), F.col("c_name").alias("name_b")
    )
    pairs = (
        cand.join(F.broadcast(a), "k1")
        .join(F.broadcast(b), "k2")
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select("name_a", "name_b")
        .distinct()  # key pairs -> name pairs is many-to-one in general
        .localCheckpoint()  # two consumers (top-k + count): one compute
    )
    total = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs_total")
    )
    # distributed top-k (TakeOrderedAndProject) × broadcast 1-row count
    # — never a single-partition global window over all pairs
    return (
        pairs.orderBy("name_a", "name_b")
        .limit(100)
        .crossJoin(F.broadcast(total))
    )


Q27_FASTSS_NAME_PAIRS_SQL = """
WITH exploded AS (
    SELECT c_custkey, c_name,
           unnest(range(0, length(c_name) + 1)) AS i
    FROM customer
),
variants AS (
    SELECT c_custkey, c_name,
           CASE WHEN i = 0 THEN c_name
                ELSE substr(c_name, 1, CAST(i AS INTEGER) - 1)
                     || substr(c_name, CAST(i AS INTEGER) + 1)
           END AS v
    FROM exploded
),
pairs AS (
    SELECT DISTINCT a.c_name AS name_a, b.c_name AS name_b
    FROM variants a
    JOIN variants b ON a.v = b.v AND a.c_custkey < b.c_custkey
),
verified AS (
    SELECT name_a, name_b FROM pairs
    WHERE levenshtein(name_a, name_b) <= 1
)
SELECT name_a, name_b,
       CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs_total
FROM verified
ORDER BY name_a, name_b
LIMIT 100
"""


def q28_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    customer→orders with a predicate ON THE JOIN (exclude urgent
    orders — stands in for Q13's comment filter; a WHERE would drop
    zero-order customers, the point of the query), count per customer
    INCLUDING zeros, then histogram the counts.

    Scale shape: the join shuffles on custkey once; the first count is
    map-side combinable; the second aggregate is tiny (distinct order
    counts).  Customers with no orders survive via the left join —
    never an anti-join + union."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q28_CUST_DISTRIBUTION_SQL = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q30_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape on this schema (no partsupp table, so the
    'supply cost' is the supplier's observed lineitem price): for each
    large part (p_size > 45), the EUROPE suppliers that sold it at the
    region-minimum extended price — the classic correlated-scalar-
    subquery-per-group pattern, decorrelated the Spark-first way as
    ONE window min over the offers frame (a single shuffle on
    p_partkey; no join back, no per-part subquery execution).  MIN on
    stored doubles is a pure selection (no arithmetic), so the value
    is cross-engine exact."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    li = load_table(spark, sf_dir, "lineitem")
    eu_supp = (
        supplier.join(
            nation, supplier.s_nationkey == nation.n_nationkey
        )
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    offers = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(
            part.select(F.col("p_partkey").alias("l_partkey")), "l_partkey"
        )
        .join(
            F.broadcast(eu_supp).withColumnRenamed("s_suppkey", "l_suppkey"),
            "l_suppkey",
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("_mn", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_mn"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("s_name"),
            F.col("l_extendedprice").alias("price"),
        )
        .distinct()
        .orderBy("price", "p_partkey", "s_name")
        .limit(100)
    )


Q30_MIN_PRICE_SUPPLIER_SQL = """
SELECT DISTINCT p.p_partkey, s.s_name, l.l_extendedprice AS price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size > 45 AND r.r_name = 'EUROPE'
  AND l.l_extendedprice = (
      SELECT MIN(l2.l_extendedprice)
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY price, p_partkey, s_name
LIMIT 100
"""


def q29_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    the available columns (no commit/receipt dates): count each
    RETURNED line ('R') of a finished order ('F') whose order drew
    lines from ≥ 2 distinct suppliers but where THIS supplier is the
    only one with a return — Q21's EXISTS (another supplier on the
    order) + NOT EXISTS (another supplier also failed) pair.

    Scale shape: the correlated sub-queries are rewritten as ONE
    per-order aggregate (distinct suppliers, distinct returning
    suppliers) joined back to the returned lines — two shuffles on
    orderkey total, where the textbook double self-join pays three and
    skews on hot orders.  Supplier lookup broadcasts; top-20 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li_f = li.join(
        orders_f, li["l_orderkey"] == orders_f["o_orderkey"]
    ).drop("o_orderkey")
    per_order = li_f.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    waiting = (
        li_f.filter(F.col("l_returnflag") == "R")
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
            ),
            "l_orderkey",
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        waiting.join(F.broadcast(supp), "l_suppkey")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q29_WAITING_SUPPLIER_SQL = """
WITH li_f AS (
    SELECT l_orderkey, l_suppkey, l_returnflag
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                               THEN l_suppkey END) AS n_ret_supp
    FROM li_f GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM li_f
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE l_returnflag = 'R' AND n_supp >= 2 AND n_ret_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES = {
    "q28_cust_distribution": q28_cust_distribution,
    "q29_waiting_supplier": q29_waiting_supplier,
    "q30_min_price_supplier": q30_min_price_supplier,
    "q26_volume_shipping": q26_volume_shipping,
    "q27_fastss_name_pairs": q27_fastss_name_pairs,
    "q24_local_supplier_revenue": q24_local_supplier_revenue,
    "q25_fk_orphans": q25_fk_orphans,
    "q23_portable_sql": q23_portable_sql,
    "q20_dominant_supplier": q20_dominant_supplier,
    "q1_pricing_summary": q1_pricing_summary,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q22_sales_opportunity": q22_sales_opportunity,
    "q2_region_nation_rollup": q2_region_nation_rollup,
    "q3_filtered_dim_join": q3_filtered_dim_join,
    "q4_anti_join": q4_anti_join,
    "q5_semi_join": q5_semi_join,
    "q6_distinct_union": q6_distinct_union,
    "q7_rank_topk": q7_rank_topk,
    "q8_frame_window": q8_frame_window,
    "q9_topk": q9_topk,
    "q10_intersect": q10_intersect,
    "q10_except": q10_except,
    "q9b_scalar_subquery": q9b_scalar_subquery,
    "q11_rollup": q11_rollup,
    "q11_cube": q11_cube,
    "q11_grouping_sets": q11_grouping_sets,
    "q12_percentiles": q12_percentiles,
    "q12_scalar_belt": q12_scalar_belt,
    "q12_dates": q12_dates,
    "q13_time_buckets": q13_time_buckets,
    "q14_pivot": q14_pivot,
    "q15_window_nav": q15_window_nav,
    "q16_exists": q16_exists,
    "q17_unpivot": q17_unpivot,
    "q18_bloom_join": q18_bloom_join,
    "q19_lateral_topn": q19_lateral_topn,
}

Q24_LOCAL_SUPPLIER_REVENUE_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
             AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY n_name
"""

_Q25_CHECKS = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]

Q25_FK_ORPHANS_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{rel}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN p.{parent_k} IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
FROM {child_t} c
LEFT JOIN (SELECT DISTINCT {parent_k} FROM {parent_t}) p
  ON c.{child_k} = p.{parent_k}"""
    for rel, child_t, child_k, parent_t, parent_k in _Q25_CHECKS
) + "\nORDER BY relation"

ORACLES = {
    "q28_cust_distribution": Q28_CUST_DISTRIBUTION_SQL,
    "q29_waiting_supplier": Q29_WAITING_SUPPLIER_SQL,
    "q30_min_price_supplier": Q30_MIN_PRICE_SUPPLIER_SQL,
    "q26_volume_shipping": Q26_VOLUME_SHIPPING_SQL,
    "q27_fastss_name_pairs": Q27_FASTSS_NAME_PAIRS_SQL,
    "q24_local_supplier_revenue": Q24_LOCAL_SUPPLIER_REVENUE_SQL,
    "q25_fk_orphans": Q25_FK_ORPHANS_SQL,
    "q23_portable_sql": Q23_PORTABLE_SQL,
    "q20_dominant_supplier": Q20_DOMINANT_SUPPLIER_SQL,
    "q17_small_qty_revenue": Q17_SMALL_QTY_REVENUE_SQL,
    "q22_sales_opportunity": Q22_SALES_OPPORTUNITY_SQL,
    "q18_bloom_join": Q18_BLOOM_JOIN_SQL,
    "q19_lateral_topn": Q19_LATERAL_SQL,
    "q16_exists": """
        SELECT c_nationkey, COUNT(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '5-LOW')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "q17_unpivot": """
        WITH long AS (
            SELECT p_partkey, 'size' AS metric,
                   CAST(p_size AS DOUBLE) AS value FROM part
            UNION ALL
            SELECT p_partkey, 'retailprice', p_retailprice FROM part
        )
        SELECT metric,
               COUNT(*) AS n,
               ROUND(MIN(value), 6) AS min_v,
               ROUND(MAX(value), 6) AS max_v,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_v
        FROM long
        GROUP BY metric
        ORDER BY metric
    """,
    "q14_pivot": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_f,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0)
                    AS DOUBLE) AS total_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_o,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0)
                    AS DOUBLE) AS total_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_p,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0)
                    AS DOUBLE) AS total_p
        FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q15_window_nav": """
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice, 6) AS price,
               ROUND(COALESCE(LAG(o_totalprice) OVER w, -1.0), 6)
                   AS prev_price,
               ROUND(COALESCE(LEAD(o_totalprice) OVER w, -1.0), 6)
                   AS next_price,
               NTILE(4) OVER w AS quartile,
               ROUND(o_totalprice
                     / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                            OVER (PARTITION BY o_custkey) AS DOUBLE), 6)
                   AS share
        FROM orders
        WHERE o_custkey % 10 = 0
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 6) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_base,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               COUNT(*) AS cnt
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q2_region_nation_rollup": """
        SELECT r_name, n_name, COUNT(*) AS c,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "q3_filtered_dim_join": """
        SELECT o_orderpriority, COUNT(*) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q4_anti_join": """
        SELECT COUNT(*) AS c
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q5_semi_join": """
        SELECT COUNT(*) AS c
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
    "q6_distinct_union": """
        SELECT COUNT(*) AS c FROM (
            SELECT l_partkey AS k FROM lineitem
            UNION
            SELECT l_suppkey FROM lineitem
        ) t
    """,
    "q7_rank_topk": """
        SELECT c_custkey, r FROM (
            SELECT c_custkey,
                   RANK() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS r
            FROM customer
        ) t
        WHERE r <= 3
        ORDER BY c_custkey
    """,
    "q8_frame_window": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS w
        FROM orders
        ORDER BY o_custkey, o_orderkey
        LIMIT 1000
    """,
    "q9_topk": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q10_intersect": """
        SELECT c FROM (
            SELECT c_nationkey AS c FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier
        ) t ORDER BY c
    """,
    "q10_except": """
        SELECT c FROM (
            SELECT c_nationkey AS c FROM customer
            EXCEPT
            SELECT s_nationkey FROM supplier
        ) t ORDER BY c
    """,
    "q9b_scalar_subquery": """
        SELECT o_orderpriority,
               COUNT(*) AS c,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q12_percentiles": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
               ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90,
               ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q11_rollup": """
        SELECT COALESCE(l_returnflag, '*') AS l_returnflag,
               COALESCE(l_linestatus, '*') AS l_linestatus,
               COUNT(*) AS c
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "q11_cube": """
        SELECT COALESCE(l_returnflag, '*') AS l_returnflag,
               COALESCE(l_linestatus, '*') AS l_linestatus,
               COUNT(*) AS c,
               ROUND(SUM(l_quantity), 6) AS qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "q11_grouping_sets": """
        SELECT COALESCE(l_returnflag, '*') AS l_returnflag,
               COALESCE(l_linestatus, '*') AS l_linestatus,
               COUNT(*) AS c,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag, l_linestatus
    """,
    "q12_scalar_belt": """
        SELECT p_partkey,
               UPPER(SUBSTR(p_name, 1, 5)) AS s,
               LENGTH(p_brand) AS l,
               ROUND(p_retailprice * 1.1, 6) AS m
        FROM part
        ORDER BY p_partkey
        LIMIT 500
    """,
    "q12_dates": """
        SELECT COUNT(*) AS c,
               CAST(MIN(l_shipdate) AS DATE) AS mn,
               CAST(MAX(l_shipdate) AS DATE) AS mx
        FROM lineitem
    """,
    "q13_time_buckets": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
               COUNT(*) AS c, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}
