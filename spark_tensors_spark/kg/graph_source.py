"""Deterministic knowledge graph derived from the driver's star schema.

The driver pre-registers only the TPC-H-ish parquet views for the DuckDB
oracle, so KG queries must *construct* their triple table identically in
both engines.  This module is the Spark side; ``queries/kg.py`` carries
the equivalent SQL CTE (``TRIPLES_CTE``) for the oracle.

Graph shape (multi-relation, Zipf-ish in-degree on nations/customers):

    c:<custkey>  in_nation  n:<nationkey>     (customer)
    s:<suppkey>  in_nation  n:<nationkey>     (supplier)
    n:<nationkey> in_region rg:<regionkey>    (nation)
    o:<orderkey> placed_by  c:<custkey>       (orders)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table


def _uri(prefix: str, col: str):
    return F.concat(F.lit(prefix), F.col(col).cast("string"))


def triples_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame(s, p, o) — the derived deterministic KG."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    c_n = customer.select(
        _uri("c:", "c_custkey").alias("s"),
        F.lit("in_nation").alias("p"),
        _uri("n:", "c_nationkey").alias("o"),
    )
    s_n = supplier.select(
        _uri("s:", "s_suppkey").alias("s"),
        F.lit("in_nation").alias("p"),
        _uri("n:", "s_nationkey").alias("o"),
    )
    n_r = nation.select(
        _uri("n:", "n_nationkey").alias("s"),
        F.lit("in_region").alias("p"),
        _uri("rg:", "n_regionkey").alias("o"),
    )
    o_c = orders.select(
        _uri("o:", "o_orderkey").alias("s"),
        F.lit("placed_by").alias("p"),
        _uri("c:", "o_custkey").alias("o"),
    )
    return c_n.union(s_n).union(n_r).union(o_c)
