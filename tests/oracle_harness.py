"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a PySpark query and its declared DuckDB oracle SQL over the same
parquet tables, normalizes both results (column-name sort, 6-dp double
rounding, ISO timestamps, row sort), and asserts equality — the same
contract the driver's CORRECTNESS_r{N}.json check applies.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return 0.0 if r == 0 else r
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def normalize(columns, rows):
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(
        (tuple(_norm_cell(row[i]) for i in order) for row in rows),
        key=lambda r: tuple(
            (x is None, str(type(x)), str(x)) for x in r
        ),
    )
    return cols, data


def run_spark(query_fn, spark, sf_dir):
    df = query_fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_duck(con, sql):
    res = con.sql(sql)
    return list(res.columns), res.fetchall()


def compare(query_fn, oracle, spark, sf_dir, con=None):
    """Return (ok, detail) comparing engine vs oracle results."""
    own_con = con is None
    if own_con:
        con = duck_connection(sf_dir)
    try:
        s_cols, s_rows = run_spark(query_fn, spark, sf_dir)
        d_cols, d_rows = run_duck(con, oracle)
        ns_cols, ns_rows = normalize(s_cols, s_rows)
        nd_cols, nd_rows = normalize(d_cols, d_rows)
        if ns_cols != nd_cols:
            return False, f"columns differ: spark={ns_cols} duck={nd_cols}"
        if len(ns_rows) != len(nd_rows):
            return False, (
                f"row count differs: spark={len(ns_rows)} duck={len(nd_rows)}"
            )
        if ns_rows != nd_rows:
            for i, (a, b) in enumerate(zip(ns_rows, nd_rows)):
                if a != b:
                    return False, f"first diff at row {i}: spark={a} duck={b}"
        return True, f"ok ({len(ns_rows)} rows)"
    finally:
        if own_con:
            con.close()
