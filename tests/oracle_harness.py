"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a PySpark query and its declared DuckDB oracle SQL over the same
parquet tables, normalizes both results (column-name sort, 6-dp double
rounding, ISO timestamps, row sort), and asserts equality — the same
contract the driver's CORRECTNESS_r{N}.json check applies.

Type-faithfulness (round-4 hardening): the driver fetches the DuckDB
result through pandas, where an uncast integer SUM (DuckDB HUGEINT)
becomes float64 and stringifies as "6.0" while Spark's BIGINT gives
"6" — a hash mismatch the old harness could not see because Python's
`6.0 == 6`. We now (a) fetch DuckDB via fetchdf() like the driver and
(b) tag every normalized cell with its engine type class ("i"/"f"/"b"/
"d"/"t"), so an int on one side and a float on the other NEVER compare
equal locally. This reproduces the three r3 driver failures pre-fix.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

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
    if isinstance(v, datetime):  # includes pd.Timestamp
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        # DuckDB DATE arrives as a midnight Timestamp through pandas
        # while Spark DateType collects as datetime.date — align them.
        return ("t", v.isoformat() + "T00:00:00")
    if isinstance(v, dict):  # DuckDB struct via pandas
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)) or (
        hasattr(v, "dtype") and hasattr(v, "__len__")
    ):  # list/tuple/Row/np.ndarray
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar → Python scalar
        v = v.item()
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # repr-normalize so -0.0 vs 0.0 is VISIBLE: the driver's hash
        # distinguishes sign of zero (emb_whiten_moments failed the r6
        # gate on exactly this while the old `0.0 if r == 0` coercion
        # passed locally).  repr is injective on finite floats, so this
        # changes nothing else.
        return ("f", repr(round(v, 6)))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        return ("d", str(v))
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
    """Fetch through pandas — the driver's path — so DuckDB result
    types (e.g. HUGEINT→float64) survive into the comparison."""
    df = con.sql(sql).fetchdf()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return cols, rows


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
