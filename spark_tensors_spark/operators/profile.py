"""One-pass column profiling — the ANALYZE/data-quality primitive.

``profile`` computes, for every requested column in ONE scan-side
aggregate: null count, exact distinct count, and min/max (numeric and
timestamp columns in a numeric slot, strings in a string slot — never
a cross-engine float→string format round trip).  Output is one row per
column, so the profile of a 100 TB table is #columns rows.

Scale shape: a single global aggregate.  With ``exact=True`` (the
default — approximation must be opt-in, never silent) the multiple
DISTINCT aggregates plan as one Expand — ONE INPUT REPLICA PER
DISTINCT AGGREGATE, so a 20-column table scans 20× the rows before
the partial aggregation.  ``exact=False`` uses
``approx_count_distinct`` (HLL++, rsd 0.01): no Expand, fully
mergeable partial states, the same one-pass plan at any column count
— the shuffle carries per-column sketch states, not rows.  At 100 TB
pass ``exact=False`` (see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _profile_agg(df: DataFrame, cols: list[str], exact: bool) -> DataFrame:
    """The single scan-side wide aggregate behind :func:`profile`
    (pre-checkpoint, so plan tests can pin the Expand / no-Expand
    shape)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        distinct_agg = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd=0.01)
        )
        aggs.append(distinct_agg.alias(f"{c}__distinct"))
        if isinstance(dt, _NUMERIC):
            num = F.col(c).cast("double")
            aggs.append(F.min(num).alias(f"{c}__min_num"))
            aggs.append(F.max(num).alias(f"{c}__max_num"))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            num = F.unix_micros(F.col(c)).cast("double")
            aggs.append(F.min(num).alias(f"{c}__min_num"))
            aggs.append(F.max(num).alias(f"{c}__max_num"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(F.col(c)).alias(f"{c}__min_str"))
            aggs.append(F.max(F.col(c)).alias(f"{c}__max_str"))
    return df.agg(*aggs)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """DataFrame(col, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — one row per profiled column, one input scan.

    Numeric columns land min/max in ``min_num``/``max_num`` (DOUBLE);
    timestamps as epoch microseconds in the same slots (format-free);
    strings in ``min_str``/``max_str``.  Unsupported types profile
    nulls/distinct only.

    ``exact`` switches ``n_distinct`` between exact ``countDistinct``
    (the DEFAULT — callers get exact cardinalities unless they opt
    out; it plans an Expand, one input replica per distinct aggregate)
    and ``approx_count_distinct`` (``exact=False``: no Expand, HLL++
    sketch partials — the 100 TB path, plan-pinned in
    tests/test_profile.py).  Approximation is opt-in so a silent
    default never hands a caller approximate counts (r6 ADVICE).
    """
    cols = columns or df.columns
    # materialize the 1-row aggregate ONCE — the melt below reads it
    # #cols times, and an unpersisted agg would rerun the full scan per
    # union branch
    one = _profile_agg(df, cols, exact).localCheckpoint()
    # melt the single wide row into one row per column (a #cols-element
    # scan over a 1-row frame — free)
    parts = []
    for c in cols:
        have_num = f"{c}__min_num" in one.columns
        have_str = f"{c}__min_str" in one.columns
        parts.append(
            one.select(
                F.lit(c).alias("col"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                # sentinels, not NULLs: a NULL double reaches the
                # driver's pandas fetch as NaN on one engine and None
                # on the other (r1 oracle doctrine)
                (F.col(f"{c}__min_num") if have_num
                 else F.lit(-1.0)).alias("min_num"),
                (F.col(f"{c}__max_num") if have_num
                 else F.lit(-1.0)).alias("max_num"),
                (F.col(f"{c}__min_str") if have_str
                 else F.lit("")).alias("min_str"),
                (F.col(f"{c}__max_str") if have_str
                 else F.lit("")).alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
