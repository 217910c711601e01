"""Temporal joins the reference lacks (SURVEY §2.3: "no theta/range/
as-of joins exist in the reference; the new engine gets range/as-of over
`events` as north-star extensions").

Scale design (the whole point of these implementations):

  - :func:`asof_join` is the **union + carry-forward window** form: tag
    both sides, one shuffle on the join keys, ``last(..., ignoreNulls)``
    over an ever-growing frame carries the latest right-side row to each
    left row.  Cost is O((|L|+|R|)·log) per key with NO pairwise
    expansion — a naive theta join materializes |L|×|R| pairs before
    filtering and is unrunnable at 100 TB.

  - :func:`bucketed_interval_join` turns the inequality join
    ``r.ts ∈ (l.ts − δ, l.ts]`` into an **equi-join on coarse time
    buckets** (bucket width = δ): each left row explodes into the ≤2
    buckets its interval can touch, the join runs as a plain hash/merge
    equi-join on (keys…, bucket), and the exact predicate filters the
    residue.  Shuffle volume is 2·|L| + |R| rows instead of the |L|×|R|
    theta-join cross space — the same trick Databricks' range-join
    optimization and Flink's interval join use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row (same keys,
    ``right.ts <= left.ts``; a right row at the exact same timestamp
    matches, i.e. DuckDB/pandas ``ASOF`` ``>=`` semantics).

    Returns all left columns + ``<ts_col><suffix>`` + ``<v><suffix>``
    for each value col (null where nothing precedes, or where the match
    is older than ``tolerance_seconds``).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (*keys, ts_col)
    ]

    rval_type = StructType(
        [StructField("_rts", right.schema[ts_col].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    lrow_type = StructType(
        [StructField(c, left.schema[c].dataType) for c in left.columns]
    )

    # side 0 sorts before side 1 at equal ts → ">= match" semantics
    tagged_left = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rval_type).alias("_rval"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    tagged_right = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).alias("_rts"),
            *[F.col(c) for c in value_cols],
        ).alias("_rval"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
    )

    # xxhash64(_rval) as the final key makes the pick among right rows
    # tied on (keys, ts) deterministic across partitionings/retries
    # (left rows carry a null _rval → constant hash, ordering unaffected).
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            F.xxhash64(F.col("_rval")).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).withColumn(
        "_match", F.last("_rval", ignorenulls=True).over(w)
    )

    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.unix_micros(F.col(ts_col))
            - F.unix_micros(F.col("_match._rts"))
        ) <= int(tolerance_seconds * 1_000_000)
        out = out.withColumn("_match", F.when(within, F.col("_match")))
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        F.col("_match._rts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    lookback_seconds: int = 600,
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join right rows with ``l.ts − δ < r.ts <= l.ts`` on the same
    keys; output = left columns + ``r_``-prefixed right columns, one row
    per matched pair.

    A right row's bucket is either the left row's bucket or the one
    before it, so exploding left into those two buckets makes the bucket
    equi-join lossless and duplicate-free.

    ``how='left'`` additionally keeps unmatched left rows (right columns
    null) via matched ∪ anti-join — a naive left-outer on the exploded
    buckets would emit spurious half-null rows for the bucket that
    didn't match.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    delta_us = lookback_seconds * 1_000_000
    # floor, not cast: cast('long') truncates toward zero, which
    # mis-buckets pre-1970 (negative-micros) timestamps; kg/tensor.py
    # uses F.floor for the same reason.
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / delta_us).cast("long")
    l_t = left.withColumn("_lid", F.monotonically_increasing_id())
    l_b = l_t.withColumn(
        "_bucket", F.explode(F.array(bucket, bucket - 1))
    )
    r_b = right.select(
        bucket.alias("_bucket"),
        *[F.col(k).alias(f"{right_prefix}{k}") for k in keys],
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    key_cond = F.expr(
        " AND ".join(f"{right_prefix}{k} = {k}" for k in keys)
    )
    joined = l_b.join(
        r_b, on=(l_b["_bucket"] == r_b["_bucket"]) & key_cond, how="inner"
    )
    lt = F.unix_micros(F.col(ts_col))
    rt = F.unix_micros(F.col(f"{right_prefix}{ts_col}"))
    matched = joined.filter((rt > lt - delta_us) & (rt <= lt)).drop(
        "_bucket"
    )
    if how == "inner":
        return matched.drop("_lid")
    # Recover unmatched left rows via the surrogate _lid, NOT an
    # anti-join on all left columns: NULL never equals NULL, so a
    # matched left row containing a NULL would be re-emitted as a
    # spurious null-padded "unmatched" row under the full-column form.
    unmatched = l_t.join(
        matched.select("_lid"), on="_lid", how="left_anti"
    )
    for c in matched.columns:
        if c not in l_t.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(matched.dtypes)[c])
            )
    return matched.unionByName(unmatched).drop("_lid")


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 300,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign each row a per-key SESSION INDEX under the idle-gap rule
    (a session closes after ``gap_seconds`` without activity) — the
    row-level counterpart of `streaming/windows.session_window_agg`
    (which aggregates; this LABELS, e.g. for per-session feature
    joins downstream).

    One ordered window, two passes fused by Catalyst: new-session flag
    = gap to the previous row exceeds the threshold; session index =
    running sum of flags (1-based).  Pure integer/timestamp codegen —
    exact on any engine.  Adds ``session_idx`` (long).

    Boundary semantics (INCLUSIVE gap, strict ``>``): an event at
    EXACTLY ``gap_seconds`` after the previous one stays in the SAME
    session.  This matches Spark's ``session_window``, whose merge is
    inclusive at the session end (an event at ``prev_ts + gap`` is
    absorbed and extends the window) — verified empirically and pinned
    by an exact-gap case in
    tests/test_temporal_queries.py::test_sessionize_exact_gap_boundary.
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(
        "session_idx", F.sum(new_sess).over(run).cast("long")
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str | None = None,
    alpha: float = 0.5,
    window: int = 20,
) -> DataFrame:
    """Exponentially weighted moving average per key — the standard
    time-series smoother, as a ``window``-term truncated recursion
    ``acc' = (1−α)·acc + α·x`` left-folded over the last ``window``
    observations (truncation error ≤ (1−α)^window of the oldest mass;
    2⁻²⁰ at the defaults).

    Scale shape: ONE ordered window (collect_list over a bounded rows
    frame — state per row is ``window`` doubles) + a codegen fold; no
    self-joins, no Python.  With α = ½ every step is an exact
    power-of-two scaling, so the fold performs one deterministic IEEE
    rounding per element in a fixed order — bit-identical on any
    engine that folds left (the DuckDB oracle uses list_reduce over
    the same frame).  Returns the input keys + ts (+ tiebreak) with an
    ``ewma`` column.  The output is deliberately UNROUNDED: the fold
    doubles are bit-identical cross-engine, while ROUND(x, 6) is not —
    α = ½ fold values are dyadic rationals that land exactly on 6-dp
    half-boundaries, where Spark's exact-decimal HALF_UP and DuckDB's
    float-path ROUND split by 1 ulp (observed at sf0.01).
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    lst = F.collect_list(F.col(value_col).cast("double")).over(w)
    folded = F.aggregate(
        lst,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    out_cols = [*key_cols, ts_col]
    if order_tiebreak:
        out_cols.append(order_tiebreak)
    return df.select(*out_cols, F.col(value_col)).withColumn(
        "ewma", folded
    )


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 60,
) -> DataFrame:
    """Regular-grid resampling with forward fill — the time-series
    gap-filling operator (pandas ``resample().last().ffill()`` per
    key, distributed).  Per key: a codegen ``sequence()`` generates the
    grid between the key's first and last observation, the last value
    in each bucket lands via one grouped agg, and gaps forward-fill
    with a ``last(ignoreNulls)`` running window.

    Scale shape: one groupBy for the per-key span (tiny), one grouped
    agg keyed (key, bucket), one window partitioned by key — grid rows
    are (span/step) per key, generated scan-side, never a cross join.
    Returns (*key_cols, bucket_ts, v) with v forward-filled (leading
    gaps keep the first observed value by construction: the grid
    starts at the first observation's bucket).
    """
    from pyspark.sql.window import Window

    step = int(step_seconds)
    bucket = (F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
    obs = df.select(
        *key_cols, bucket.alias("_b"), F.col(ts_col).alias("_ts"),
        F.col(value_col),
    )
    # last observation per (key, bucket): max_by on (ts, value) — the
    # latest row wins; within equal ts the max value is the
    # deterministic tie-break (struct ordering is lexicographic).
    per_bucket = obs.groupBy(*key_cols, "_b").agg(
        F.max_by(value_col, F.struct("_ts", value_col)).alias("_v")
    )
    span = obs.groupBy(*key_cols).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
        ).alias("_b"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [*key_cols, "_b"], "left")
        .withColumn("v", F.last("_v", ignorenulls=True).over(w))
        .select(
            *key_cols,
            F.timestamp_seconds(F.col("_b")).alias("bucket_ts"),
            "v",
        )
    )
