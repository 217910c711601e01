"""Declared queries + DuckDB oracles for the temporal join operators
(operators/temporal.py): as-of join and bucketed interval (range) join
over the `events` table.

The DuckDB oracle uses its native ``ASOF JOIN`` / inequality join while
the engine runs the scale-safe single-shuffle forms — different
algorithms, identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.operators.temporal import (
    asof_join,
    bucketed_interval_join,
)


def ev_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each error event → most recent preceding click by the same user
    (any age), with the click's value and the µs gap."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        errors, clicks, keys=["user_id"], ts_col="ts",
        value_cols=["value"], suffix="_click",
    )
    # no-match rows surface as -1 sentinels (never NULL): the driver's
    # row-sort hashing is not guaranteed NULL-safe across engines
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("err_value"),
        F.coalesce(F.round("value_click", 6), F.lit(-1.0)).alias(
            "click_value"
        ),
        F.coalesce(
            F.unix_micros("ts") - F.unix_micros("ts_click"),
            F.lit(-1).cast("long"),
        ).alias("gap_us"),
    ).orderBy("event_id")


EV_ASOF_LAST_CLICK_SQL = """
SELECT l.event_id,
       l.user_id,
       ROUND(l.value, 6) AS err_value,
       COALESCE(ROUND(r.value, 6), -1.0) AS click_value,
       COALESCE(CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT), -1) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def ev_range_click_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: count and value-sum of same-user clicks in the
    preceding 10 minutes (range join → aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = bucketed_interval_join(
        errors, clicks, keys=["user_id"], ts_col="ts",
        lookback_seconds=600,
    )
    return (
        pairs.groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            # DECIMAL(18,6) accumulation — cross-engine associative sum
            F.sum(F.col("r_value").cast("decimal(18,6)"))
            .cast("double")
            .alias("click_sum"),
        )
        .orderBy("event_id")
    )


EV_RANGE_CLICK_STATS_SQL = """
SELECT l.event_id,
       COUNT(*) AS n_clicks,
       CAST(SUM(CAST(r.value AS DECIMAL(18,6))) AS DOUBLE) AS click_sum
FROM (SELECT * FROM events WHERE event_type = 'error') l
JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON r.user_id = l.user_id
 AND r.ts > l.ts - INTERVAL 10 MINUTE
 AND r.ts <= l.ts
GROUP BY l.event_id
ORDER BY l.event_id
"""


def ev_range_click_stats_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT variant: every error event appears, zero-click errors with
    n_clicks=0 and a -1 sum sentinel (NULL-free output)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = bucketed_interval_join(
        errors, clicks, keys=["user_id"], ts_col="ts",
        lookback_seconds=600, how="left",
    )
    return (
        pairs.groupBy("event_id")
        .agg(
            F.count("r_ts").alias("n_clicks"),
            F.coalesce(
                F.sum(F.col("r_value").cast("decimal(18,6)")).cast("double"),
                F.lit(-1.0),
            ).alias("click_sum"),
        )
        .orderBy("event_id")
    )


EV_RANGE_CLICK_STATS_LEFT_SQL = """
SELECT l.event_id,
       COUNT(r.ts) AS n_clicks,
       COALESCE(CAST(SUM(CAST(r.value AS DECIMAL(18,6))) AS DOUBLE), -1.0)
           AS click_sum
FROM (SELECT * FROM events WHERE event_type = 'error') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON r.user_id = l.user_id
 AND r.ts > l.ts - INTERVAL 10 MINUTE
 AND r.ts <= l.ts
GROUP BY l.event_id
ORDER BY l.event_id
"""


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click-after-view →
    purchase-after-click within 24 h of first view): the product-analytics
    staple.  Two window passes over one (user_id) shuffle — each event
    row carries the min qualifying prior-stage timestamp, so no
    self-joins and no per-user collect; the oracle states the same
    funnel as min-timestamp joins."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s1 = ev.withColumn(
        "tv",
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).over(w_prev),
    )
    s2 = s1.withColumn(
        "tcav",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("tv").isNotNull()
                & (F.col("ts") > F.col("tv")),
                F.col("ts"),
            )
        ).over(w_prev),
    )
    flags = s2.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("viewed"),
        F.max(
            (
                (F.col("event_type") == "click")
                & F.col("tv").isNotNull()
                & (F.col("ts") > F.col("tv"))
            ).cast("int")
        ).alias("clicked"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & F.col("tcav").isNotNull()
                & (F.col("ts") > F.col("tcav"))
                & (
                    F.col("ts")
                    <= F.col("tv") + F.expr("INTERVAL 24 HOUR")
                )
            ).cast("int")
        ).alias("purchased"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("viewed").alias("n_viewed"),
        F.sum("clicked").alias("n_clicked"),
        F.sum("purchased").alias("n_purchased"),
    )


EV_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
    SELECT user_id, MIN(ts) AS tv
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS tc
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.tv
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id
    FROM events e
    JOIN c ON e.user_id = c.user_id
    JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > c.tc
      AND e.ts <= v.tv + INTERVAL 24 HOUR
    GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM u) AS n_users,
       (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked,
       (SELECT COUNT(*) FROM p) AS n_purchased
"""


def ev_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-deterministic HyperLogLog distinct-user estimate per
    event type, next to the exact count — the sketch registers are
    portable md5 integer math, so the oracle reproduces the *estimate*
    itself, not just its error bound (functions/sketches.py)."""
    from spark_tensors_spark.functions.sketches import hll_estimate

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(ev, "user_id", ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round("hll_estimate", 4).alias("hll_users"),
        )
        .orderBy("event_type")
    )


def _hll_users_oracle() -> str:
    from spark_tensors_spark.functions.sketches import hll_oracle_sql

    hll = hll_oracle_sql(
        "SELECT event_type, user_id FROM events", "user_id", ["event_type"]
    )
    return f"""
SELECT h.event_type,
       x.n_exact,
       ROUND(h.hll_estimate, 4) AS hll_users
FROM ({hll}) h
JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type) x
  ON h.event_type = x.event_type
ORDER BY h.event_type
"""


def ev_hll_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED mergeable-sketch composition: per-hour HLL distinct-user
    estimate beside the exact count.  The register aggregation is the
    same map-side-combinable shape as the global ev_hll_users — at
    100 TB the per-(window, register) partial max is what makes
    distinct-over-time queries one linear pass instead of a
    count-distinct shuffle per window."""
    from spark_tensors_spark.functions.sketches import hll_estimate

    # column named hour_start, NOT "h": the oracle generator's hashed
    # CTE uses h/w internally and a grouping column of the same name
    # would collide
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "user_id"
    )
    est = hll_estimate(ev, "user_id", ["hour_start"])
    exact = ev.groupBy("hour_start").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        est.join(exact, "hour_start")
        .select(
            "hour_start",
            "n_exact",
            F.round("hll_estimate", 4).alias("hll_users"),
        )
        .orderBy("hour_start")
    )


def _hll_users_hourly_oracle() -> str:
    from spark_tensors_spark.functions.sketches import hll_oracle_sql

    src = ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, "
           "user_id FROM events")
    hll = hll_oracle_sql(src, "user_id", ["hour_start"])
    return f"""
SELECT e.hour_start,
       x.n_exact,
       ROUND(e.hll_estimate, 4) AS hll_users
FROM ({hll}) e
JOIN (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
             COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1) x
  ON e.hour_start = x.hour_start
ORDER BY e.hour_start
"""


def ev_hll_rollup_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity sketch REUSE: daily distinct-user estimates
    computed by max-MERGING the hourly HLL register tables — never
    re-scanning the events — which by the register-merge law equals
    building the registers at day granularity directly (what the oracle
    states).  At 100 TB this is the sketch-state pattern: one scan
    produces hourly registers; day / week / month views are register
    folds over sketch-sized state (≤ m rows per group)."""
    from spark_tensors_spark.functions.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "user_id"
    )
    hourly_regs = hll_registers(ev, "user_id", ["hour_start"])
    day_regs = (
        hourly_regs.withColumn(
            "day_start", F.date_trunc("day", F.col("hour_start"))
        )
        .groupBy("day_start", "hll_reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    est = hll_estimate_from_registers(day_regs, ["day_start"])
    exact = ev.groupBy(
        F.date_trunc("day", F.col("hour_start")).alias("day_start")
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        est.join(exact, "day_start")
        .select(
            "day_start",
            "n_exact",
            F.round("hll_estimate", 4).alias("hll_users"),
        )
        .orderBy("day_start")
    )


def _hll_rollup_day_oracle() -> str:
    from spark_tensors_spark.functions.sketches import hll_oracle_sql

    src = (
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, "
        "user_id FROM events"
    )
    hll = hll_oracle_sql(src, "user_id", ["day_start"])
    return f"""
SELECT e.day_start,
       x.n_exact,
       ROUND(e.hll_estimate, 4) AS hll_users
FROM ({hll}) e
JOIN (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
             COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1) x
  ON e.day_start = x.day_start
ORDER BY e.day_start
"""


def ev_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch (functions/sketches.histogram_sketch):
    hourly fixed-bin integer histograms over event value, bin-wise
    SUMMED into daily states — never a re-scan — then p50/p90/p99 read
    out of the merged state (smallest bin reaching the exact integer
    rank ceil(p·N/100)).  This is the quantile the incremental
    count/sum/min/max snapshot family (operators/incremental.py) was
    missing: exact percentiles (q12_percentiles) don't merge, a fixed-
    band histogram does (hist(A∪B) = binwise sum), at ±bin-width
    resolution.  Every count, rank and bin id is an exact integer, so
    the sketch AND its read-out are fully value-oracled; fold parity
    (whole == merge of hourly parts) is pinned in
    tests/test_histogram_sketch.py."""
    from spark_tensors_spark.functions.sketches import (
        histogram_sketch,
        merge_histogram_sketches,
        quantiles_from_histogram,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "value",
    )
    hourly = histogram_sketch(ev, "value", ["day_start", "hour_start"])
    daily = merge_histogram_sketches(hourly, ["day_start"])
    return quantiles_from_histogram(
        daily, ["day_start"], [50, 90, 99]
    ).orderBy("day_start", "p")


_EV_QUANTILE_SKETCH_SQL = """
WITH b AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CAST(least(79, greatest(0,
                CAST(floor((value - 0.0) / 8.0) AS BIGINT)))
                AS BIGINT) AS hist_bin
    FROM events
),
h AS (
    SELECT day_start, hist_bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2
),
c AS (
    SELECT day_start, hist_bin, cnt,
           SUM(cnt) OVER (PARTITION BY day_start
                          ORDER BY hist_bin) AS cum,
           SUM(cnt) OVER (PARTITION BY day_start) AS n
    FROM h
)
SELECT day_start,
       CAST(pp.p AS BIGINT) AS p,
       CAST(n AS BIGINT) AS n_total,
       MIN(hist_bin) AS hist_bin,
       0.0 + (MIN(hist_bin) + 1) * 8.0 AS upper_edge
FROM c CROSS JOIN (SELECT UNNEST([50, 90, 99]) AS p) pp
WHERE cum >= (n * pp.p + 99) // 100
GROUP BY day_start, pp.p, n
ORDER BY day_start, p
"""


def ev_cms_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by count-min-sketch frequency estimate, alongside
    their exact counts (functions/sketches.py count-min).  The sketch is
    bounded at depth×width rows no matter the input size and the point
    queries broadcast it, so the heavy-hitter scan is two linear passes
    with no wide shuffle.  Portable md5 cell hashes make the *estimate*
    itself oracle-checked (CMS never underestimates; equality with the
    exact count whenever no cell collides)."""
    from spark_tensors_spark.functions.sketches import cms_estimate, cms_sketch

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_sketch(ev, "user_id")
    keys = ev.select("user_id").distinct()
    est = cms_estimate(sketch, keys, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        est.join(exact, "user_id")
        .select("user_id", "n_exact", F.col("cms_estimate").alias("cms_est"))
        .orderBy(F.desc("cms_est"), "user_id")
        .limit(20)
    )


def _cms_top_users_oracle() -> str:
    from spark_tensors_spark.functions.sketches import cms_cells_sql

    cells = cms_cells_sql("user_id")
    return f"""
WITH cells AS (
    {cells.format(src="events")}
),
sketch AS (
    SELECT cms_d, cms_col, COUNT(*) AS cnt FROM cells GROUP BY cms_d, cms_col
),
keys AS (SELECT DISTINCT user_id FROM events),
kcells AS (
    {cells.format(src="keys")}
),
est AS (
    SELECT k.val AS user_id, MIN(s.cnt) AS cms_est
    FROM kcells k JOIN sketch s
      ON k.cms_d = s.cms_d AND k.cms_col = s.cms_col
    GROUP BY k.val
),
exact AS (
    SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY user_id
)
SELECT e.user_id, x.n_exact, e.cms_est
FROM est e JOIN exact x ON e.user_id = x.user_id
ORDER BY e.cms_est DESC, e.user_id
LIMIT 20
"""


def ev_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week, counted in each later week they return.  Two shuffles (per-user
    cohort, then cohort×offset counts) — the standard product-analytics
    rollup, linear at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(cohorts, "user_id")
        .groupBy(
            F.col("cohort").cast("date").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


EV_RETENTION_WEEKLY_SQL = """
WITH wk AS (
    SELECT user_id, date_trunc('week', ts) AS wk FROM events
),
cohorts AS (
    SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, wk FROM wk)
SELECT CAST(c.cohort AS DATE) AS cohort_week,
       CAST(date_diff('day', c.cohort, a.wk) / 7 AS INT) AS week_offset,
       COUNT(*) AS n_users
FROM active a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def ev_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering codes over (user_id, hour-of-epoch)
    — the multi-column data-layout operator (`operators/zorder.py`,
    Delta OPTIMIZE ZORDER BY shape).  Pure integer shift/mask codegen;
    per coarse z-bucket (z >> 12, a 64×64 tile): row count and exact min/max/sum of
    the codes.  File-skipping benefit of the layout itself is pinned by
    tests/test_zorder.py (point queries intersect ~1 of 8 files after
    layout vs all 8 before)."""
    from spark_tensors_spark.operators.zorder import zvalue_col

    ev = load_table(spark, sf_dir, "events")
    z = zvalue_col(
        F.col("user_id") % 65536,
        F.expr("unix_micros(ts) div 3600000000") % 65536,
    )
    return (
        ev.select(z.alias("z"))
        .groupBy(F.shiftright(F.col("z"), 12).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
            F.sum("z").cast("long").alias("z_sum"),
        )
        .orderBy("zbucket")
    )


def _zorder_stats_oracle() -> str:
    from spark_tensors_spark.operators.zorder import zvalue_sql

    return f"""
        WITH b AS (
            SELECT (user_id % 65536) AS ux,
                   ((epoch_us(ts) // 3600000000) % 65536) AS hx
            FROM events
        ),
        zt AS (SELECT ({zvalue_sql("ux", "hx")}) AS z FROM b)
        SELECT CAST(z >> 12 AS BIGINT) AS zbucket,
               COUNT(*) AS n_events,
               CAST(MIN(z) AS BIGINT) AS min_z,
               CAST(MAX(z) AS BIGINT) AS max_z,
               CAST(SUM(z) AS BIGINT) AS z_sum
        FROM zt GROUP BY zbucket ORDER BY zbucket
    """


def ev_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (`operators/temporal.ewma`): one
    ordered bounded-rows window + a codegen left fold; α = ½ makes
    every fold step an exact power-of-two scaling, so the oracle's
    list_reduce reproduces the doubles bit-for-bit (output unrounded —
    see the operator docstring for why ROUND would break ties)."""
    from spark_tensors_spark.operators.temporal import ewma

    ev = load_table(spark, sf_dir, "events")
    out = ewma(
        ev, ["user_id"], ts_col="ts", value_col="value",
        order_tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "ewma").orderBy("event_id")


EV_EWMA_VALUE_SQL = """
WITH l AS (
    SELECT event_id, user_id,
           list(CAST(value AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lv
    FROM events
)
SELECT event_id, user_id,
       list_reduce(list_prepend(CAST(0 AS DOUBLE), lv),
             (acc, x) -> acc * CAST(0.5 AS DOUBLE)
                       + x * CAST(0.5 AS DOUBLE)) AS ewma
FROM l ORDER BY event_id
"""


def ev_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the events table
    (`operators/profile.py`): null/distinct counts + typed min/max per
    column in a single scan-side aggregate.  Uses ``exact=True`` (the
    default) so DuckDB can state the distinct counts; the 100 TB path
    opts into ``exact=False`` / ``approx_count_distinct`` (no Expand
    replication — see SCALE.md and the plan pin in
    tests/test_profile.py)."""
    from spark_tensors_spark.operators.profile import profile

    ev = load_table(spark, sf_dir, "events")
    return profile(
        ev, ["event_id", "ts", "user_id", "event_type", "value"],
        exact=True,
    ).orderBy("col")


EV_PROFILE_COLUMNS_SQL = """
SELECT 'event_id' AS col, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
       COUNT(DISTINCT event_id) AS n_distinct,
       CAST(MIN(event_id) AS DOUBLE) AS min_num,
       CAST(MAX(event_id) AS DOUBLE) AS max_num,
       '' AS min_str, '' AS max_str
FROM events
UNION ALL
SELECT 'ts', COUNT(*),
       CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT ts),
       CAST(epoch_us(MIN(ts)) AS DOUBLE), CAST(epoch_us(MAX(ts)) AS DOUBLE),
       '', ''
FROM events
UNION ALL
SELECT 'user_id', COUNT(*),
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT user_id),
       CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
       '', ''
FROM events
UNION ALL
SELECT 'event_type', COUNT(*),
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT event_type),
       CAST(-1 AS DOUBLE), CAST(-1 AS DOUBLE),
       MIN(event_type), MAX(event_type)
FROM events
UNION ALL
SELECT 'value', COUNT(*),
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT value),
       MIN(value), MAX(value), '', ''
FROM events
ORDER BY col
"""


def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level session labeling (`operators/temporal.sessionize`,
    5-minute gap) rolled up per (user, session): length, span, value
    sum — the per-session feature table a training pipeline joins
    back to events.  Session boundaries agree with ev_session_5m's
    session_window by construction (same gap rule; pinned in
    tests/test_temporal_queries.py)."""
    from spark_tensors_spark.operators.temporal import sessionize

    ev = load_table(spark, sf_dir, "events")
    lab = sessionize(
        ev, ["user_id"], gap_seconds=300, order_tiebreak="event_id"
    )
    return (
        lab.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .alias("span_us"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v_sum"),
        )
        .orderBy("user_id", "session_idx")
    )


EV_SESSIONIZE_SQL = """
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                     > 300 * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
labeled AS (
    SELECT user_id, event_id, ts, value,
           CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_idx
    FROM flagged
)
SELECT user_id, session_idx,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_us,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v_sum
FROM labeled
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def ev_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling + forward fill
    (`operators/temporal.resample_ffill`): hourly grid per sampled user
    (user_id % 25 = 0 keeps the grid bounded: span/step rows per key),
    last-observation-per-bucket via max_by on (ts, value), gaps filled
    by a last(ignoreNulls) running window.  Values are CARRIED, never
    aggregated, so the oracle is exact without any float doctrine; the
    DuckDB side mirrors the bucket floor-division, the (ts, value)
    lexicographic tie-break (row_number) and last_value IGNORE NULLS."""
    from spark_tensors_spark.operators.temporal import resample_ffill

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 25 == 0
    )
    return resample_ffill(ev, ["user_id"], step_seconds=3600).orderBy(
        "user_id", "bucket_ts"
    )


EV_RESAMPLE_FFILL_SQL = """
WITH obs AS (
    SELECT user_id,
           (epoch_us(ts) // 1000000) // 3600 * 3600 AS b,
           ts, value
    FROM events WHERE user_id % 25 = 0
),
per_bucket AS (
    SELECT user_id, b, value AS v FROM (
        SELECT user_id, b, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, b
                                  ORDER BY ts DESC, value DESC) AS rn
        FROM obs) WHERE rn = 1
),
span AS (
    SELECT user_id, MIN(b) AS lo, MAX(b) AS hi FROM obs GROUP BY user_id
),
grid AS (
    SELECT user_id, UNNEST(range(lo, hi + 3600, 3600)) AS b FROM span
),
filled AS (
    SELECT g.user_id, g.b,
           last_value(p.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
    FROM grid g LEFT JOIN per_bucket p
      ON p.user_id = g.user_id AND p.b = g.b
)
SELECT user_id,
       make_timestamp(CAST(b * 1000000 AS BIGINT)) AS bucket_ts, v
FROM filled ORDER BY user_id, bucket_ts
"""


def ev_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the standard time-series bar aggregation:
    per (user, hour) the OPEN (earliest value, (ts, event_id)
    tie-break), HIGH/LOW (max/min), CLOSE (latest value) in ONE hash
    aggregate (min_by/max_by on a struct key — no self-joins, no
    window over the raw stream).  Values are carried or min/maxed,
    never summed, so the oracle is exact without any float doctrine
    (DuckDB mirrors the tie-break with row_number windows).  Sampled
    to user_id % 25 = 0 to bound the declared output."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 25 == 0
    )
    key = F.struct("ts", "event_id")
    return (
        ev.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_start")
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "hour_start")
    )


EV_OHLC_HOURLY_SQL = """
WITH ev AS (
    SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           ts, event_id, value
    FROM events WHERE user_id % 25 = 0
),
ranked AS (
    SELECT user_id, hour_start, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, hour_start
                              ORDER BY ts, event_id) AS rn_open,
           ROW_NUMBER() OVER (PARTITION BY user_id, hour_start
                              ORDER BY ts DESC, event_id DESC) AS rn_close
    FROM ev
)
SELECT user_id, hour_start,
       MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM ranked
GROUP BY user_id, hour_start
ORDER BY user_id, hour_start
"""


def ev_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality validation (`operators/quality.py`):
    five rules (null checks, a value range, a regex shape, key
    uniqueness) compiled into ONE scan-side wide aggregate — the
    Deequ-style expectations pass.  All counts integer-exact; the
    regex stays in the Java/RE2 common subset (scrub doctrine)."""
    from spark_tensors_spark.operators import quality as Q

    ev = load_table(spark, sf_dir, "events")
    rules = [
        Q.not_null("event_type"),
        Q.not_null("user_id"),
        Q.in_range("value", 0.0, 75.0),
        Q.matches("event_type", "[a-z_]+"),
        Q.unique("event_id"),
    ]
    return Q.validate(ev, rules).orderBy("rule", "column")


EV_DQ_VIOLATIONS_SQL = """
SELECT * FROM (
    SELECT 'not_null' AS rule, 'event_type' AS "column",
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
           COUNT(*) AS n_rows
    FROM events
    UNION ALL
    SELECT 'not_null', 'user_id',
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           COUNT(*)
    FROM events
    UNION ALL
    SELECT 'in_range', 'value',
           CAST(SUM(CASE WHEN value IS NOT NULL
                          AND (value < 0.0 OR value > 75.0)
                     THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(*)
    FROM events
    UNION ALL
    SELECT 'matches', 'event_type',
           CAST(SUM(CASE WHEN event_type IS NOT NULL
                          AND NOT regexp_full_match(event_type,
                                                    '[a-z_]+')
                     THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(*)
    FROM events
    UNION ALL
    SELECT 'unique', 'event_id',
           CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS BIGINT),
           COUNT(*)
    FROM events
)
ORDER BY rule, "column"
"""


def ev_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each (sampled) user's event_type state
    (`operators/scd2.history_table`): consecutive equal states collapse
    into validity ranges chained half-open, −1 open-end sentinel.  Two
    fused ordered windows, pure codegen — restated exactly by the
    oracle."""
    from spark_tensors_spark.operators.scd2 import history_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 5 == 0
    )
    return history_table(
        ev, ["user_id"], ["event_type"],
        ts_col="ts", order_tiebreak="event_id",
    ).orderBy("user_id", "valid_from_us", "event_type")


EV_SCD2_USER_STATE_SQL = """
WITH src AS (
    SELECT user_id, event_id, event_type, ts
    FROM events WHERE user_id % 5 = 0
),
flagged AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM src
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (SELECT * FROM flagged WHERE chg = 1)
SELECT user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(COALESCE(LEAD(epoch_us(ts)) OVER w2, -1) AS BIGINT)
           AS valid_to_us,
       LEAD(epoch_us(ts)) OVER w2 IS NULL AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from_us, event_type
"""


def ev_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (`operators/scd2.point_in_time_join`): each
    purchase event of the sampled users looks up the user's lifecycle
    state (SCD2 history over signup/error events) valid AT the
    purchase timestamp — the "state as of event time" query SCD2
    tables exist for.  Purchases before the first state version
    surface sentinel 'none'/−1 (left join, no NULL output).  Equi-join
    on user_id with the validity range as a join filter — never a
    cross product; versions are disjoint half-open ranges, so no
    dedup.  Pure integer/string codegen, restated exactly by the
    oracle."""
    from spark_tensors_spark.operators.scd2 import (
        history_table,
        point_in_time_join,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 5 == 0
    )
    dim_src = ev.filter(F.col("event_type").isin("signup", "error"))
    hist = history_table(
        dim_src, ["user_id"], ["event_type"],
        ts_col="ts", order_tiebreak="event_id",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    out = point_in_time_join(facts, hist, ["user_id"], ts_col="ts")
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.coalesce(F.col("dim_event_type"), F.lit("none")).alias(
            "state_at_purchase"
        ),
        F.coalesce(F.col("dim_valid_from_us"), F.lit(-1))
        .cast("long")
        .alias("state_since_us"),
    ).orderBy("user_id", "event_id")


EV_SCD2_PIT_JOIN_SQL = """
WITH src AS (
    SELECT user_id, event_id, event_type, ts
    FROM events WHERE user_id % 5 = 0
),
dim_src AS (
    SELECT * FROM src WHERE event_type IN ('signup', 'error')
),
flagged AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM dim_src
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
hist AS (
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(COALESCE(LEAD(epoch_us(ts)) OVER w2, -1) AS BIGINT)
               AS valid_to_us
    FROM (SELECT * FROM flagged WHERE chg = 1)
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
facts AS (
    SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM src WHERE event_type = 'purchase'
)
SELECT f.user_id AS user_id, f.event_id AS event_id, f.ts_us AS ts_us,
       COALESCE(h.event_type, 'none') AS state_at_purchase,
       CAST(COALESCE(h.valid_from_us, -1) AS BIGINT) AS state_since_us
FROM facts f
LEFT JOIN hist h
  ON h.user_id = f.user_id
 AND h.valid_from_us <= f.ts_us
 AND (h.valid_to_us = -1 OR f.ts_us < h.valid_to_us)
ORDER BY user_id, event_id
"""


def ev_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE (`operators/merge.merge_upsert`): the per-user FIRST
    event state table merged with an update batch of each active
    user's LAST January-16+ event — matched keys replace, new keys
    insert (one left-anti + union, the format-less merge plan).  All
    values carried; the oracle restates the anti-join + union
    verbatim."""
    from pyspark.sql.window import Window

    from spark_tensors_spark.operators.merge import merge_upsert

    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy(
        "ts", "event_id"
    )
    target = (
        ev.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    late = ev.filter(F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    updates = (
        late.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    return merge_upsert(target, updates, ["user_id"]).orderBy("user_id")


def ev_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletion vectors (`operators/mor.py` — the
    Iceberg-v2/Delta-DV idea, key-based): a base snapshot takes a
    DELETE (event_id%5==0) and then an UPSERT (event_id%11==0,
    value+1000) as two DELTA-ONLY commits — each write O(|batch|),
    never an O(|table|) snapshot rewrite like the copy-on-write merge
    — and the read reconciles base + deltas with highest-sequence-wins
    (the later upsert REVIVES the %55 keys the delete killed, which is
    the ordering semantics the oracle states)."""
    import os
    import shutil

    from spark_tensors_spark.operators.mor import (
        init_mor,
        mor_delete,
        mor_upsert,
        read_mor,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"mor_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    try:
        base = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") % 7 == 2)
            .select("event_id", "user_id", "value")
        )
        init_mor(base, root)
        mor_delete(
            base.filter(F.col("event_id") % 5 == 0), root, ["event_id"]
        )
        mor_upsert(
            base.filter(F.col("event_id") % 11 == 0).withColumn(
                "value", F.col("value") + 1000
            ),
            root,
            ["event_id"],
        )
        out = (
            read_mor(spark, root, ["event_id"])
            .orderBy("event_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


EV_MOR_DELETE_SQL = """
WITH src AS (
    SELECT event_id, user_id, value
    FROM events WHERE user_id % 7 = 2
)
SELECT event_id, user_id,
       CASE WHEN event_id % 11 = 0 THEN value + 1000 ELSE value END AS value
FROM src
WHERE event_id % 11 = 0 OR event_id % 5 <> 0
ORDER BY event_id
"""


EV_MERGE_UPSERT_SQL = """
WITH target AS (
    SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (SELECT user_id, event_type, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1
),
updates AS (
    SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (SELECT user_id, event_type, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC)
                     AS rn
          FROM events WHERE ts >= TIMESTAMP '2024-01-16') WHERE rn = 1
)
SELECT * FROM (
    SELECT t.* FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM updates u
                      WHERE u.user_id = t.user_id)
    UNION ALL
    SELECT * FROM updates
)
ORDER BY user_id
"""


def ev_merge_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the snapshot-versioned merge table
    (`operators/merge`): two CDC batches commit as immutable snapshots
    `_v=0` and `_v=1`; the query reads BOTH versions back
    (`read_merged(version=...)`) and unions them under a `version`
    column — the "what did this table say yesterday" audit read that
    snapshot versioning exists to answer.  The oracle restates each
    version's state independently (v0 = first event per sampled user,
    v1 = that state merged with each user's last January-16+ event)."""
    import os
    import shutil

    from pyspark.sql.window import Window

    from spark_tensors_spark.operators.merge import (
        merge_into_parquet,
        read_merged,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"time_travel_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    table = os.path.join(root, "table")
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b1 = (
        ev.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    late = ev.filter(
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp")
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    b2 = (
        late.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    merge_into_parquet(spark, table, b1, ["user_id"], order_col="ts_us")
    merge_into_parquet(spark, table, b2, ["user_id"], order_col="ts_us")
    v0 = read_merged(spark, table, version=0).withColumn(
        "version", F.lit(0).cast("long")
    )
    v1 = read_merged(spark, table).withColumn(
        "version", F.lit(1).cast("long")
    )
    out = (
        v0.unionByName(v1)
        .select("version", "user_id", "event_type", "ts_us")
        .orderBy("version", "user_id")
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


EV_MERGE_TIME_TRAVEL_SQL = """
WITH src AS (
    SELECT user_id, event_id, event_type, ts FROM events
    WHERE user_id % 7 = 0
),
v0 AS (
    SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (SELECT user_id, event_type, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM src) WHERE rn = 1
),
b2 AS (
    SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (SELECT user_id, event_type, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC)
                     AS rn
          FROM src WHERE ts >= TIMESTAMP '2024-01-16') WHERE rn = 1
),
v1 AS (
    SELECT * FROM b2
    UNION ALL
    SELECT t.* FROM v0 t
    WHERE NOT EXISTS (SELECT 1 FROM b2 u WHERE u.user_id = t.user_id)
)
SELECT CAST(0 AS BIGINT) AS version, user_id, event_type, ts_us FROM v0
UNION ALL
SELECT CAST(1 AS BIGINT) AS version, user_id, event_type, ts_us FROM v1
ORDER BY version, user_id
"""


def ev_merge_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot DIFF (`operators/merge.table_diff`): what changed
    between table version 0 and version 1 — one full-outer equi-join
    with null-safe value comparison, the audit companion of time
    travel.  Here every change is an 'update' (the CDC batch replaces
    each active user's state); inserts/deletes are pinned in unit
    tests.  Built from the same two in-memory states the versioned
    table would hold, so the oracle is pure SQL."""
    from pyspark.sql.window import Window

    from spark_tensors_spark.operators.merge import (
        merge_upsert,
        table_diff,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v0 = (
        ev.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    late = ev.filter(
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp")
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    b2 = (
        late.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )
    v1 = merge_upsert(v0, b2, ["user_id"])
    return table_diff(v0, v1, ["user_id"]).orderBy("user_id")


EV_MERGE_DIFF_SQL = """
WITH src AS (
    SELECT user_id, event_id, event_type, ts FROM events
    WHERE user_id % 7 = 0
),
v0 AS (
    SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (SELECT user_id, event_type, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM src) WHERE rn = 1
),
b2 AS (
    SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (SELECT user_id, event_type, ts,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC)
                     AS rn
          FROM src WHERE ts >= TIMESTAMP '2024-01-16') WHERE rn = 1
),
v1 AS (
    SELECT * FROM b2
    UNION ALL
    SELECT t.* FROM v0 t
    WHERE NOT EXISTS (SELECT 1 FROM b2 u WHERE u.user_id = t.user_id)
)
SELECT 'update' AS change, o.user_id AS user_id,
       o.event_type AS old_event_type, o.ts_us AS old_ts_us,
       n.event_type AS new_event_type, n.ts_us AS new_ts_us
FROM v0 o JOIN v1 n ON n.user_id = o.user_id
WHERE o.event_type <> n.event_type OR o.ts_us <> n.ts_us
ORDER BY user_id
"""


def ev_incremental_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (`operators/incremental.merge_agg_snapshot`): the hourly
    (hour, event_type) count/sum/min/max view is built by folding TWO
    time-split batches into a partial-aggregate snapshot — one
    aggregate per batch plus a key-sized full-outer merge, zero
    history rescans — and must equal the direct aggregate over all
    data, which is exactly what the oracle states.  Sums accumulate in
    DECIMAL on both engines (exact, mergeable); min/max carry raw
    parquet doubles."""
    from spark_tensors_spark.operators.incremental import (
        merge_agg_snapshot,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v6"),
        "value",
        "ts",
    )
    split = F.lit("2024-01-16").cast("timestamp")
    aggs = {
        "n": ("count", "value"),
        "v_sum6": ("sum", "v6"),
        "v_min": ("min", "value"),
        "v_max": ("max", "value"),
    }
    keys = ["hour", "event_type"]
    snap = merge_agg_snapshot(
        None, ev.filter(F.col("ts") < split), keys, aggs
    )
    snap = merge_agg_snapshot(
        snap, ev.filter(F.col("ts") >= split), keys, aggs
    )
    return snap.select(
        "hour",
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("v_sum6").cast("double").alias("v_sum"),
        "v_min",
        "v_max",
    ).orderBy("hour", "event_type")


EV_INCREMENTAL_HOURLY_SQL = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v_sum,
       MIN(value) AS v_min,
       MAX(value) AS v_max
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly detection
    (`operators/quality.zscore_outliers`): events more than 3σ from
    their user's mean.  Moments accumulate in DECIMAL (exact,
    associative), every following step is a fixed double-op tree on
    identical inputs — the UNROUNDED z hash-matches the oracle."""
    from spark_tensors_spark.operators.quality import zscore_outliers

    ev = load_table(spark, sf_dir, "events")
    return (
        zscore_outliers(ev, ["user_id"], threshold=3.0)
        .select("user_id", "event_id", "value", "z")
        .orderBy("user_id", "event_id")
    )


EV_ANOMALY_ZSCORE_SQL = """
WITH s AS (
    SELECT user_id, COUNT(value) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(value * value AS DECIMAL(27,12))) AS DOUBLE)
               AS s2
    FROM events GROUP BY user_id
),
st AS (
    SELECT user_id,
           s1 / n AS mu,
           SQRT(GREATEST(s2 / n - (s1 / n) * (s1 / n),
                         CAST(0.0 AS DOUBLE))) AS sigma
    FROM s
)
SELECT e.user_id, e.event_id, e.value,
       (e.value - st.mu) / st.sigma AS z
FROM events e JOIN st ON st.user_id = e.user_id
WHERE st.sigma > 0
  AND ABS((e.value - st.mu) / st.sigma) > CAST(3.0 AS DOUBLE)
ORDER BY e.user_id, e.event_id
"""


# ------------------------------------------------------------------ KMV

# user-day string: "<user_id>:<YYYY-MM-DD>" — identical text on both
# engines (BIGINT→string has no sign/zero edge, DATE casts are ISO)
_KMV_SRC_SQL = (
    "SELECT event_type, CAST(user_id AS VARCHAR) || ':' || "
    "CAST(CAST(ts AS DATE) AS VARCHAR) AS user_day FROM events"
)


def _kmv_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        F.concat_ws(
            ":", F.col("user_id"), F.to_date("ts").cast("string")
        ).alias("user_day"),
    )


def ev_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct user-day estimate per event type, beside
    the exact count — like ev_hll_users but with the sketch family that
    also supports set algebra (see ev_kmv_user_overlap).  The signature
    is the k smallest md5-derived 60-bit hashes: portable integer math,
    so the oracle reproduces the estimate itself (exact numerator
    63·2^60 is a 6-bit-mantissa double; one IEEE division; shipped
    unrounded — the driver's normalize rounds both engines alike)."""
    from spark_tensors_spark.functions.sketches import (
        kmv_estimate_from_signature,
        kmv_signature,
    )

    src = _kmv_user_days(spark, sf_dir)
    sig = kmv_signature(src, F.col("user_day"), ["event_type"])
    est = kmv_estimate_from_signature(sig, ["event_type"])
    exact = src.groupBy("event_type").agg(
        F.countDistinct("user_day").alias("n_exact")
    )
    return (
        est.join(exact, "event_type")
        .select("event_type", "n_exact", "kmv_estimate")
        .orderBy("event_type")
    )


def _kmv_distinct_oracle() -> str:
    from spark_tensors_spark.functions.sketches import (
        KMV_K,
        KMV_SPACE,
        kmv_signature_sql,
    )

    sig = kmv_signature_sql(_KMV_SRC_SQL, "user_day", ["event_type"])
    return f"""
WITH sig AS ({sig}),
est AS (
    SELECT event_type, COUNT(*) AS kmv_n, MAX(kmv_h) AS kmv_kth
    FROM sig GROUP BY event_type
)
SELECT e.event_type,
       x.n_exact,
       CASE WHEN e.kmv_n < {KMV_K}
            THEN CAST(e.kmv_n AS DOUBLE)
            ELSE {float((KMV_K - 1) * KMV_SPACE)} /
                 CAST(e.kmv_kth AS DOUBLE)
       END AS kmv_estimate
FROM est e
JOIN (SELECT event_type, COUNT(DISTINCT user_day) AS n_exact
      FROM ({_KMV_SRC_SQL}) GROUP BY event_type) x
  ON e.event_type = x.event_type
ORDER BY e.event_type
"""


def ev_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on KMV signatures — the thing an HLL cannot do: for
    every pair of event types, estimate |A∪B|, Jaccard, and |A∩B| of
    their distinct user-day sets FROM THE SKETCHES ALONE (k smallest of
    sig_A ∪ sig_B is exactly the signature of A∪B; the in-both fraction
    of that merged signature estimates Jaccard — Beyer et al. 2007),
    beside the exact values for verification.

    Float doctrine: inter/n_s has a 2^6 denominator when saturated
    (exact dyadic), the union estimate is one IEEE division of exact
    ints, the intersection estimate one product — all shipped unrounded;
    every value is ≥ 0 so no sign-of-zero exposure.

    Scale shape: signatures are ≤ k rows per type (the salted two-phase
    in kmv_signature bounds every sort), the pair frame is |types|²
    rows, and everything after the sketch is sketch-sized — the 100 TB
    scan cost is ONE distinct + partial top-k, not a per-pair scan."""
    from spark_tensors_spark.functions.sketches import KMV_K, KMV_SPACE, kmv_signature

    src = _kmv_user_days(spark, sf_dir)
    # sketch-sized (≤ k rows per type) but consumed three times (type
    # domain + both tag sides); without a barrier each consumer re-runs
    # the salted distinct+top-k signature build over the events scan
    sig = kmv_signature(src, F.col("user_day"), ["event_type"]).localCheckpoint()

    types = sig.select("event_type").distinct()
    # unordered type pairs a < b: a broadcast nested-loop over the
    # |event_types|-row frame (allowlisted in test_plan_hygiene — both
    # sides are bounded by the categorical domain, not the data volume)
    pairs = types.select(F.col("event_type").alias("type_a")).join(
        F.broadcast(types.select(F.col("event_type").alias("type_b"))),
        F.col("type_a") < F.col("type_b"),
    )

    tag_a = pairs.join(
        sig.select(F.col("event_type").alias("type_a"), "kmv_h"), "type_a"
    ).select("type_a", "type_b", "kmv_h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    tag_b = pairs.join(
        sig.select(F.col("event_type").alias("type_b"), "kmv_h"), "type_b"
    ).select("type_a", "type_b", "kmv_h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    tagged = (
        tag_a.unionByName(tag_b)
        .groupBy("type_a", "type_b", "kmv_h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("type_a", "type_b").orderBy("kmv_h")
    merged = tagged.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= KMV_K
    )
    mstats = merged.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.max("kmv_h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_cnt"),
    )

    # exact side, for verification next to the estimates; materialized
    # once — the per-type counts and both sides of the intersection
    # self-join otherwise each re-run the distinct over the events scan
    ud = src.distinct().localCheckpoint()
    per_type = ud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    inter_exact = (
        ud.select(F.col("event_type").alias("type_a"), "user_day")
        .join(ud.select(F.col("event_type").alias("type_b"), "user_day"), "user_day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("inter_exact"))
    )
    exact = (
        pairs.join(per_type.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")), "type_a")
        .join(per_type.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")), "type_b")
        .join(inter_exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("inter_exact", F.lit(0)).alias("inter_exact"),
            (F.col("n_a") + F.col("n_b") - F.coalesce("inter_exact", F.lit(0))).alias("union_exact"),
        )
    )

    union_est = F.when(
        F.col("n_s") < KMV_K, F.col("n_s").cast("double")
    ).otherwise(F.lit(float((KMV_K - 1) * KMV_SPACE)) / F.col("kth").cast("double"))
    jacc_est = F.col("inter_cnt") / F.col("n_s")
    return (
        mstats.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "inter_exact",
            "union_exact",
            (F.col("inter_exact") / F.col("union_exact")).alias("jaccard_exact"),
            union_est.alias("kmv_union_est"),
            jacc_est.alias("kmv_jaccard_est"),
            (jacc_est * union_est).alias("kmv_inter_est"),
        )
        .orderBy("type_a", "type_b")
    )


def _kmv_overlap_oracle() -> str:
    from spark_tensors_spark.functions.sketches import (
        KMV_K,
        KMV_SPACE,
        kmv_signature_sql,
    )

    sig = kmv_signature_sql(_KMV_SRC_SQL, "user_day", ["event_type"])
    num = float((KMV_K - 1) * KMV_SPACE)
    return f"""
WITH sig AS ({sig}),
types AS (SELECT DISTINCT event_type FROM sig),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b
    FROM types a JOIN types b ON a.event_type < b.event_type
),
tagged AS (
    SELECT p.type_a, p.type_b, s.kmv_h,
           MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
           MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
    FROM pairs p
    JOIN sig s ON s.event_type = p.type_a OR s.event_type = p.type_b
    GROUP BY 1, 2, 3
),
merged AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY kmv_h)
               AS rn
    FROM tagged QUALIFY rn <= {KMV_K}
),
mstats AS (
    SELECT type_a, type_b, COUNT(*) AS n_s, MAX(kmv_h) AS kth,
           SUM(in_a * in_b) AS inter_cnt
    FROM merged GROUP BY 1, 2
),
ud AS (SELECT DISTINCT event_type, user_day FROM ({_KMV_SRC_SQL})),
per_type AS (SELECT event_type, COUNT(*) AS n_t FROM ud GROUP BY 1),
inter_e AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS inter_exact
    FROM ud a JOIN ud b
      ON a.user_day = b.user_day AND a.event_type < b.event_type
    GROUP BY 1, 2
),
exact AS (
    SELECT p.type_a, p.type_b,
           COALESCE(i.inter_exact, 0) AS inter_exact,
           ta.n_t + tb.n_t - COALESCE(i.inter_exact, 0) AS union_exact
    FROM pairs p
    JOIN per_type ta ON ta.event_type = p.type_a
    JOIN per_type tb ON tb.event_type = p.type_b
    LEFT JOIN inter_e i ON i.type_a = p.type_a AND i.type_b = p.type_b
)
SELECT m.type_a, m.type_b,
       CAST(e.inter_exact AS BIGINT) AS inter_exact,
       CAST(e.union_exact AS BIGINT) AS union_exact,
       CAST(e.inter_exact AS DOUBLE) / e.union_exact AS jaccard_exact,
       CASE WHEN m.n_s < {KMV_K} THEN CAST(m.n_s AS DOUBLE)
            ELSE {num} / CAST(m.kth AS DOUBLE) END AS kmv_union_est,
       CAST(m.inter_cnt AS DOUBLE) / m.n_s AS kmv_jaccard_est,
       (CAST(m.inter_cnt AS DOUBLE) / m.n_s) *
       (CASE WHEN m.n_s < {KMV_K} THEN CAST(m.n_s AS DOUBLE)
             ELSE {num} / CAST(m.kth AS DOUBLE) END) AS kmv_inter_est
FROM mstats m
JOIN exact e ON e.type_a = m.type_a AND e.type_b = m.type_b
ORDER BY m.type_a, m.type_b
"""


def ev_skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment event rollup through the differentiated
    hot/cold join (`operators/skew.hot_cold_split_join`): users whose
    event count exceeds 1.5× the per-user mean join against a BROADCAST
    of their customer rows (their fact rows never shuffle), everyone
    else takes the normal shuffle join.  The union is exactly
    events ⋈ customer, so the oracle is the PLAIN join — result-equal
    by construction, physically skew-proof.  All outputs integer
    (count / distinct / mod-997 checksum): no float exposure."""
    from spark_tensors_spark.operators.skew import hot_cold_split_join

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = hot_cold_split_join(ev, cust, "c_custkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("c_custkey").alias("n_users"),
            F.sum(F.col("event_id") % 997).cast("bigint").alias("checksum"),
        )
        .orderBy("c_mktsegment")
    )


EV_SKEW_SPLIT_JOIN_SQL = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(e.event_id % 997) AS BIGINT) AS checksum
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1
ORDER BY 1
"""


def ev_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance
    (`operators/incremental.delta_join_increment`): the same-day
    click×purchase pair view is maintained over TWO time-split
    append batches — J' = J ∪ ΔC⋈P_old ∪ C_old⋈ΔP ∪ ΔC⋈ΔP, the classic
    delta-join rule, delta-sized on at least one side of every term —
    and must equal the direct join over all data, which is exactly what
    the oracle states (ev_incremental_hourly's doctrine lifted from
    aggregates to joins).  Integer outputs only."""
    from spark_tensors_spark.operators.incremental import (
        delta_join_increment,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.to_date("ts").alias("day"),
    )
    split = F.lit("2024-01-16").cast("timestamp")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "day", F.col("event_id").alias("click_id"), "ts"
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "day", F.col("event_id").alias("purchase_id"), "ts"
    )
    on = ["user_id", "day"]
    c1 = clicks.filter(F.col("ts") < split).drop("ts")
    dc = clicks.filter(F.col("ts") >= split).drop("ts")
    p1 = purch.filter(F.col("ts") < split).drop("ts")
    dp = purch.filter(F.col("ts") >= split).drop("ts")
    view = c1.join(p1, on).unionByName(
        delta_join_increment(c1, p1, dc, dp, on)
    )
    return (
        view.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("click_id") + F.col("purchase_id")) % 997)
            .cast("bigint")
            .alias("pair_checksum"),
        )
        .orderBy("user_id")
    )


EV_DELTA_JOIN_SQL = """
SELECT c.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM((c.event_id + p.event_id) % 997) AS BIGINT)
           AS pair_checksum
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND CAST(p.ts AS DATE) = CAST(c.ts AS DATE)
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
GROUP BY 1
ORDER BY 1
"""


def ev_missing_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series completeness audit: per user, how many hour buckets
    inside their own active span [first hour, last hour] carry no
    events.  Pure integer arithmetic — expected = span-hours + 1 from
    the hour-truncated epoch difference, observed = distinct hours —
    so no calendar generation or explode is needed: ONE aggregate per
    user at any scale (the generate_series approach would materialize
    span-sized rows per key).  Users with gaps sort first."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "(unix_timestamp(max(h)) - unix_timestamp(min(h))) div 3600"
            ).alias("_span"),
            F.countDistinct("h").alias("n_observed"),
        )
        .select(
            "user_id",
            (F.col("_span") + 1).alias("n_expected"),
            "n_observed",
            (F.col("_span") + 1 - F.col("n_observed")).alias("n_missing"),
        )
        .orderBy(F.col("n_missing").desc(), "user_id")
    )


EV_MISSING_HOURS_SQL = """
WITH h AS (
    SELECT user_id, date_trunc('hour', ts) AS h FROM events
),
agg AS (
    SELECT user_id,
           date_diff('hour', MIN(h), MAX(h)) AS span,
           COUNT(DISTINCT h) AS n_observed
    FROM h GROUP BY user_id
)
SELECT user_id,
       CAST(span + 1 AS BIGINT) AS n_expected,
       CAST(n_observed AS BIGINT) AS n_observed,
       CAST(span + 1 - n_observed AS BIGINT) AS n_missing
FROM agg
ORDER BY n_missing DESC, user_id
"""


def ev_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish end to end (`operators/wap.py`): batch 1
    publishes under a passing audit, batch 2 is REJECTED by a poison
    rule (value must equal 5.0 — violated by almost every row) leaving
    readers on the old version, then the same batch publishes under
    the real rules.  The output row mixes MEASURED protocol facts
    (version count from the directory listing, publish/reject tallies,
    the rejected audit's violation count) with final-table aggregates;
    the oracle states the expected protocol outcome — if WAP ever let
    the poison batch through, n_versions/checksum would diverge."""
    import os
    import shutil

    from spark_tensors_spark.operators import wap
    from spark_tensors_spark.operators.merge import _versions, read_merged
    from spark_tensors_spark.operators.quality import in_range, not_null

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"wap_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    split = F.lit("2024-01-16").cast("timestamp")
    b1 = ev.filter(F.col("ts") < split).drop("ts")
    b2 = ev.filter(F.col("ts") >= split).drop("ts")
    clean_rules = [not_null("event_id"), not_null("user_id")]
    poison_rules = [in_range("value", 5.0, 5.0)]
    ok1, _v1, _ = wap.write_audit_publish(
        spark, root, b1, ["event_id"], clean_rules
    )
    ok2, _v2, audit2 = wap.write_audit_publish(
        spark, root, b2, ["event_id"], poison_rules
    )
    ok3, _v3, _ = wap.write_audit_publish(
        spark, root, b2, ["event_id"], clean_rules
    )
    poison_viol = next(
        int(r.n_violations) for r in audit2 if r.rule == "in_range"
    )
    n_versions = len(_versions(root))
    final = read_merged(spark, root)
    out = final.agg(
        F.count(F.lit(1)).alias("n_rows_final"),
        F.sum(F.col("event_id") % 997).cast("bigint").alias("checksum"),
        F.lit(n_versions).cast("long").alias("n_versions"),
        F.lit(int(ok1) + int(ok3)).cast("long").alias("n_published"),
        F.lit(int(not ok2)).cast("long").alias("n_rejected"),
        F.lit(poison_viol).cast("long").alias("poison_violations"),
    ).localCheckpoint()
    shutil.rmtree(root, ignore_errors=True)
    return out


EV_WAP_PUBLISH_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_final,
       CAST(SUM(event_id % 997) AS BIGINT) AS checksum,
       CAST(2 AS BIGINT) AS n_versions,
       CAST(2 AS BIGINT) AS n_published,
       CAST(1 AS BIGINT) AS n_rejected,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events
        WHERE value IS NOT NULL AND (value < 5.0 OR value > 5.0))
           AS poison_violations
FROM events
"""


def ev_wap_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAP ROLLBACK (`operators/wap.rollback_to_version`): v0 (first
    ten days) and v1 (first twenty days) both publish under passing
    audits, then v1 is regretted and the store is reverted to v0's
    state — published as NEW version v2, Iceberg-style, so the bad
    version stays addressable for forensics while readers move back.
    The output mixes MEASURED protocol facts (3 committed versions,
    rollback returned version id 2) with aggregates of the post-revert
    read, which the oracle states as the day-1..10 slice of events —
    if rollback ever left readers on v1 (or destroyed history) the
    counts/version facts diverge."""
    import os
    import shutil

    from spark_tensors_spark.operators import wap
    from spark_tensors_spark.operators.merge import _versions, read_merged
    from spark_tensors_spark.operators.quality import not_null

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"wap_rb_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    cut1 = F.lit("2024-01-11").cast("timestamp")
    cut2 = F.lit("2024-01-21").cast("timestamp")
    rules = [not_null("event_id")]
    ok1, _v0, _ = wap.write_audit_publish(
        spark, root, ev.filter(F.col("ts") < cut1).drop("ts"),
        ["event_id"], rules,
    )
    ok2, _v1, _ = wap.write_audit_publish(
        spark, root, ev.filter(F.col("ts") < cut2).drop("ts"),
        ["event_id"], rules,
    )
    rb_v = wap.rollback_to_version(root, 0)
    n_versions = len(_versions(root))
    final = read_merged(spark, root)  # latest = the revert copy of v0
    out = final.agg(
        F.count(F.lit(1)).alias("n_rows_final"),
        F.sum(F.col("event_id") % 997).cast("bigint").alias("checksum"),
        F.lit(n_versions).cast("long").alias("n_versions"),
        F.lit(int(ok1) + int(ok2)).cast("long").alias("n_published"),
        F.lit(rb_v).cast("long").alias("rollback_version"),
    ).localCheckpoint()
    shutil.rmtree(root, ignore_errors=True)
    return out


EV_WAP_ROLLBACK_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_final,
       CAST(SUM(event_id % 997) AS BIGINT) AS checksum,
       CAST(3 AS BIGINT) AS n_versions,
       CAST(2 AS BIGINT) AS n_published,
       CAST(2 AS BIGINT) AS rollback_version
FROM events
WHERE ts < TIMESTAMP '2024-01-11'
"""


# ------------------------------------------------------- r8 additions

_3D_US = 259_200_000_000  # 3-day attribution window, µs
_EV_DUR_US = 300_000_000  # synthetic event duration for the sweep line
_T0_SEC = 1_704_067_200  # 2024-01-01 UTC — centers the regression x


def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits its value
    EQUALLY across the user's click/view touches in the preceding 3
    days; report credited revenue per touch type.  Both directions are
    value-range window frames over ONE per-user time sort — no
    purchase×touch join materializes: a purchase counts its touches
    with a past-looking frame, a touch collects its purchases' shares
    with the symmetric future-looking frame (t gets credit from p iff
    p ∈ (t, t+3d] ⟺ t ∈ [p−3d, p)).

    Float doctrine: the per-purchase share is ONE double division on
    identical inputs, quantized to DECIMAL(18,12) before the window
    SUM so accumulation is exact and order-free (the Adamic-Adar
    pattern).  Scale: single shuffle on user_id; frames are bounded by
    the 3-day window, never whole-history.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    is_touch = F.col("event_type").isin("click", "view")
    is_purch = F.col("event_type") == "purchase"
    base = ev.withColumn("n_t", is_touch.cast("int")).withColumn(
        "is_p", is_purch
    )
    w_past = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-_3D_US, -1)
    )
    w_future = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(1, _3D_US)
    )
    shared = base.withColumn(
        "n_touch", F.sum("n_t").over(w_past)
    ).withColumn(
        "share",
        F.when(
            F.col("is_p") & (F.col("n_touch") > 0),
            (
                F.col("val").cast("double")
                / F.col("n_touch").cast("double")
            ).cast("decimal(18,12)"),
        ),
    )
    credited = shared.withColumn(
        "credit", F.sum("share").over(w_future)
    ).filter(is_touch)
    return (
        credited.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.when(F.col("credit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_credited"),
            F.coalesce(
                F.sum("credit").cast("double"), F.lit(0.0)
            ).alias("revenue_credited"),
        )
        .orderBy("event_type")
    )


EV_ATTRIBUTION_LINEAR_SQL = f"""
WITH base AS (
    SELECT user_id, event_type, epoch_us(ts) AS t_us,
           CAST(value AS DECIMAL(18,2)) AS val,
           CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0
           END AS n_t,
           event_type = 'purchase' AS is_p
    FROM events
),
shared AS (
    SELECT *,
           CASE WHEN is_p AND n_touch > 0
                THEN CAST(CAST(val AS DOUBLE) / CAST(n_touch AS DOUBLE)
                          AS DECIMAL(18,12))
           END AS share
    FROM (
        SELECT *,
               SUM(n_t) OVER (
                   PARTITION BY user_id ORDER BY t_us
                   RANGE BETWEEN {_3D_US} PRECEDING AND 1 PRECEDING
               ) AS n_touch
        FROM base
    )
),
credited AS (
    SELECT *,
           SUM(share) OVER (
               PARTITION BY user_id ORDER BY t_us
               RANGE BETWEEN 1 FOLLOWING AND {_3D_US} FOLLOWING
           ) AS credit
    FROM shared
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN credit IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_credited,
       COALESCE(CAST(SUM(credit) AS DOUBLE), CAST(0.0 AS DOUBLE))
           AS revenue_credited
FROM credited
WHERE event_type IN ('click', 'view')
GROUP BY event_type
ORDER BY event_type
"""


def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: median / MAD (median
    absolute deviation) instead of mean/σ — immune to the outliers it
    hunts.  Medians are DISCRETE lower medians (the element at rank
    ⌊(n+1)/2⌋ in the value sort): an actual data double, no
    interpolation arithmetic, so both engines agree bit-for-bit and
    the 3×MAD threshold compare can never straddle an ulp.

    Scale: two per-type sort windows (the honest exact-median cost;
    `approx_percentile` is the documented sketch path at 100 TB) and
    two broadcast joins of a 5-row median table back to the facts.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")

    def _lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col)
        wn = Window.partitionBy("event_type")
        return (
            df.withColumn("_r", F.row_number().over(w))
            .withColumn("_n", F.count(F.lit(1)).over(wn))
            .filter(F.col("_r") == F.expr("(_n + 1) div 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = _lower_median(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = _lower_median(dev, "dev", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                (F.col("dev") > 3.0 * F.col("mad")).cast("int")
            )
            .cast("long")
            .alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


EV_ANOMALY_MAD_SQL = """
WITH med AS (
    SELECT event_type, value AS med
    FROM (SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value) AS r,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events)
    WHERE r = (n + 1) // 2
),
dev AS (
    SELECT e.event_type, ABS(e.value - m.med) AS dev, m.med
    FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
    SELECT event_type, dev AS mad
    FROM (SELECT event_type, dev,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY dev) AS r,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM dev)
    WHERE r = (n + 1) // 2
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(d.med) AS med,
       MIN(a.mad) AS mad,
       CAST(SUM(CASE WHEN d.dev > CAST(3.0 AS DOUBLE) * a.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev d JOIN mad a ON a.event_type = d.event_type
GROUP BY d.event_type
ORDER BY d.event_type
"""


def ev_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity trend: closed-form OLS slope of value (cents)
    against time (seconds since 2024-01-01) from ONE pass of five
    sufficient statistics — n, Σx, Σy, Σxy, Σx² — all EXACT integers
    (time is centered so Σx² stays far inside int64; cents come from a
    DECIMAL(18,2) snap × 100).  The slope then evaluates a fixed
    double-op tree on identical int64 inputs, so the unrounded double
    hash-matches cross-engine.  Scale: one map-side-combinable hash
    aggregate; no window, no sort, no join.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (
            # integer division, NOT floor(double /): a double quotient
            # can round up across an integer boundary
            F.expr("unix_micros(ts) div 1000000") - _T0_SEC
        ).alias("x"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = n_d * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    return (
        s.filter((F.col("n") >= 10) & (den > 0))
        .select(
            "user_id",
            "n",
            (num / den).alias("slope_cents_per_sec"),
        )
        .orderBy("user_id")
    )


EV_USER_TREND_SQL = f"""
WITH pts AS (
    SELECT user_id,
           epoch_us(ts) // 1000000 - {_T0_SEC} AS x,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
    FROM events
),
s AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM pts GROUP BY user_id
)
SELECT user_id, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           AS slope_cents_per_sec
FROM s
WHERE n >= 10
  AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
ORDER BY user_id
"""


def ev_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrency per event type via the classic SWEEP LINE: each
    event is a half-open 5-minute interval [ts, ts+300s); explode to
    ±1 boundary deltas, pre-aggregate the net delta per (type,
    timestamp) — which makes the running sum tie-free, since each
    order key is unique within its partition — and take the max of the
    running sum plus the earliest time it is reached.

    Half-open semantics fall out of the pre-aggregation: summing the
    net delta AT t yields the concurrency on [t, next boundary), so an
    interval ending exactly where another starts never overlaps it.
    Scale: one shuffle on event_type + an ordered window over DISTINCT
    boundary timestamps (≪ rows); 100 TB path partitions the sweep by
    (type, coarse time bucket) with per-bucket carry-in, same algebra.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t_us")
    )
    deltas = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(
                    F.col("t_us").alias("t"), F.lit(1).alias("d")
                ),
                F.struct(
                    (F.col("t_us") + _EV_DUR_US).alias("t"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("b"),
    ).select("event_type", F.col("b.t").alias("t"), F.col("b.d").alias("d"))
    net = deltas.groupBy("event_type", "t").agg(
        F.sum("d").cast("long").alias("nd")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = net.withColumn("run", F.sum("nd").over(w))
    return (
        run.groupBy("event_type")
        .agg(
            F.max(
                F.struct(
                    F.col("run").alias("c"), (-F.col("t")).alias("nt")
                )
            ).alias("m")
        )
        .select(
            "event_type",
            F.col("m.c").alias("max_concurrency"),
            (-F.col("m.nt")).alias("at_t_us"),
        )
        .orderBy("event_type")
    )


EV_INTERVAL_OVERLAP_SQL = f"""
WITH deltas AS (
    SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
    UNION ALL
    SELECT event_type, epoch_us(ts) + {_EV_DUR_US} AS t, -1 AS d
    FROM events
),
net AS (
    SELECT event_type, t, CAST(SUM(d) AS BIGINT) AS nd
    FROM deltas GROUP BY event_type, t
),
run AS (
    SELECT event_type, t,
           SUM(nd) OVER (PARTITION BY event_type ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS run
    FROM net
),
mx AS (
    SELECT event_type, MAX(run) AS max_concurrency
    FROM run GROUP BY event_type
)
SELECT r.event_type,
       CAST(m.max_concurrency AS BIGINT) AS max_concurrency,
       MIN(r.t) AS at_t_us
FROM run r
JOIN mx m ON m.event_type = r.event_type AND r.run = m.max_concurrency
GROUP BY r.event_type, m.max_concurrency
ORDER BY r.event_type
"""


QUERIES = {
    "ev_attribution_linear": ev_attribution_linear,
    "ev_anomaly_mad": ev_anomaly_mad,
    "ev_user_trend": ev_user_trend,
    "ev_interval_overlap": ev_interval_overlap,
    "ev_wap_publish": ev_wap_publish,
    "ev_wap_rollback": ev_wap_rollback,
    "ev_missing_hours": ev_missing_hours,
    "ev_delta_join": ev_delta_join,
    "ev_skew_split_join": ev_skew_split_join,
    "ev_kmv_distinct": ev_kmv_distinct,
    "ev_kmv_user_overlap": ev_kmv_user_overlap,
    "ev_ewma_value": ev_ewma_value,
    "ev_profile_columns": ev_profile_columns,
    "ev_anomaly_zscore": ev_anomaly_zscore,
    "ev_merge_upsert": ev_merge_upsert,
    "ev_mor_delete": ev_mor_delete,
    "ev_scd2_user_state": ev_scd2_user_state,
    "ev_scd2_pit_join": ev_scd2_pit_join,
    "ev_merge_time_travel": ev_merge_time_travel,
    "ev_merge_diff": ev_merge_diff,
    "ev_incremental_hourly": ev_incremental_hourly,
    "ev_dq_violations": ev_dq_violations,
    "ev_ohlc_hourly": ev_ohlc_hourly,
    "ev_resample_ffill": ev_resample_ffill,
    "ev_sessionize": ev_sessionize,
    "ev_zorder_stats": ev_zorder_stats,
    "ev_asof_last_click": ev_asof_last_click,
    "ev_range_click_stats": ev_range_click_stats,
    "ev_range_click_stats_left": ev_range_click_stats_left,
    "ev_funnel": ev_funnel,
    "ev_hll_users": ev_hll_users,
    "ev_hll_users_hourly": ev_hll_users_hourly,
    "ev_hll_rollup_day": ev_hll_rollup_day,
    "ev_quantile_sketch": ev_quantile_sketch,
    "ev_cms_top_users": ev_cms_top_users,
    "ev_retention_weekly": ev_retention_weekly,
}

ORACLES = {
    "ev_attribution_linear": EV_ATTRIBUTION_LINEAR_SQL,
    "ev_anomaly_mad": EV_ANOMALY_MAD_SQL,
    "ev_user_trend": EV_USER_TREND_SQL,
    "ev_interval_overlap": EV_INTERVAL_OVERLAP_SQL,
    "ev_wap_publish": EV_WAP_PUBLISH_SQL,
    "ev_wap_rollback": EV_WAP_ROLLBACK_SQL,
    "ev_missing_hours": EV_MISSING_HOURS_SQL,
    "ev_delta_join": EV_DELTA_JOIN_SQL,
    "ev_skew_split_join": EV_SKEW_SPLIT_JOIN_SQL,
    "ev_kmv_distinct": _kmv_distinct_oracle(),
    "ev_kmv_user_overlap": _kmv_overlap_oracle(),
    "ev_ewma_value": EV_EWMA_VALUE_SQL,
    "ev_profile_columns": EV_PROFILE_COLUMNS_SQL,
    "ev_anomaly_zscore": EV_ANOMALY_ZSCORE_SQL,
    "ev_merge_upsert": EV_MERGE_UPSERT_SQL,
    "ev_mor_delete": EV_MOR_DELETE_SQL,
    "ev_scd2_user_state": EV_SCD2_USER_STATE_SQL,
    "ev_scd2_pit_join": EV_SCD2_PIT_JOIN_SQL,
    "ev_merge_time_travel": EV_MERGE_TIME_TRAVEL_SQL,
    "ev_merge_diff": EV_MERGE_DIFF_SQL,
    "ev_incremental_hourly": EV_INCREMENTAL_HOURLY_SQL,
    "ev_dq_violations": EV_DQ_VIOLATIONS_SQL,
    "ev_ohlc_hourly": EV_OHLC_HOURLY_SQL,
    "ev_resample_ffill": EV_RESAMPLE_FFILL_SQL,
    "ev_sessionize": EV_SESSIONIZE_SQL,
    "ev_zorder_stats": _zorder_stats_oracle(),
    "ev_asof_last_click": EV_ASOF_LAST_CLICK_SQL,
    "ev_range_click_stats": EV_RANGE_CLICK_STATS_SQL,
    "ev_range_click_stats_left": EV_RANGE_CLICK_STATS_LEFT_SQL,
    "ev_funnel": EV_FUNNEL_SQL,
    "ev_hll_users": _hll_users_oracle(),
    "ev_hll_users_hourly": _hll_users_hourly_oracle(),
    "ev_hll_rollup_day": _hll_rollup_day_oracle(),
    "ev_quantile_sketch": _EV_QUANTILE_SKETCH_SQL,
    "ev_cms_top_users": _cms_top_users_oracle(),
    "ev_retention_weekly": EV_RETENTION_WEEKLY_SQL,
}
