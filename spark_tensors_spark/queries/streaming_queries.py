"""Streaming-operator queries in batch mode (SURVEY §2.9 / M5).

The same functions run on readStream inputs (tests/test_streaming.py
proves batch≡stream); here they run batch over `events` so the driver's
DuckDB oracle can check them:
  - tumbling window ≡ epoch-aligned hour buckets;
  - sliding window  ≡ two shifted 15-min buckets per event;
  - session window  ≡ gaps-and-islands (break at gap ≥ 5 min);
  - stateful dedup  ≡ DISTINCT on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_tensors_spark.io.readers import load_table
from spark_tensors_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stateful_dedup,
    tumbling_window_agg,
)


def ev_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(ev, window="1 hour").orderBy(
        "w_start", "event_type"
    )


def ev_sliding_30m_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_window_agg(ev, window="30 minutes", slide="15 minutes").orderBy(
        "w_start", "event_type"
    )


def ev_session_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_window_agg(ev, gap="5 minutes").orderBy(
        "user_id", "w_start"
    )


def ev_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = stateful_dedup(ev, keys=("user_id", "event_type"))
    return out.agg(F.count(F.lit(1)).alias("c"))


def ev_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator in batch mode (stream mode is
    applyInPandasWithState; tests prove stream ≡ batch)."""
    from spark_tensors_spark.streaming.stateful import running_user_totals

    ev = load_table(spark, sf_dir, "events")
    return running_user_totals(ev).orderBy("user_id")


def ev_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props parsing (SURVEY §1.2 MapType surface): extract a typed
    field scan-side and aggregate — the 100 TB form of semi-structured
    columns (parse in the projection, never a Python UDF)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


def ev_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly totals written through the idempotent foreachBatch writer
    (batch-id partition overwrite) and read back — the sink code path
    itself lands on the oracle-checked surface.  The write is
    re-runnable by construction: the same batch id overwrites its own
    partition."""
    import os

    from spark_tensors_spark.streaming import sinks

    ev = load_table(spark, sf_dir, "events")
    agg = tumbling_window_agg(ev, window="1 hour")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"ev_hourly_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    sinks.write_idempotent_batch(agg, 0, path)
    return (
        sinks.read_sink(spark, path)
        .select("w_start", "w_end", "event_type", "c", "v")
        .orderBy("w_start", "event_type")
    )


QUERIES = {
    "ev_tumbling_hour": ev_tumbling_hour,
    "ev_sink_roundtrip": ev_sink_roundtrip,
    "ev_props_json_stats": ev_props_json_stats,
    "ev_sliding_30m_15m": ev_sliding_30m_15m,
    "ev_session_5m": ev_session_5m,
    "ev_dedup_keys": ev_dedup_keys,
    "ev_running_user_totals": ev_running_user_totals,
}

ORACLES = {
    "ev_sink_roundtrip": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
               CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
                   AS w_end,
               event_type, COUNT(*) AS c, ROUND(SUM(value), 6) AS v
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY w_start, event_type
    """,
    "ev_tumbling_hour": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
               CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
                   AS w_end,
               event_type, COUNT(*) AS c, ROUND(SUM(value), 6) AS v
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY w_start, event_type
    """,
    "ev_sliding_30m_15m": """
        WITH base AS (
            SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 900) * 900)
                        AS TIMESTAMP) AS b0, ts, event_type
            FROM events
        ),
        expanded AS (
            SELECT b0 AS w_start, event_type FROM base
            UNION ALL
            SELECT b0 - INTERVAL 15 MINUTE, event_type FROM base
        )
        SELECT w_start, event_type, COUNT(*) AS c
        FROM expanded
        GROUP BY 1, 2
        ORDER BY w_start, event_type
    """,
    "ev_session_5m": """
        WITH x AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        y AS (
            SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS grp
            FROM x
        )
        SELECT CAST(MIN(ts) AS TIMESTAMP) AS w_start,
               CAST(MAX(ts) + INTERVAL 5 MINUTE AS TIMESTAMP) AS w_end,
               user_id, COUNT(*) AS c, ROUND(SUM(value), 6) AS v
        FROM y
        GROUP BY user_id, grp
        ORDER BY user_id, w_start
    """,
    "ev_dedup_keys": """
        SELECT COUNT(*) AS c
        FROM (SELECT DISTINCT user_id, event_type FROM events) t
    """,
    "ev_running_user_totals": """
        SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 6) AS total,
               MAX(epoch_us(ts)) AS last_ts_us
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "ev_props_json_stats": """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS k_sum,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}
