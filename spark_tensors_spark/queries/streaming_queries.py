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
from spark_tensors_spark.session import stream_state_partitions
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


def ev_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured props (SURVEY §1.2):
    `parse_json` → binary VARIANT column → typed `try_variant_get`
    shredding + `schema_of_variant`, all scan-side JVM — the
    open-table-format answer to schemaless columns (vs
    ev_props_json_stats' per-path get_json_object: VARIANT parses
    once and serves every path from the binary encoding).  Groups by
    k-decade bucket; n_schemas proves the inferred variant schema is
    uniform — the oracle restates it with json_structure."""
    ev = load_table(spark, sf_dir, "events")
    shredded = ev.select(
        "event_type",
        F.try_variant_get(
            F.parse_json("props"), "$.k", "long"
        ).alias("k"),
        F.schema_of_variant(F.parse_json("props")).alias("vschema"),
    )
    return (
        shredded.groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum("k").alias("k_sum"),
            F.countDistinct("vschema").alias("n_schemas"),
        )
        .orderBy("k_bucket")
    )


EV_PROPS_VARIANT_STATS_SQL = """
WITH s AS (
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json_structure(props) AS vschema
    FROM events
)
SELECT k % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(COUNT(DISTINCT vschema) AS BIGINT) AS n_schemas
FROM s GROUP BY 1 ORDER BY k_bucket
"""


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
        # pid-keyed: two processes running the query surface at once
        # (e.g. a correctness gate beside a bench run) must not share a
        # sink/staging directory
        f"ev_hourly_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    sinks.write_idempotent_batch(agg, 0, path)
    out = (
        sinks.read_sink(spark, path)
        .select("w_start", "w_end", "event_type", "c", "v")
        .orderBy("w_start", "event_type")
        # materialize off the sink files so the per-pid dir can be
        # deleted instead of accumulating across runs
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    return out


def ev_last3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3 most recent events — batch form of the
    transformWithStateInPandas ListState recency buffer
    (streaming/stateful.py last_n_events; stream ≡ batch pinned in
    tests/test_streaming.py)."""
    from spark_tensors_spark.streaming.stateful import last_n_events

    ev = load_table(spark, sf_dir, "events")
    return last_n_events(ev, n=3).orderBy("user_id", "rk")


def doc_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental corpus-dedup operator (streaming/dedup.py) run
    through a REAL readStream → foreachBatch pass over the documents
    table (one availableNow batch here, so the admission set is
    deterministic and the recursive-CTE oracle can state it: exact
    md5 keepers minus LSH transitive-component drops).  Multi-batch
    incremental admission + replay idempotence are pinned by
    tests/test_streaming_dedup.py.

    State-store note: this query's plan has NO Spark stateful operator
    — dedup state is unbounded (every hash/band ever seen), so it
    lives in EXTERNAL parquet state folded per foreachBatch
    (streaming/dedup.py:7-12), not in the state store.  The RocksDB
    provider is therefore structurally inapplicable here (a provider
    routes applyInPandasWithState / watermarked-agg / dropDuplicates
    state; this plan instantiates none); the 100 TB state story is the
    replay-idempotent batch-id commit instead."""
    import os
    import shutil

    from spark_tensors_spark.streaming.dedup import streaming_dedup

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        # pid-keyed: a fixed path lets two concurrent processes fight
        # over one streaming checkpoint (CONCURRENT_STREAM_LOG_UPDATE)
        f"stream_dedup_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    # state/checkpoint persist across invocations by design (that IS the
    # streaming-state pattern); for a declared query they must be fresh
    # or the admission set would depend on earlier runs
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(src).schema
    # the file stream source wants a directory; glob-filter it down to
    # the documents table
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    with stream_state_partitions(spark):
        q = streaming_dedup(
            stream,
            state_dir=os.path.join(root, "state"),
            out_dir=os.path.join(root, "out"),
            checkpoint_dir=os.path.join(root, "ckpt"),
        )
        q.awaitTermination()
    admitted = spark.read.parquet(os.path.join(root, "out"))
    out = (
        admitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_admitted"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
        # materialize off the sink files so the per-pid root can be
        # deleted instead of accumulating across runs
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _doc_stream_dedup_oracle() -> str:
    from spark_tensors_spark.queries.pipeline_queries import (
        _MINHASH_COLS,
        _SHINGLES,
    )

    return f"""
WITH RECURSIVE keepers AS (
    SELECT * FROM documents
    QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
),
sh_t AS (
    SELECT doc_id, {_SHINGLES} AS sh FROM keepers
),
sigs AS (
    SELECT doc_id,
           {_MINHASH_COLS}
    FROM sh_t
),
banded_all AS (
    SELECT doc_id, 0 AS band, concat_ws('_', m0, m1) AS sig FROM sigs
    UNION ALL
    SELECT doc_id, 1, concat_ws('_', m2, m3) FROM sigs
    UNION ALL
    SELECT doc_id, 2, concat_ws('_', m4, m5) FROM sigs
    UNION ALL
    SELECT doc_id, 3, concat_ws('_', m6, m7) FROM sigs
),
banded AS (
    SELECT * FROM banded_all
    QUALIFY COUNT(*) OVER (PARTITION BY band, sig) <= 64
),
pairs AS (
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(node, seen) AS (
    SELECT u, u FROM edges
    UNION
    SELECT r.node, e.v
    FROM reach r JOIN edges e ON e.u = r.seen
),
dropped AS (
    SELECT node AS doc_id FROM reach
    GROUP BY node HAVING MIN(seen) <> node
)
SELECT k.source,
       COUNT(*) AS n_admitted,
       MIN(k.doc_id) AS min_id,
       MAX(k.doc_id) AS max_id
FROM keepers k
LEFT JOIN dropped d ON k.doc_id = d.doc_id
WHERE d.doc_id IS NULL
GROUP BY k.source
ORDER BY k.source
"""


def ev_stream_hll_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour distinct-user HLL maintained as STREAMING register
    state (`streaming/sketches.py`): a real readStream → foreachBatch
    pass appends per-batch register partials (CRDT max-merge, replay
    idempotent); the estimate folded from state is bit-identical to
    the batch sketch over the same rows, so this shares the batch
    oracle's register math.  Multi-batch merge + replay idempotence
    are pinned in tests/test_streaming_sketches.py."""
    import os
    import shutil

    from spark_tensors_spark.streaming.sketches import (
        hll_estimate_from_state,
        streaming_hourly_hll,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_hll_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    from pyspark.sql import types as T

    src = os.path.join(sf_dir, "events.parquet")
    # nanosAsLong only matters for the legacy NANOS events layout; set
    # it for the scan's lifetime and RESTORE it after the drain so the
    # shared session's later parquet reads are unaffected.
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        # mirror load_table's events-ts normalization (io/readers.py) —
        # both layout casts are stateless projections, streaming-safe
        ts_type = schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        with stream_state_partitions(spark):
            q = streaming_hourly_hll(
                stream,
                state_dir=os.path.join(root, "state"),
                checkpoint_dir=os.path.join(root, "ckpt"),
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    est = hll_estimate_from_state(
        spark, os.path.join(root, "state"), ["hour_start"]
    )
    out = (
        est.select(
            "hour_start", F.round("hll_estimate", 4).alias("hll_users")
        )
        .orderBy("hour_start")
        # materialize off the state parquet so the per-pid sink dir can
        # be deleted instead of accumulating across runs
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _stream_hll_hourly_oracle() -> str:
    from spark_tensors_spark.functions.sketches import hll_oracle_sql

    src = (
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, "
        "user_id FROM events"
    )
    hll = hll_oracle_sql(src, "user_id", ["hour_start"])
    return f"""
SELECT hour_start, ROUND(hll_estimate, 4) AS hll_users
FROM ({hll})
ORDER BY hour_start
"""


def ev_stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct user-day KMV maintained as STREAMING
    signature state (`streaming/sketches.py`): a real readStream →
    foreachBatch pass appends each batch's own signature (≤ k rows per
    group whatever the batch size); min-k over the union of partials IS
    the union's signature, so the folded estimate is bit-identical to
    the batch sketch — this query SHARES ev_kmv_distinct's oracle.
    Replay-safe twice over: batch-id partition overwrite + idempotent
    min-k merge."""
    import os
    import shutil

    from pyspark.sql import types as T

    from spark_tensors_spark.functions.sketches import (
        kmv_estimate_from_signature,
    )
    from spark_tensors_spark.io.readers import load_table
    from spark_tensors_spark.streaming.sketches import (
        kmv_signature_from_state,
        streaming_kmv,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_kmv_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "events.parquet")
    # scoped conf (see ev_stream_hll_hourly): set for the drain, restore
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_type = schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        stream = stream.select(
            "event_type",
            F.concat_ws(
                ":", F.col("user_id"), F.to_date("ts").cast("string")
            ).alias("user_day"),
        )
        with stream_state_partitions(spark):
            q = streaming_kmv(
                stream,
                state_dir=os.path.join(root, "state"),
                checkpoint_dir=os.path.join(root, "ckpt"),
                value_col="user_day",
                group_cols=["event_type"],
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    sig = kmv_signature_from_state(
        spark, os.path.join(root, "state"), ["event_type"]
    )
    est = kmv_estimate_from_signature(sig, ["event_type"])
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(
        "event_type",
        F.concat_ws(
            ":", F.col("user_id"), F.to_date("ts").cast("string")
        ).alias("user_day"),
    ).groupBy("event_type").agg(F.countDistinct("user_day").alias("n_exact"))
    out = (
        est.join(exact, "event_type")
        .select("event_type", "n_exact", "kmv_estimate")
        .orderBy("event_type")
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _stream_kmv_distinct_oracle() -> str:
    # the streaming fold is value-identical to the batch sketch, so the
    # oracle IS ev_kmv_distinct's
    from spark_tensors_spark.queries.temporal_queries import (
        _kmv_distinct_oracle,
    )

    return _kmv_distinct_oracle()


def ev_stream_cms_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heavy hitters from a count-min sketch maintained as
    STREAMING state (`streaming/sketches.py`): per-batch cell-count
    partials (≤ depth×width rows per batch) appended under batch-id
    partitions — sum-merge, replay-safe by partition overwrite.  The
    folded sketch is bit-identical to the batch sketch, so this shares
    the batch query's oracle; exact counts ride along as the
    verification column (CMS never underestimates)."""
    import os
    import shutil

    from spark_tensors_spark.functions.sketches import cms_estimate
    from spark_tensors_spark.streaming.sketches import (
        cms_sketch_from_state,
        streaming_cms,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_cms_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "events.parquet")
    # scoped conf (see ev_stream_hll_hourly): set for the drain,
    # restore after
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        with stream_state_partitions(spark):
            q = streaming_cms(
                stream,
                state_dir=os.path.join(root, "state"),
                checkpoint_dir=os.path.join(root, "ckpt"),
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    sketch = cms_sketch_from_state(spark, os.path.join(root, "state"))
    ev = load_table(spark, sf_dir, "events")
    keys = ev.select("user_id").distinct()
    est = cms_estimate(sketch, keys, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    out = (
        est.join(exact, "user_id")
        .select(
            "user_id", "n_exact", F.col("cms_estimate").alias("cms_est")
        )
        .orderBy(F.desc("cms_est"), "user_id")
        .limit(20)
        # materialize off the state parquet so the per-pid sink dir can
        # be deleted instead of accumulating across runs
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _stream_cms_top_users_oracle() -> str:
    from spark_tensors_spark.queries.temporal_queries import (
        _cms_top_users_oracle,
    )

    return _cms_top_users_oracle()


def emb_stream_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance as a REAL readStream pass
    (`streaming/ann.py`): embeddings stream → int8 quantization (a
    stateless projection, streaming-safe) → per-batch nearest-centroid
    assignment appended under batch-id partitions (replay-idempotent).
    Integer pseudo-centroids make every assignment and d2 exact, so the
    accumulated index state shares the batch assignment's DuckDB
    oracle: per-cell counts, id extrema, and the exact Σd2."""
    import os
    import shutil

    from spark_tensors_spark.pipeline.quantize import scalar_quantize_int8
    from spark_tensors_spark.pipeline.similarity import pseudo_centroids
    from spark_tensors_spark.streaming.ann import streaming_ivf_assign

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_ivf_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "embeddings.parquet")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    codes = scalar_quantize_int8(stream).select("vec_id", "codes")
    with stream_state_partitions(spark):
        q = streaming_ivf_assign(
            codes,
            state_dir=os.path.join(root, "state"),
            checkpoint_dir=os.path.join(root, "ckpt"),
            centroids=pseudo_centroids(16, 64),
        )
        q.awaitTermination()
    out = (
        spark.read.parquet(os.path.join(root, "state"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("vid").alias("min_id"),
            F.max("vid").alias("max_id"),
            F.sum("d2").cast("long").alias("d2_sum"),
        )
        .orderBy("cell")
        # materialize off the state parquet so the per-pid sink dir can
        # be deleted instead of accumulating across runs
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _stream_ivf_assign_oracle() -> str:
    from spark_tensors_spark.queries.pipeline_queries import _ANN_CODES_CTE

    return _ANN_CODES_CTE + """,
        celld AS (
            SELECT vec_id, CAST(cc.c AS BIGINT) AS cell,
                   CAST(list_sum(list_transform(range(64), j ->
                       (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))
                     * (codes[CAST(j AS INT) + 1]
                        - ((cc.c * 37 + j * 13 + 11) % 161 - 80))))
                   AS BIGINT) AS d2
            FROM q CROSS JOIN (SELECT UNNEST(range(16)) AS c) cc
        ),
        assigned AS (
            SELECT vec_id, cell, d2 FROM (
                SELECT vec_id, cell, d2,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cell) AS rnk
                FROM celld) WHERE rnk = 1
        )
        SELECT cell, COUNT(*) AS n,
               MIN(vec_id) AS min_id, MAX(vec_id) AS max_id,
               CAST(SUM(d2) AS BIGINT) AS d2_sum
        FROM assigned GROUP BY cell ORDER BY cell
    """


def ev_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level STREAMING sessionization
    (`streaming/sessionize.sessionize_stream`,
    applyInPandasWithState: 16-byte (last_ts_us, session_idx) state per
    user) through a REAL readStream pass over the events table, rolled
    up per (user, session) — shares ev_sessionize's gap semantics, so
    the oracle is the same flag/label SQL (sampled to user_id % 25 = 0,
    no value sum: counts and spans stay integer-exact).  Cross-batch
    session continuation + stream ≡ batch at every boundary are pinned
    in tests/test_streaming.py.

    Like ev_stream_session_ttl, the per-user state runs through the
    ROCKSDB provider (`session.rocksdb_state`) — the deployable 100 TB
    state store — so the gated row verifies the production
    configuration (provider spy assertion in tests/test_streaming.py)."""
    import os
    import shutil

    from pyspark.sql import types as T

    from spark_tensors_spark import session as _session
    from spark_tensors_spark.streaming.sessionize import sessionize_stream

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_sess_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "events.parquet")
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_type = schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        labeled = sessionize_stream(
            stream.filter(F.col("user_id") % 25 == 0)
        )
        out_dir = os.path.join(root, "out")
        # batch-id-partition overwrite, NOT mode("append"): a replayed
        # uncommitted batch would duplicate rows and inflate n_events
        from spark_tensors_spark.streaming.sinks import (
            write_idempotent_batch,
        )

        with _session.rocksdb_state(spark), stream_state_partitions(spark):
            q = (
                labeled.writeStream.outputMode("update")
                .foreachBatch(
                    lambda bdf, bid: write_idempotent_batch(
                        bdf, bid, out_dir
                    )
                )
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    lab = spark.read.parquet(os.path.join(root, "out"))
    out = (
        lab.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
        )
        .orderBy("user_id", "session_idx")
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def ev_stream_mv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATERIALIZED VIEW (`streaming/mv.streaming_agg_view`):
    a readStream over the events table continuously folds into a
    stored (day, event_type) count/sum/max snapshot — one partial
    aggregate per micro-batch + a key-sized merge, never a history
    rescan, with exactly-once folds via batch-id-stamped snapshot
    commits (an aggregate fold is NOT replay-idempotent by value, so
    the sink records the batch id in the same atomic commit; pinned in
    tests/test_streaming_mv.py).  The final view must equal the direct
    aggregate, which is what the oracle states."""
    import os
    import shutil

    from pyspark.sql import types as T

    from spark_tensors_spark.streaming.mv import (
        read_view,
        streaming_agg_view,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_mv_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "events.parquet")
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_type = schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        rows = stream.filter(F.col("user_id") % 3 == 0).select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("v6"),
            "value",
        )
        with stream_state_partitions(spark):
            q = streaming_agg_view(
                rows,
                view_path=os.path.join(root, "view"),
                checkpoint_dir=os.path.join(root, "ckpt"),
                key_cols=["day", "event_type"],
                aggs={
                    "n": ("count", "value"),
                    "v_sum6": ("sum", "v6"),
                    "v_max": ("max", "value"),
                },
            )
            q.awaitTermination()
        view = read_view(spark, os.path.join(root, "view"))
        out = (
            view.select(
                "day",
                "event_type",
                F.col("n").cast("long").alias("n"),
                F.col("v_sum6").cast("double").alias("v_sum"),
                "v_max",
            )
            .orderBy("day", "event_type")
            .localCheckpoint()
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    shutil.rmtree(root, ignore_errors=True)
    return out


EV_STREAM_MV_DAILY_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v_sum,
       MAX(value) AS v_max
FROM events
WHERE user_id % 3 = 0
GROUP BY 1, 2
ORDER BY day, event_type
"""


def ev_stream_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JOIN-VIEW maintenance (streaming/joinview.py): the
    click⋈purchase join on (user_id, day) is kept current by the
    delta-join rule ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB per micro-batch — the events
    table is re-staged as a four-file source and streamed one file per
    trigger, so several REAL micro-batches each contribute only their
    delta-sized increment, and the final view (union of increments)
    must equal the direct batch join, which is what the oracle states.
    Exactly-once via batch-id partition overwrite + `_batch_id <
    current` history reads (replay pinned in
    tests/test_streaming_joinview.py).

    State-store note: the A/B side stores are EXTERNAL parquet state
    folded per foreachBatch (the delta-join needs full-history sides —
    a stream-stream join's watermark-bounded state can't express an
    unbounded view), so the plan has no Spark stateful operator and
    the RocksDB provider is structurally inapplicable; exactly-once
    rests on the batch-id commits instead."""
    import os
    import shutil

    from spark_tensors_spark.streaming.joinview import (
        read_join_view,
        streaming_delta_join_view,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_jv_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
        src = os.path.join(root, "src")
        # four-way re-stage => four micro-batches at 1 file/trigger
        (
            ev.withColumn("wk", F.dayofmonth("ts") % 4)
            .repartition("wk")
            .write.partitionBy("wk")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        with_day = stream.withColumn(
            "day", F.date_trunc("day", F.col("ts"))
        )
        with stream_state_partitions(spark):
            q = streaming_delta_join_view(
                with_day,
                split_a=lambda b: b.filter(
                    F.col("event_type") == "click"
                ).select("user_id", "day", F.col("event_id").alias("a_id")),
                split_b=lambda b: b.filter(
                    F.col("event_type") == "purchase"
                ).select("user_id", "day", F.col("event_id").alias("b_id")),
                on=["user_id", "day"],
                root=os.path.join(root, "jv"),
                checkpoint_dir=os.path.join(root, "ckpt"),
            )
            q.awaitTermination()
        view = read_join_view(
            spark, os.path.join(root, "jv", "view")
        )
        out = (
            view.groupBy("day")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(F.col("a_id") + F.col("b_id")).alias("id_sum"),
            )
            .orderBy("day")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def ev_stream_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained QUANTILES: the fixed-bin histogram
    sketch is exactly a (key, bin)→count mergeable state, so the
    existing streaming MV (`streaming/mv.streaming_agg_view`, keyed on
    (day, hist_bin)) maintains it with ZERO new operator code — each
    micro-batch folds bin counts, exactly-once via the batch-id-stamped
    snapshot commits — and p50/p90/p99 read out of the final view with
    `quantiles_from_histogram`.  This closes the quantile gap in the
    incremental/streaming snapshot family end-to-end (batch form:
    ev_quantile_sketch, whose oracle this SHARES — the stream fold must
    equal the direct histogram)."""
    import os
    import shutil

    from pyspark.sql import types as T

    from spark_tensors_spark.functions.sketches import (
        quantiles_from_histogram,
    )
    from spark_tensors_spark.streaming.mv import (
        read_view,
        streaming_agg_view,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_q_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "events.parquet")
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_type = schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        b = F.floor((F.col("value") - F.lit(0.0)) / F.lit(8.0))
        rows = stream.select(
            F.date_trunc("day", F.col("ts")).alias("day_start"),
            F.least(F.lit(79), F.greatest(F.lit(0), b))
            .cast("long")
            .alias("hist_bin"),
        )
        with stream_state_partitions(spark):
            q = streaming_agg_view(
                rows,
                view_path=os.path.join(root, "view"),
                checkpoint_dir=os.path.join(root, "ckpt"),
                key_cols=["day_start", "hist_bin"],
                aggs={"cnt": ("count", "hist_bin")},
            )
            q.awaitTermination()
        view = read_view(spark, os.path.join(root, "view"))
        out = (
            quantiles_from_histogram(
                view.select(
                    "day_start",
                    "hist_bin",
                    F.col("cnt").cast("long").alias("cnt"),
                ),
                ["day_start"],
                [50, 90, 99],
                lo=0.0,
                width=8.0,
            )
            .orderBy("day_start", "p")
            .localCheckpoint()
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        shutil.rmtree(root, ignore_errors=True)
    return out


def ev_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 maintenance (streaming/scd2.py): the sampled
    users' event_type history is maintained across four REAL
    micro-batches (events re-staged into contiguous week files, mtimes
    forced so the file source delivers them in event-time order — the
    CDC arrival-order contract), with per-batch work bounded by
    touched keys + batch rows, never a history recompute.  The final
    history must equal the batch `history_table`, so this SHARES
    ev_scd2_user_state's oracle — the streaming query gates the
    incremental fold itself.

    State-store note: SCD2 history is a versioned TABLE (snapshot per
    batch, `_v=N__b=B` dirs), i.e. EXTERNAL parquet state folded per
    foreachBatch — the plan has no Spark stateful operator, so the
    RocksDB provider is structurally inapplicable; exactly-once rests
    on the versioned snapshot commits instead."""
    import os
    import shutil

    from spark_tensors_spark.streaming.scd2 import (
        read_history,
        streaming_scd2,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_scd2_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    try:
        ev = load_table(spark, sf_dir, "events").filter(
            F.col("user_id") % 5 == 0
        ).select("event_id", "ts", "user_id", "event_type")
        src = os.path.join(root, "src")
        # CONTIGUOUS ABSOLUTE-TIME buckets (not day%4, and not
        # dayofmonth, which re-wraps every calendar month — a
        # multi-month horizon would deliver a later month's early days
        # first and silently break the per-key event-time-monotone
        # arrival contract): floor(µs since epoch / 8 days) is
        # monotone on ANY horizon
        (
            ev.withColumn(
                "wk",
                F.expr(
                    f"unix_micros(ts) div {8 * 86_400 * 1_000_000}"
                ),
            )
            .repartition("wk")
            .write.partitionBy("wk")
            .parquet(src)
        )
        # force mtime = week order so the file source triggers batches
        # in event-time order
        for d in sorted(os.listdir(src)):
            if not d.startswith("wk="):
                continue
            wk = int(d.split("=")[1])
            full = os.path.join(src, d)
            for f in os.listdir(full):
                os.utime(
                    os.path.join(full, f),
                    (1_700_000_000 + wk, 1_700_000_000 + wk),
                )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        with stream_state_partitions(spark):
            q = streaming_scd2(
                stream,
                table_path=os.path.join(root, "hist"),
                checkpoint_dir=os.path.join(root, "ckpt"),
                key_cols=["user_id"],
                attr_cols=["event_type"],
                ts_col="ts",
                tiebreak_col="event_id",
            )
            q.awaitTermination()
        hist = read_history(spark, os.path.join(root, "hist"))
        out = (
            hist.select(
                "user_id", "event_type", "valid_from_us",
                "valid_to_us", "is_current",
            )
            .orderBy("user_id", "valid_from_us", "event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


EV_STREAM_JOIN_VIEW_SQL = """
WITH a AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_id AS a_id
    FROM events WHERE event_type = 'click'
),
b AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_id AS b_id
    FROM events WHERE event_type = 'purchase'
),
j AS (
    SELECT a.user_id, a.day, a_id, b_id
    FROM a JOIN b USING (user_id, day)
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(a_id + b_id) AS BIGINT) AS id_sum
FROM j GROUP BY day ORDER BY day
"""


def ev_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join — the enrichment pattern (click stream ⋈
    broadcast dimension): a readStream over the events table left-joins
    a BATCH-computed per-user profile (first event type + lifetime
    count) inside the streaming plan; Spark re-plans the static side
    per micro-batch and broadcasts it under AQE.  Sink rows roll up per
    (profile first type, event type) so the oracle is one join + one
    aggregate."""
    import os
    import shutil

    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_enrich_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    ev_batch = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    profile = (
        ev_batch.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_type"),
        )
        .join(
            ev_batch.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("lifetime_n")
            ),
            "user_id",
        )
    )
    src = os.path.join(sf_dir, "events.parquet")
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        enriched = (
            stream.filter(F.col("user_id") % 11 == 0)
            .select("user_id", "event_id", "event_type")
            .join(F.broadcast(profile), "user_id", "left")
        )
        out_dir = os.path.join(root, "out")

        # replay-idempotent sink: a crashed-and-replayed micro-batch
        # overwrites its own _batch_id partition instead of appending
        # twice (the repo's exactly-once doctrine, streaming/sinks.py)
        from spark_tensors_spark.streaming.sinks import (
            write_idempotent_batch,
        )

        with stream_state_partitions(spark):
            q = (
                enriched.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, bid: write_idempotent_batch(
                        bdf, bid, out_dir
                    )
                )
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    rows = spark.read.parquet(os.path.join(root, "out")).drop("_batch_id")
    out = (
        rows.groupBy("first_type", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
            F.sum("lifetime_n").cast("long").alias("lifetime_sum"),
        )
        .orderBy("first_type", "event_type")
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


EV_STREAM_ENRICH_SQL = """
WITH profile AS (
    SELECT f.user_id, f.first_type, c.lifetime_n
    FROM (SELECT user_id, event_type AS first_type
          FROM (SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events) WHERE rn = 1) f
    JOIN (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS lifetime_n
          FROM events GROUP BY user_id) c
      ON c.user_id = f.user_id
),
enriched AS (
    SELECT e.user_id, e.event_id, e.event_type,
           p.first_type, p.lifetime_n
    FROM events e
    LEFT JOIN profile p ON p.user_id = e.user_id
    WHERE e.user_id % 11 = 0
)
SELECT first_type, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(event_id) AS min_event,
       MAX(event_id) AS max_event,
       CAST(SUM(lifetime_n) AS BIGINT) AS lifetime_sum
FROM enriched
GROUP BY first_type, event_type
ORDER BY first_type, event_type
"""


def ev_stream_session_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FINALIZED session roll-ups with event-time TIMERS
    (`streaming/sessionize.sessionize_stream_ttl`,
    applyInPandasWithState + EventTimeTimeout): a session emits
    exactly once, when an in-order successor opens the next session or
    the watermark passes ``last_ts + gap`` and the timer fires — the
    state-TTL semantics `ev_stream_sessionize` lacks.  The sampled
    events replay as two REAL micro-batches (time-split files,
    mtime-ordered, maxFilesPerTrigger=1) plus the availableNow final
    timeout-only batch (empirically pinned: timers fire against the
    PREVIOUS batch's committed watermark, ms resolution, strict <).
    The oracle states the emitted set exactly: every session with a
    successor, plus last sessions whose timer the final watermark
    (max event ms − delay) passed; still-open sessions stay in state,
    unemitted.

    This query runs its state through the ROCKSDB provider
    (`session.rocksdb_state`) — the deployable 100 TB state store, so
    the externally gated row verifies the configuration production
    would run, not just the default in-heap provider (provider
    assertion + HDFS≡RocksDB equality in tests/test_streaming.py)."""
    import os
    import shutil

    from spark_tensors_spark.session import rocksdb_state

    from spark_tensors_spark.streaming.sessionize import (
        sessionize_stream_ttl,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_ttl_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 25 == 0)
        .select("user_id", "event_id", "ts")
    )
    split = "2024-01-16"
    src = os.path.join(root, "src")
    ev.filter(F.col("ts") < split).coalesce(1).write.parquet(
        os.path.join(src, "p0")
    )
    ev.filter(F.col("ts") >= split).coalesce(1).write.parquet(
        os.path.join(src, "p1")
    )
    # the file source orders by modification time: pin p0 before p1
    # explicitly instead of sleeping between writes
    for i, part in enumerate(("p0", "p1")):
        for f in os.listdir(os.path.join(src, part)):
            os.utime(os.path.join(src, part, f),
                     (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    closed = sessionize_stream_ttl(
        stream, gap_seconds=300, watermark_delay="10 minutes"
    )
    out_dir = os.path.join(root, "out")

    # replay-idempotent sink (streaming/sinks.py doctrine): each
    # micro-batch overwrites exactly its own _batch_id partition
    from spark_tensors_spark.streaming.sinks import write_idempotent_batch

    with rocksdb_state(spark), stream_state_partitions(spark):
        q = (
            closed.writeStream.outputMode("append")
            .foreachBatch(
                lambda bdf, bid: write_idempotent_batch(bdf, bid, out_dir)
            )
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = spark.read.parquet(out_dir).drop("_batch_id")
    out = (
        got.orderBy("user_id", "session_idx")
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


EV_STREAM_SESSION_TTL_SQL = """
WITH src AS (
    SELECT user_id, event_id, ts FROM events WHERE user_id % 25 = 0
),
flagged AS (
    SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                     > 300 * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM src
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
labeled AS (
    SELECT user_id, ts_us,
           CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_idx
    FROM flagged
),
sessions AS (
    SELECT user_id, session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts_us) AS first_ts_us,
           MAX(ts_us) AS last_ts_us
    FROM labeled
    GROUP BY user_id, session_idx
),
-- the final committed watermark: max event time in MILLISECONDS
-- (floor) minus the 10-minute delay
wm AS (
    SELECT (MAX(CAST(epoch_us(ts) AS BIGINT)) // 1000) - 600000
               AS wm_ms
    FROM src
),
last_per_user AS (
    SELECT user_id, MAX(session_idx) AS mx FROM sessions GROUP BY user_id
)
SELECT s.user_id AS user_id, s.session_idx AS session_idx,
       s.n_events AS n_events,
       CAST(s.first_ts_us AS BIGINT) AS first_ts_us,
       CAST(s.last_ts_us AS BIGINT) AS last_ts_us
FROM sessions s
JOIN last_per_user m ON m.user_id = s.user_id
CROSS JOIN wm
WHERE s.session_idx < m.mx
   OR ((s.last_ts_us + 300 * 1000000) // 1000) + 1 < wm.wm_ms
ORDER BY user_id, session_idx
"""


LATE_DELAY_MS = 30 * 60 * 1000  # withWatermark("ts", "30 minutes")
_JAN1_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_LATE_BUCKET_US = 648_000 * 1_000_000  # absolute 7.5-day arrival buckets
_LATE_MARGIN_US = 4 * 3600 * 1_000_000  # straggler exclusion margin


def ev_stream_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-DATA OBSERVABILITY: per finalized event-time window, how
    many rows the watermark admitted vs dropped — the audit every
    production pipeline runs next to its watermarked aggs (the drop
    semantics were only test-pinned before; this puts them under the
    driver's value oracle).

    A replayable OUT-OF-ORDER stream: events bucket into four absolute
    7.5-day arrival batches (an absolute-time expression, never
    dayofmonth, so staging stays monotone on any horizon); 'straggler'
    rows (event_id % 17 == 0) arrive TWO batches late.  The stream
    runs a real watermarked hourly tumbling count in append mode (one
    file per trigger, mtime-pinned order); the audit joins its
    admitted counts against the staged totals.

    Determinism under Spark's RACY watermark plumbing (pinned
    empirically this round, /tmp-repro series): the late-row filter
    applies the committed watermark with a ONE-OR-TWO-batch lag
    (observed both on identical input), and filters on the row's
    WINDOW END, not its timestamp.  The design makes every row's fate
    invariant under lag ∈ {1,2} × rule ∈ {ts, window-end}: a kept
    straggler satisfies hour_end(ts) ≤ (on-time running max of its
    origin bucket, ms floor) − delay — enforced by EXCLUDING stragglers
    within 4 h of their bucket end (data-verified: min slack ≈ 3.8 h at
    sf0.1, window 1 h + delay 0.5 h) — so it drops under every variant,
    while on-time rows always sit above any candidate watermark.  The
    oracle therefore states the invariant outcome: kept stragglers
    drop, on-time rows admit, and a window emits iff it has an
    admitted row and its end ≤ final watermark (global max event ms −
    delay).

    The watermarked windowed aggregate's state runs through the
    ROCKSDB provider (`session.rocksdb_state`) — the deployable 100 TB
    state store — so the gated row verifies the production
    configuration (provider spy assertion in tests/test_streaming.py)."""
    import os
    import shutil

    from spark_tensors_spark import session as _session
    from spark_tensors_spark.streaming.sinks import write_idempotent_batch

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_late_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    try:
        us = F.unix_micros(F.col("ts"))
        straggler = F.col("event_id") % 17 == 0
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") % 25 == 1)
            .filter(
                ~(
                    straggler
                    & (
                        (us - _JAN1_US) % _LATE_BUCKET_US
                        >= _LATE_BUCKET_US - _LATE_MARGIN_US
                    )
                )
            )
            .select("event_id", "user_id", "ts")
        )
        batch_col = (
            F.expr(f"(unix_micros(ts) - {_JAN1_US}) div {_LATE_BUCKET_US}")
            + F.when(straggler, F.lit(2)).otherwise(F.lit(0))
        )
        staged = ev.withColumn("_b", batch_col).persist()
        # loud guard on the staging assumption instead of a silent cap:
        # every row must land in one of the 6 staged arrival batches
        # (data before the Jan-1 anchor or past the 30-day horizon
        # would otherwise be counted in totals but never streamed)
        rng = staged.agg(
            F.min("_b").alias("lo"), F.max("_b").alias("hi")
        ).first()
        if rng["lo"] is not None and (rng["lo"] < 0 or rng["hi"] > 5):
            raise ValueError(
                "ev_stream_late_audit: events horizon falls outside the "
                f"staged bucket range 0..5 (got {rng['lo']}..{rng['hi']}); "
                "adjust _JAN1_US/_LATE_BUCKET_US for this dataset"
            )
        src = os.path.join(root, "src")
        for b in range(6):
            staged.filter(F.col("_b") == b).drop("_b").coalesce(
                1
            ).write.parquet(os.path.join(src, f"p{b}"))
        # file source orders micro-batches by modification time
        for i in range(6):
            part = os.path.join(src, f"p{i}")
            for f in os.listdir(part):
                os.utime(os.path.join(part, f),
                         (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema("event_id long, user_id long, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        admitted = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_admitted"))
            .select(F.col("w.start").alias("hour_ts"), "n_admitted")
        )
        out_dir = os.path.join(root, "out")
        with _session.rocksdb_state(spark), stream_state_partitions(spark):
            q = (
                admitted.writeStream.outputMode("append")
                .foreachBatch(
                    lambda bdf, bid: write_idempotent_batch(
                        bdf, bid, out_dir
                    )
                )
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        got = spark.read.parquet(out_dir).drop("_batch_id")
        totals = staged.groupBy(
            F.date_trunc("hour", "ts").alias("hour_ts")
        ).agg(F.count(F.lit(1)).alias("n_total"))
        out = (
            got.join(totals, "hour_ts")
            .select(
                "hour_ts",
                "n_total",
                "n_admitted",
                (F.col("n_total") - F.col("n_admitted")).alias("n_dropped"),
            )
            .orderBy("hour_ts")
            .localCheckpoint()
        )
        staged.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


EV_STREAM_LATE_AUDIT_SQL = f"""
WITH src AS (
    SELECT event_id, user_id, ts,
           CAST(epoch_us(ts) AS BIGINT) AS us,
           event_id % 17 = 0 AS straggler
    FROM events WHERE user_id % 25 = 1
),
kept AS MATERIALIZED (
    SELECT * FROM src
    WHERE NOT (straggler AND (us - {_JAN1_US}) % {_LATE_BUCKET_US}
                             >= {_LATE_BUCKET_US} - {_LATE_MARGIN_US})
),
-- final committed watermark: global max event ms (floor) − delay;
-- dropped rows still feed the max (the watermark node observes rows
-- before the stateful operator filters them)
finwm AS (
    SELECT (MAX(us) // 1000 - {LATE_DELAY_MS}) * 1000 AS wm_us FROM kept
),
tot AS (
    SELECT date_trunc('hour', ts) AS hour_ts,
           COUNT(*) AS n_total,
           SUM(CASE WHEN straggler THEN 1 ELSE 0 END) AS n_drop
    FROM kept GROUP BY 1
)
SELECT hour_ts,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(n_total - n_drop AS BIGINT) AS n_admitted,
       CAST(n_drop AS BIGINT) AS n_dropped
FROM tot CROSS JOIN finwm
WHERE n_total - n_drop > 0
  AND epoch_us(hour_ts) + 3600000000 <= wm_us
ORDER BY hour_ts
"""


def ev_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply (`streaming/cdc.py`): a REAL readStream
    over the events table feeds `foreachBatch` micro-batches into the
    snapshot-versioned SCD1 MERGE (`operators/merge`), keyed per user
    with latest-wins by (ts, event_id) and `event_type='error'` rows
    acting as DELETE markers — the Kafka-upserts-to-warehouse-table
    pattern.  One availableNow batch over the single source file, so
    the final table state is deterministic and the oracle can state it
    as one window: each sampled user's latest event, users whose
    latest event is an error deleted.  Multi-batch sequencing and
    post-crash batch replay idempotence are pinned in
    tests/test_streaming_cdc.py."""
    import os
    import shutil

    from pyspark.sql import types as T

    from spark_tensors_spark.operators.merge import read_merged
    from spark_tensors_spark.streaming.cdc import (
        streaming_merge_into_parquet,
    )

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        "spark-warehouse",
        "_sinks",
        f"stream_merge_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(sf_dir, "events.parquet")
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        ts_type = schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        updates = stream.filter(F.col("user_id") % 7 == 0).select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            "ts",
            (F.col("event_type") == "error").alias("is_delete"),
        )
        with stream_state_partitions(spark):
            q = streaming_merge_into_parquet(
                updates,
                table_path=os.path.join(root, "table"),
                checkpoint_dir=os.path.join(root, "ckpt"),
                key_cols=["user_id"],
                order_col="ts",
                delete_col="is_delete",
            )
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    state = read_merged(spark, os.path.join(root, "table"))
    out = (
        state.select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
        .orderBy("user_id")
        .localCheckpoint()
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


# the merge window's tie-break: order_col (ts) DESC, then the
# remaining update columns ascending in frame column order — event_id
# is globally unique, so (ts DESC, event_id) is already total
EV_STREAM_MERGE_SQL = """
WITH updates AS (
    SELECT user_id, event_id, event_type, value, ts,
           event_type = 'error' AS is_delete,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id
           ) AS rn
    FROM events
    WHERE user_id % 7 = 0
)
SELECT user_id, event_id, event_type, value,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us
FROM updates
WHERE rn = 1 AND NOT is_delete
ORDER BY user_id
"""


EV_STREAM_SESSIONIZE_SQL = """
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                     > 300 * 1000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WHERE user_id % 25 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
labeled AS (
    SELECT user_id, event_id, ts,
           CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS session_idx
    FROM flagged
)
SELECT user_id, session_idx,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_us
FROM labeled
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


QUERIES = {
    "ev_stream_mv_daily": ev_stream_mv_daily,
    "ev_stream_join_view": ev_stream_join_view,
    "ev_stream_scd2": ev_stream_scd2,
    "ev_stream_quantile": ev_stream_quantile,
    "ev_props_variant_stats": ev_props_variant_stats,
    "ev_stream_enrich": ev_stream_enrich,
    "ev_stream_session_ttl": ev_stream_session_ttl,
    "ev_stream_merge": ev_stream_merge,
    "ev_stream_late_audit": ev_stream_late_audit,
    "ev_stream_sessionize": ev_stream_sessionize,
    "emb_stream_ivf_assign": emb_stream_ivf_assign,
    "ev_stream_hll_hourly": ev_stream_hll_hourly,
    "ev_stream_kmv_distinct": ev_stream_kmv_distinct,
    "ev_stream_cms_top_users": ev_stream_cms_top_users,
    "doc_stream_dedup": doc_stream_dedup,
    "ev_tumbling_hour": ev_tumbling_hour,
    "ev_sink_roundtrip": ev_sink_roundtrip,
    "ev_props_json_stats": ev_props_json_stats,
    "ev_sliding_30m_15m": ev_sliding_30m_15m,
    "ev_session_5m": ev_session_5m,
    "ev_dedup_keys": ev_dedup_keys,
    "ev_running_user_totals": ev_running_user_totals,
    "ev_last3_per_user": ev_last3_per_user,
}

# ev_stream_scd2 / ev_stream_quantile SHARE the batch oracles
# (stream == batch is the claim)
from spark_tensors_spark.queries.temporal_queries import (  # noqa: E402
    _EV_QUANTILE_SKETCH_SQL as _EV_STREAM_QUANTILE_SQL,
    EV_SCD2_USER_STATE_SQL as _EV_STREAM_SCD2_SQL,
)

ORACLES = {
    "ev_stream_mv_daily": EV_STREAM_MV_DAILY_SQL,
    "ev_stream_join_view": EV_STREAM_JOIN_VIEW_SQL,
    "ev_stream_scd2": _EV_STREAM_SCD2_SQL,
    "ev_stream_quantile": _EV_STREAM_QUANTILE_SQL,
    "ev_props_variant_stats": EV_PROPS_VARIANT_STATS_SQL,
    "ev_stream_enrich": EV_STREAM_ENRICH_SQL,
    "ev_stream_session_ttl": EV_STREAM_SESSION_TTL_SQL,
    "ev_stream_merge": EV_STREAM_MERGE_SQL,
    "ev_stream_late_audit": EV_STREAM_LATE_AUDIT_SQL,
    "ev_stream_sessionize": EV_STREAM_SESSIONIZE_SQL,
    "emb_stream_ivf_assign": _stream_ivf_assign_oracle(),
    "ev_stream_hll_hourly": _stream_hll_hourly_oracle(),
    "ev_stream_kmv_distinct": _stream_kmv_distinct_oracle(),
    "ev_stream_cms_top_users": _stream_cms_top_users_oracle(),
    "doc_stream_dedup": _doc_stream_dedup_oracle(),
    "ev_sink_roundtrip": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
               CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
                   AS w_end,
               event_type, COUNT(*) AS c, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY w_start, event_type
    """,
    "ev_tumbling_hour": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
               CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
                   AS w_end,
               event_type, COUNT(*) AS c, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
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
               user_id, COUNT(*) AS c, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM y
        GROUP BY user_id, grp
        ORDER BY user_id, w_start
    """,
    "ev_dedup_keys": """
        SELECT COUNT(*) AS c
        FROM (SELECT DISTINCT user_id, event_type FROM events) t
    """,
    "ev_running_user_totals": """
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
               MAX(epoch_us(ts)) AS last_ts_us
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "ev_last3_per_user": """
        SELECT user_id, CAST(rk AS INT) AS rk, epoch_us(ts) AS ts_us,
               event_id
        FROM (SELECT user_id, ts, event_id,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC)
                         AS rk
              FROM events) t
        WHERE rk <= 3
        ORDER BY user_id, rk
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
