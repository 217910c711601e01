"""SparkSession factory.

The reference hand-rolls contexts (``rdfio.py:86-89`` SparkContext local[4];
``TransE.scala`` none at all).  Here a single factory turns on everything the
engine assumes: AQE (runtime re-planning, auto-broadcast, skew-join
handling), Arrow (vectorized pandas-UDF transfer), and a UTC session
timezone so timestamp semantics match the DuckDB oracle.

Scale notes (100 TB design intent, tested on local[*]):
  - ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
    coalesces post-shuffle partitions to ``advisoryPartitionSizeInBytes``.
  - skew-join splitting is enabled so Zipf-skewed keys (FIXTURES.md A1)
    don't straggle.
  - streaming state store: the default HDFS-backed provider keeps every
    key in executor heap — fine at test scale, a memory cliff at 100 TB
    key cardinality.  ``SPARK_GRAFT_ROCKSDB=1`` (or
    ``rocksdb_state=True``) switches the session to the RocksDB
    provider (state spills to local disk, changelog checkpointing
    keeps commits incremental) — the deployable configuration for the
    stateful streaming suite; tests/test_streaming.py smoke-runs a
    stateful query under it.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def rocksdb_state_conf() -> dict[str, str]:
    """The RocksDB state-store configuration for 100 TB-cardinality
    stateful streaming: per-key state lives off-heap/on-disk in RocksDB
    instead of the default in-heap HashMap provider, and changelog
    checkpointing writes per-batch deltas instead of full snapshots.
    Usable as ``extra_conf`` on any session (it is also applied by
    ``get_session(rocksdb_state=True)`` / ``SPARK_GRAFT_ROCKSDB=1``)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb"
        ".changelogCheckpointing.enabled": "true",
    }


@contextmanager
def rocksdb_state(spark: SparkSession):
    """Run the enclosed streaming query under the RocksDB state-store
    provider on an EXISTING session (the provider is a per-query conf
    read at stream start, so it can be toggled on a shared/driver
    session), restoring the previous conf on exit.  This is how a
    declared query routes its state through the deployable 100 TB
    provider even when the caller (the driver's correctness gate, the
    bench CLI) built the session without ``rocksdb_state=True``."""
    conf = rocksdb_state_conf()
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


DEFAULT_STREAM_SHUFFLE = 8


@contextmanager
def stream_state_partitions(spark: SparkSession, n: int | None = None):
    """Run the enclosed STREAMING query with a state-sized shuffle
    partition count, restoring the session conf on exit.

    Why (guide §2.2/§2.4 applied to micro-batches): a streaming
    micro-batch plan does NOT get AQE partition coalescing — every
    stateful operator materializes exactly
    ``spark.sql.shuffle.partitions`` tasks AND state-store instances
    (each paying open + commit + checkpoint-file overhead) per
    micro-batch, regardless of data volume.  The right partition count
    therefore tracks the STATE size (distinct keys / state bytes), not
    the batch default tuned for table-scale shuffles.  The bench's
    streams carry KB–MB state where ``DEFAULT_STREAM_SHUFFLE``
    partitions already exceed the parallelism the data can use;
    production deployments with 100 TB key cardinality raise
    ``SPARK_GRAFT_STREAM_SHUFFLE`` (the count is pinned into the
    checkpoint at first start, so it is a per-pipeline deploy knob,
    not a hot-tune).  Results are partition-count invariant: grouped
    state, watermarked aggregations and stream-stream joins are exact
    under any hash partitioning."""
    if n is None:
        n = int(
            os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE",
                           DEFAULT_STREAM_SHUFFLE)
        )
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key, None)
    spark.conf.set(key, str(n))
    try:
        yield spark
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def get_session(
    app_name: str = "spark-tensors-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession with engine defaults applied."""
    if rocksdb_state is None:
        rocksdb_state = os.environ.get("SPARK_GRAFT_ROCKSDB", "") == "1"
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if rocksdb_state:
        for k, v in rocksdb_state_conf().items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
