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
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_session(
    app_name: str = "spark-tensors-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession with engine defaults applied."""
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
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
