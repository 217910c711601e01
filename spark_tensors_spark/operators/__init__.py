"""Composite operators Spark lacks as built-ins, expressed Spark-first
(single-shuffle window tricks, bucketed range joins) — never via
driver-side loops or row-at-a-time UDFs."""

from spark_tensors_spark.operators.skew import salted_agg  # noqa: F401
from spark_tensors_spark.operators.temporal import (  # noqa: F401
    asof_join,
    bucketed_interval_join,
)
