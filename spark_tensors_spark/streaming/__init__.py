from spark_tensors_spark.streaming.joins import interval_join
from spark_tensors_spark.streaming.stateful import running_user_totals
from spark_tensors_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    stateful_dedup,
    tumbling_window_agg,
)

__all__ = [
    "interval_join",
    "running_user_totals",
    "session_window_agg",
    "sliding_window_agg",
    "stateful_dedup",
    "tumbling_window_agg",
]
