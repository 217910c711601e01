from spark_tensors_spark.functions import columns, kernels
from spark_tensors_spark.functions.columns import (
    cosine_col,
    dot_col,
    l1_distance_col,
    l2_distance_col,
    l2_norm_col,
    logistic_loss_col,
    margin_loss_col,
    normalize_col,
)
from spark_tensors_spark.functions.kernels import (
    cconv_udf,
    ccorr_udf,
    hole_udf,
    rescal_udf,
    similarity_udf,
    transe_udf,
)

__all__ = [
    "columns",
    "kernels",
    "cosine_col",
    "dot_col",
    "l1_distance_col",
    "l2_distance_col",
    "l2_norm_col",
    "logistic_loss_col",
    "margin_loss_col",
    "normalize_col",
    "cconv_udf",
    "ccorr_udf",
    "hole_udf",
    "rescal_udf",
    "similarity_udf",
    "transe_udf",
]
