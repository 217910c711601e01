"""Scalar (int8) embedding quantization — the storage-efficiency
counterpart to PQ (`pipeline/pq.py`): 4× smaller vectors with one
codegen projection, no training step.

Per vector: ``scale = max|v| / 127``; ``code_i = round(v_i·127 /
max|v|)`` clamped to [-127, 127] (the element attaining max|v| maps to
±127 exactly).  Zero vectors quantize to all-zero codes with scale 0.

Scale shape: a pure scan-side projection (higher-order array
functions, whole-stage codegen, no shuffle, no Python) — at 100 TB
this runs at parquet-scan speed and cuts the embedding column 4×.
Dequantization is ``code_i · scale``; the roundtrip error is bounded
by scale/2 per component (pinned in tests/test_quantize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scalar_quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, scale double, codes array<int>) — int8-range codes."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    code = lambda x: F.when(  # noqa: E731
        maxabs == 0.0, F.lit(0)
    ).otherwise(
        F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.round(x * 127.0 / maxabs).cast("int"),
            ),
        )
    )
    return emb.select(
        F.col(id_col),
        (maxabs / 127.0).alias("scale"),
        F.transform(v, code).alias("codes"),
    )
