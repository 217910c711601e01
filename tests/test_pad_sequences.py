"""F17 padding — keras `pad_sequences` parity (`kge/hole.py:277-285`).

The oracle here is a pure-Python reimplementation of the keras
post/pre semantics (keras itself is absent from the container); the
Spark column expression must match it on every length × mode combo,
including empty arrays and NULLs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from spark_tensors_spark.functions.columns import pad_sequences_col


def _keras_pad(seq, maxlen, value=0, padding="post", truncating="post"):
    s = list(seq)
    if len(s) > maxlen:
        s = s[:maxlen] if truncating == "post" else s[-maxlen:]
    fill = [value] * (maxlen - len(s))
    return s + fill if padding == "post" else fill + s


CASES = [
    [],
    [7],
    [1, 2, 3],
    [1, 2, 3, 4, 5],
    [9, 8, 7, 6, 5, 4, 3, 2],
    [-1, 0, -2, 3, 0],
]


@pytest.mark.parametrize("padding", ["post", "pre"])
@pytest.mark.parametrize("truncating", ["post", "pre"])
@pytest.mark.parametrize("maxlen", [1, 4, 5, 9])
def test_pad_sequences_matches_keras_semantics(
    spark, padding, truncating, maxlen
):
    schema = StructType(
        [
            StructField("i", LongType()),
            StructField("seq", ArrayType(LongType())),
        ]
    )
    df = spark.createDataFrame(list(enumerate(CASES)), schema)
    got = {
        r["i"]: r["padded"]
        for r in df.select(
            "i",
            pad_sequences_col(
                "seq", maxlen, padding=padding, truncating=truncating
            ).alias("padded"),
        ).collect()
    }
    for i, seq in enumerate(CASES):
        want = _keras_pad(seq, maxlen, padding=padding, truncating=truncating)
        assert got[i] == want, (i, seq, padding, truncating, maxlen)
        assert len(got[i]) == maxlen


def test_pad_sequences_null_stays_null(spark):
    schema = StructType([StructField("seq", ArrayType(LongType()))])
    df = spark.createDataFrame([(None,)], schema)
    row = df.select(pad_sequences_col("seq", 3).alias("p")).first()
    assert row["p"] is None


def test_pad_sequences_custom_value_and_validation(spark):
    df = spark.range(1).select(F.array(F.lit(5)).alias("seq"))
    row = df.select(pad_sequences_col("seq", 3, value=-9).alias("p")).first()
    assert row["p"] == [5, -9, -9]
    with pytest.raises(ValueError):
        pad_sequences_col("seq", 0)
    with pytest.raises(ValueError):
        pad_sequences_col("seq", 3, padding="middle")
