"""Bucketed storage (SURVEY §4 / north-star: "bucketing for co-located
joins").

`write_bucketed` persists a DataFrame hash-bucketed and sorted by the
join key; `read_bucketed` reads it back as a table whose bucketing
metadata Catalyst uses to plan **exchange-free** joins and
aggregations on that key.  At 100 TB this converts every recurring
join against the table (e.g. encoded triples ⋈ embeddings per epoch,
fact ⋈ fact co-joins) from a full shuffle of both sides into a local
zip of pre-sorted buckets — the single biggest recurring-shuffle saver
Spark offers, and it needs no custom partitioner (the reference's
`ThreeWayTensorPartitioner`, `rdfio.py:12-35`, is this feature
hand-rolled for RDDs and left unfinished).

tests/test_bucketed.py proves the property from the physical plan: the
bucketed-side `Exchange` disappears (`SortMergeJoin` reads buckets
directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed+sorted managed table (parquet)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
