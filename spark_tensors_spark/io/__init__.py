from spark_tensors_spark.io.readers import (
    TABLES,
    load_table,
    load_tables,
    read_ntriples,
    read_tsv_triples,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_ntriples",
    "read_tsv_triples",
]
