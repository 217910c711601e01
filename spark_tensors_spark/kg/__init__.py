from spark_tensors_spark.kg.dictionary import (
    assign_ids,
    build_dictionaries,
    decode_triples,
    encode_triples,
)

__all__ = [
    "assign_ids",
    "build_dictionaries",
    "decode_triples",
    "encode_triples",
]
