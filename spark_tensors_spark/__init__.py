"""spark_tensors_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of SANSA-Stack/Spark-Tensors
(knowledge-graph ingestion, dictionary encoding, tensor materialization,
negative sampling, embedding-model training/scoring/eval) expressed in
idiomatic PySpark (DataFrame / SQL / Catalyst / Arrow pandas UDFs /
Structured Streaming), extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Layout:
    session     SparkSession factory (AQE + Arrow on)
    io          sources/sinks: parquet star schema, N-Triples, TSV triples
    kg          dictionary encode, triple encode, tensor COO, samplers, eval
    functions   numeric kernel library (ccorr/cconv, scores, similarity zoo)
    train       minibatch trainers (TransE / RESCAL / HolE) + optimizers
    pipeline    dedup, similarity search, text analysis, multimodal
    streaming   event-stream operators (windows, watermark, stateful dedup)
    queries     declared oracle queries (SURVEY.md §2.11)
"""

__version__ = "0.1.0"
