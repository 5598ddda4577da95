"""mongo2pq_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference EL pipeline
(Rahlir/mongo2pq), plus large-scale training-data-pipeline operators.

Layout:
    schema/     schema model, inference, unification lattice, YAML I/O
    sources/    DataFrame readers (parquet/json test path, MongoDB connector)
    operators/  dedup, similarity, text analysis, multimodal plumbing
    functions/  portable column-expression helpers (hashing, tokens, vectors)
    plans/      extract-load pipeline orchestration
    streaming/  Structured Streaming operators
"""

PROJECT_NAME = "mongo2pq_spark"

__all__ = ["PROJECT_NAME"]
