from mongo2pq_spark.schema.inference import (
    cast_from_string,
    infer_fields_from_rows,
    infer_schema_from_df,
    infer_type,
    is_epoch_timestamp,
)
from mongo2pq_spark.schema.model import Schema
from mongo2pq_spark.schema.types import arrow_to_spark, spark_to_arrow, type_for_alias
from mongo2pq_spark.schema.unify import unify_types
from mongo2pq_spark.schema.yaml_io import dump_schema_to_file, load_schema_from_file

__all__ = [
    "Schema",
    "arrow_to_spark",
    "spark_to_arrow",
    "type_for_alias",
    "unify_types",
    "infer_type",
    "infer_fields_from_rows",
    "infer_schema_from_df",
    "cast_from_string",
    "is_epoch_timestamp",
    "dump_schema_to_file",
    "load_schema_from_file",
]
