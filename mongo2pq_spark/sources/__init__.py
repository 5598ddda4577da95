from mongo2pq_spark.sources.registry import read_table

__all__ = ["read_table"]
