from mongo2pq_spark.plans.pipeline import extract_load_collection

__all__ = ["extract_load_collection"]
