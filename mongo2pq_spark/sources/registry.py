"""Source readers.

Production path is the Spark MongoDB connector (sources/mongo.py);
the test path reads parquet / JSON-lines stand-ins. Either way the
result is a DataFrame, so everything downstream (schema apply, sinks,
operators) is source-agnostic.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path: str | Path, fmt: str | None = None) -> DataFrame:
    """Read one table from a path, inferring the format from the suffix
    when not given. JSON reads disable Spark's native schema inference
    subtleties by loading as-is; the engine's own sampler (schema
    inference, SURVEY O-11) decides final types."""
    path = str(path)
    if fmt is None:
        if path.endswith(".parquet"):
            fmt = "parquet"
        elif path.endswith((".json", ".jsonl", ".ndjson")):
            fmt = "json"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.json(path)
    raise ValueError(f"unsupported source format {fmt!r}")


def read_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Convenience: read one of the driver-generated testdata tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
