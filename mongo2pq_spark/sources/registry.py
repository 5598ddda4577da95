"""Source readers.

Production path is the Spark MongoDB connector (sources/mongo.py);
the test path reads parquet / JSON-lines stand-ins. Either way the
result is a DataFrame, so everything downstream (schema apply, sinks,
operators) is source-agnostic.
"""

from __future__ import annotations

from functools import lru_cache
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
        elif path.endswith((".csv", ".tsv")):
            fmt = "csv"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        # primitivesAsString: deliver raw values and let the engine's
        # own sampler decide types (string speculation, epoch heuristic,
        # int-width fitting) — mirrors the reference seeing raw BSON
        # instead of Spark's JSON inference, which has different rules.
        return spark.read.option("primitivesAsString", "true").json(path)
    if fmt == "csv":
        # all-string delivery for the same reason as JSON: the engine's
        # sampler owns typing (Spark's CSV inferSchema has other rules)
        sep = "\t" if path.endswith(".tsv") else ","
        return (
            spark.read.option("header", "true").option("sep", sep).csv(path)
        )
    raise ValueError(f"unsupported source format {fmt!r}")


def read_sf_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-generated testdata tables, normalizing
    nanosecond-precision parquet timestamps.

    The testdata writes INT64 TIMESTAMP(NANOS), which Spark's parquet
    reader rejects outright (PARQUET_TYPE_ILLEGAL). We flip the legacy
    escape hatch (nanos read as LongType) and rebuild real timestamps
    by truncating to microseconds — exactly what DuckDB's µs TIMESTAMP
    does, so both engines see identical values. Conversion happens in
    the projection (codegen; no extra pass).
    """
    path = f"{sf_dir}/{name}.parquet"
    _ensure_nanos_conf(spark)
    nano_cols = _nano_timestamp_columns(path)
    df = spark.read.parquet(path)
    if not nano_cols:
        return df
    from pyspark.sql import functions as F

    # `div` = exact integer division; a double `/` would round (ns
    # epochs exceed 2^53) and drift ±1µs from DuckDB's truncation.
    return df.select(
        *[
            F.timestamp_micros(F.expr(f"`{c}` div 1000")).alias(c)
            if c in nano_cols
            else F.col(c)
            for c in df.columns
        ]
    )


_NANOS_CONF_SET: set[int] = set()


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Set the nanos escape hatch once per session (repeated conf sets
    go through py4j on every table read otherwise)."""
    key = id(spark.sparkContext)
    if key not in _NANOS_CONF_SET:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _NANOS_CONF_SET.add(key)


@lru_cache(maxsize=256)
def _nano_timestamp_columns(path: str) -> frozenset[str]:
    """Columns stored as timestamp[ns], from the parquet footer
    (driver-side metadata read; cached — testdata files are
    immutable and queries re-read the same tables constantly)."""
    import pyarrow.dataset as ds
    import pyarrow.types as pat

    schema = ds.dataset(path, format="parquet").schema
    return frozenset(
        field.name
        for field in schema
        if pat.is_timestamp(field.type) and field.type.unit == "ns"
    )
