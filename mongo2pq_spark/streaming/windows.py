"""Structured Streaming operators over the events stream.

The events parquet acts as a bounded file-source stream; the same
windowed aggregations run unchanged against kafka/socket sources in
production. ``processAllAvailable`` drains the source synchronously so
streaming results are testable (and oracle-comparable: a tumbling
window over a bounded stream equals the batch GROUP BY time_bucket).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _as_stream_dir(path: str) -> str:
    """Spark's file stream source requires a directory; stage a
    symlink dir when given a bare parquet file (no data copied)."""
    if os.path.isdir(path):
        return path
    staged = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(os.path.abspath(path), os.path.join(staged, os.path.basename(path)))
    return staged


def run_sliding_window_counts(
    spark: SparkSession,
    events_path: str,
    window_duration: str = "10 minutes",
    slide: str = "5 minutes",
    table_name: str = "streaming_sliding_out",
) -> DataFrame:
    """Sliding-window counts (each event lands in duration/slide
    overlapping windows) via a streaming query; same drain semantics as
    the tumbling variant."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    stream = spark.readStream.schema(static.schema).parquet(_as_stream_dir(events_path))
    if dict(static.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window_duration, slide), "event_type")
        .agg(F.count("*").alias("n"))
    )
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(table_name).select(
        F.col("window.start").alias("window_start"), "event_type", "n"
    )


def run_tumbling_window_counts(
    spark: SparkSession,
    events_path: str,
    window_duration: str = "5 minutes",
    table_name: str = "streaming_window_counts_out",
) -> DataFrame:
    """Tumbling-window event counts via a real streaming query
    (file source → window agg → memory sink), drained to completion."""
    # testdata stores INT64 TIMESTAMP(NANOS): read as long, rebuild µs
    # timestamps (same normalization as sources.registry.read_sf_table)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    stream_dir = _as_stream_dir(events_path)
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    if dict(static.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    stream = stream.withWatermark("ts", "10 minutes")
    agg = (
        stream.groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count("*").alias("n"),
            # decimal sum → exact, order-independent (oracle-identical)
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
    )
    spark.catalog.dropTempView(table_name) if table_name in [
        t.name for t in spark.catalog.listTables()
    ] else None
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(table_name).select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
    )
