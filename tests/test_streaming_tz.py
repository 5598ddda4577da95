"""Streaming must share the batch path's UTC session pin.

The testdata's µs isAdjustedToUTC=false parquet timestamps read as
TIMESTAMP_NTZ on Spark 4; both paths cast NTZ→TIMESTAMP, and that cast
re-labels the wall-clock instant under the SESSION timezone. The batch
reader (_ensure_nanos_conf) pins the session to UTC; if the streaming
reader skipped the pin, a non-UTC session this package didn't build
would shift every event time by the zone offset — skewed watermarks and
window boundaries relative to batch results.
"""

from pyspark.sql import functions as F

from mongo2pq_spark.sources import registry
from mongo2pq_spark.sources.registry import read_sf_table
from mongo2pq_spark.streaming.windows import run_tumbling_window_counts


def test_stream_pins_utc_under_foreign_session(spark, sf_dir):
    # batch truth (session already pinned UTC by read_sf_table)
    expected = {
        (r["window_start"], r["event_type"], r["n"])
        for r in read_sf_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
        .collect()
    }

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    # simulate a session this package didn't build: conf memo empty,
    # session timezone non-UTC
    registry._NANOS_CONF_SET.clear()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got_df = run_tumbling_window_counts(
            spark, f"{sf_dir}/events.parquet", table_name="tz_pin_out"
        )
        # opening the stream must have re-pinned UTC
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = {
            (r["window_start"], r["event_type"], r["n"])
            for r in got_df.select("window_start", "event_type", "n").collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        registry._NANOS_CONF_SET.clear()  # let the next read re-pin

    assert got == expected
