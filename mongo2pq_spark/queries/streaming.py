"""Streaming queries (Structured Streaming over the bounded events
source). A tumbling window over a bounded stream must equal the batch
GROUP BY time_bucket — that equality IS the oracle."""

from __future__ import annotations

from mongo2pq_spark.queries.registry import register
from mongo2pq_spark.streaming.windows import run_tumbling_window_counts


@register(
    "streaming_window_counts",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window counts (file source → window agg "
        "→ memory sink), drained with processAllAvailable; equals the batch "
        "time_bucket aggregate",
)
def streaming_window_counts(spark, sf_dir):
    return run_tumbling_window_counts(spark, f"{sf_dir}/events.parquet")
