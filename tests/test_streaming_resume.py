"""Checkpoint resume: the exactly-once contract of the streaming
parquet sink. A second run against the SAME checkpoint must process
only files that arrived after the first run — nothing re-emitted,
nothing lost. This is the property the availableNow scheduled-ingest
pattern relies on in production.
"""

import os

from pyspark.sql import functions as F


def test_parquet_sink_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    from mongo2pq_spark.sources.registry import read_sf_table

    src = tmp_path / "incoming"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    events = read_sf_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(str(src / "batch_a"))

    schema = first.schema

    def drain_once():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        query = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()

    drain_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    # new data arrives; resume against the SAME checkpoint
    second.coalesce(1).write.mode("overwrite").parquet(str(src / "batch_b"))
    drain_once()

    result = spark.read.parquet(out)
    # batch_a not reprocessed (offsets checkpointed), batch_b fully in
    assert result.count() == events.count()
    assert result.select("event_id").distinct().count() == events.count()
    assert os.path.isdir(ckpt)
