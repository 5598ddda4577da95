"""Streaming tar-shard ingestion: a LANDING directory where
producers (crawlers, upstream export jobs) drop ``shard-*.tar``
files continuously, tailed as a Structured Streaming source — each
microbatch explodes the newly-arrived shards' members through the
real tar parse and appends them to a parquet member manifest.

Composition, not custom machinery: Spark's file streaming source
already owns exactly-once new-file tracking (its seen-files log), so
the stream is ``readStream.format("binaryFile")`` over the landing
tree and the member explode is the SAME ``archive_manifest``
(operators/archives.py) the batch path uses — streaming and batch
ingestion cannot drift apart because they share the parser.

Scale shape: each shard's bytes are read once, on an executor, in
the microbatch that first sees it; the member manifest grows
append-only (doc-level digests, no payloads by default) and is the
joinable index downstream dedup/stats run against. At warehouse
scale the landing tree is an object-store prefix and the manifest a
catalog table; maxFilesPerTrigger bounds per-batch work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_tar_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Tail ``landing_dir`` (recursively) for ``shard-*.tar`` files,
    explode each new shard's members (real tar parse + content
    digests), and append them to the parquet manifest at ``out_dir``;
    returns the manifest DataFrame after draining everything
    currently available. Restarting with the same checkpoint resumes
    the file-source log, and each microbatch lands in a
    ``batch=<id>``-keyed partition written with overwrite — a
    replayed batch overwrites ITSELF, so shard ingestion is
    exactly-once end to end across crashes (the same batch-token
    idempotence the band stores use). The manifest stays at digest
    width (name, bytes, md5); the payloads stay in the shards, which
    remain the storage of record."""
    from mongo2pq_spark.operators.archives import archive_manifest

    stream = (
        spark.readStream.format("binaryFile")
        # file stream sources require an explicit schema; binaryFile's
        # is fixed — this must match it exactly
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "shard-*.tar")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
    )

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        entries = archive_manifest(
            batch_df.select(
                # archive_manifest threads a bigint id column through;
                # member identity here IS the member name, so the id
                # is a placeholder — kept for parser reuse
                F.lit(0).cast("bigint").alias("doc_id"),
                F.col("content").alias("payload"),
            )
        ).select(
            "name",
            F.col("n_bytes").cast("bigint").alias("n_bytes"),
            "content_md5",
        )
        entries.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    query = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame(
            [], "name string, n_bytes bigint, content_md5 string"
        )
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .select("name", "n_bytes", "content_md5")
    )
