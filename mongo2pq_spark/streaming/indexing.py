"""Streaming retrieval-index maintenance: continuous ingestion keeps
the inverted-index artifact current batch-by-batch.

The batch CLI path (``--inverted-index``) appends one posting batch
per run; this runner is its Structured Streaming face — each
micro-batch indexes ONLY ITSELF into its own ``batch=s<k>`` partition
via ``foreachBatch``, so per-batch cost is proportional to batch size
and earlier postings are never re-read (the store economics every
incremental surface in this engine shares). Idempotency is the
``foreach_batch_upsert`` recipe: the partition is keyed by the
DETERMINISTIC micro-batch id, so a checkpoint replay overwrites its
own output instead of duplicating it — the exactly-once contract for
non-transactional sinks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from mongo2pq_spark.streaming.neardedup import _stage_batches


def run_streaming_index_append(
    spark: SparkSession,
    documents_path: str,
    n_batches: int = 4,
    store_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    finalize=None,
) -> DataFrame:
    """Replay the table at ``documents_path`` as ``n_batches`` ordered
    micro-batches, appending each batch's postings to one shared
    inverted-index store; returns the decoded (term, doc_id, tf)
    postings of the final store, reduced through ``finalize`` (a
    DataFrame→DataFrame callable) when given. Draining the stream must
    leave the store equal to a from-scratch index over the whole table
    — that equality is the registered query's full value oracle.

    With the default ephemeral store the result must outlive the
    cleanup rmtree, so it is materialized on the driver — pass a
    ``finalize`` that AGGREGATES (e.g. the per-term summary) so the
    materialization is vocabulary-bounded, not posting-bounded."""
    from mongo2pq_spark.operators.text import (
        query_postings,
        write_inverted_index,
    )

    cleanup = store_dir is None
    if store_dir is None:
        store_dir = tempfile.mkdtemp(prefix="stream_invindex_")
    stage_dir = os.path.join(store_dir, "stage")
    ckpt_dir = os.path.join(store_dir, "ckpt")
    index_dir = os.path.join(store_dir, "index")
    try:
        _stage_batches(spark, documents_path, stage_dir, n_batches)
        static = spark.read.parquet(
            os.path.join(stage_dir, "batch_0.parquet")
        )

        def index_batch(batch_df, batch_id: int) -> None:
            # batch_id is stable under the checkpoint: a replayed
            # micro-batch overwrites batch=s<id> rather than appending
            # a duplicate — idempotent, hence effectively exactly-once
            write_inverted_index(
                batch_df,
                index_dir,
                id_col=id_col,
                text_col=text_col,
                batch_token=f"s{batch_id}",
            )

        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage_dir)
        )
        query = (
            stream.writeStream.foreachBatch(index_batch)
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        # terms=None decodes the whole index DISTRIBUTED — a driver
        # collect of the vocabulary would be the unbounded-collect
        # anti-pattern this engine bans
        result = query_postings(spark, index_dir, None)
        if finalize is not None:
            result = finalize(result)
        if cleanup:
            rows = result.collect()
            return spark.createDataFrame(rows, result.schema)
        return result
    finally:
        if cleanup:
            shutil.rmtree(store_dir, ignore_errors=True)
