"""Streaming classifier refresh: a LANDING directory where labeled
document waves arrive continuously as parquet drops, tailed as a
Structured Streaming file source — each microbatch folds its docs
into the persisted Naive Bayes count store, so the corpus classifier
stays fresh per arrival wave instead of per full retrain.

Composition, not custom machinery: Spark's file streaming source owns
exactly-once new-file tracking (its seen-files log), and the count
store's ingest is already batch-keyed overwrite (a replayed batch
REPLACES itself — ``operators/classifier.py::ingest_nb_counts``), so
streaming NB ingestion is exactly-once end to end across crashes by
composing the two: the stream names each microbatch's store batch
after the deterministic streaming batch id.

Scale shape: each arriving wave is tokenized ONCE, on executors, in
the microbatch that first sees it (NB sufficient statistics are
additive — the O(increment) contract); the store holds bounded count
tables, never corpus text; model rebuild is two groupBy-sums over the
store. At warehouse scale the landing tree is a shared-filesystem
prefix and ``maxFilesPerTrigger`` bounds per-batch work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_streaming_nb_ingest(
    spark: SparkSession,
    landing_dir: str,
    landing_schema: str,
    store_dir: str,
    checkpoint_dir: str,
    label_col: str,
    text_col: str = "text",
    hash_buckets: int | None = None,
    max_files_per_trigger: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Tail ``landing_dir`` (recursively) for parquet document drops,
    fold each microbatch into the NB count store at ``store_dir``,
    and return the rebuilt ``(model, priors)`` after draining
    everything currently available.

    Restarting with the same checkpoint resumes the file-source log
    (already-seen files are never re-counted); a replayed microbatch
    re-writes its own ``batch=stream-<id>`` partition with overwrite
    (never double-counts). ``landing_schema`` is explicit because
    file stream sources cannot infer schemas — pass the landing
    contract, not a sample read, so a malformed drop fails loud."""
    stream = (
        spark.readStream.schema(landing_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("recursiveFileLookup", "true")
        .parquet(landing_dir)
        .select(label_col, text_col)
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        from mongo2pq_spark.operators.classifier import ingest_nb_counts

        ingest_nb_counts(
            batch_df,
            store_dir,
            f"stream-{batch_id}",
            label_col,
            text_col=text_col,
            hash_buckets=hash_buckets,
        )

    query = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    from mongo2pq_spark.operators.classifier import load_nb_model

    return load_nb_model(
        spark, store_dir, label_col, hash_buckets=hash_buckets
    )
