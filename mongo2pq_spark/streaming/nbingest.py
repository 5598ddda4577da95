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

#: identity marker written INSIDE the checkpoint dir on first use —
#: moves with the checkpoint if it is relocated intact, vanishes with
#: it if it is wiped
_CKPT_ID_NAME = "_M2PQ_CHECKPOINT_ID"
#: the store's pin of the one checkpoint allowed to stream into it
_STORE_CKPT_PIN = "_NB_STREAM_CHECKPOINT.json"


def _checkpoint_identity(checkpoint_dir: str) -> str:
    """Get-or-create the checkpoint's identity: a UUID minted on the
    checkpoint's first use and stored inside it. Batch-id overwrite
    idempotence is only exactly-once while the file-source seen-files
    log and the store evolve TOGETHER; the UUID is how the store can
    tell 'same checkpoint, resumed' from 'new checkpoint, ids
    restarted at 0'."""
    import os
    import uuid

    path = os.path.join(checkpoint_dir, _CKPT_ID_NAME)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            return fh.read().strip()
    os.makedirs(checkpoint_dir, exist_ok=True)
    ident = uuid.uuid4().hex
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(ident)
    os.replace(tmp, path)
    return ident


def _pin_store_checkpoint(store_dir: str, ckpt_id: str) -> None:
    """Create-or-validate the store's checkpoint pin (ADVICE r14):
    stream batch ids are positional, so a wiped/replaced checkpoint
    restarts them at 0 and a new microbatch's batch-keyed overwrite
    would silently REPLACE a different prior batch's counts — and the
    reset seen-files log would re-ingest old files on top. Neither
    failure is detectable from the counts themselves, so the store
    refuses loudly: resume the ORIGINAL checkpoint, or start a fresh
    store."""
    import json
    import os

    path = os.path.join(store_dir, _STORE_CKPT_PIN)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            pinned = json.load(fh)["checkpoint_id"]
        if pinned != ckpt_id:
            raise ValueError(
                f"nb count store at {store_dir} was streamed into by a "
                f"different checkpoint (store pin {pinned}, current "
                f"checkpoint {ckpt_id}): a wiped or replaced checkpoint "
                "restarts batch ids and re-reads landing files, "
                "corrupting the additive counts. Restore the original "
                "checkpoint or start a fresh store."
            )
        return
    os.makedirs(store_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"checkpoint_id": ckpt_id}, fh)
    os.replace(tmp, path)


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
    contract, not a sample read, so a malformed drop fails loud.

    The store is PINNED to this checkpoint's identity on first use
    (``_NB_STREAM_CHECKPOINT.json``): streaming into an existing store
    from a different (e.g. wiped-and-recreated) checkpoint fails loud
    instead of silently corrupting counts — see _pin_store_checkpoint."""
    _pin_store_checkpoint(store_dir, _checkpoint_identity(checkpoint_dir))
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
