"""Streaming incremental near-dedup: continuous corpus ingestion with
a persisted MinHash band index.

Combines the two scale primitives already proven in batch —
``operators/dedup.py::minhash_band_table`` (the persistable
(doc_id, band_id, band_hash) corpus index) and the idempotent
per-partition ``foreachBatch`` store layout
(``streaming/windows.py::make_batch_upsert``) — into the shape a real
100 TB ingestion pipeline runs: documents arrive in micro-batches,
each batch shingles ONLY its own documents, probes the band store for
near-dup collisions against everything ingested before it, records
per-document flags, and appends its own bands to the store. Cost per
batch ∝ batch size; corpus text is never re-read; the store IS the
corpus's only trace (exactly the `dedup_incremental_near_dups`
economics, but continuous).

Determinism contract (what makes this oracle-checkable): documents are
staged into ``n_batches`` files by ``doc_id % n_batches`` with strictly
increasing modification times, and the file stream processes one file
per trigger in (mtime, path) order — so micro-batch k contains exactly
the docs with ``doc_id % n_batches == k``. "Seen before" is defined by
the DATA (band-store partitions ``batch_k < k``), not by wall-clock
trigger order, so a replayed/recovered batch recomputes the identical
flags (its store partitions are overwritten, never appended). A
document is flagged near-dup iff it shares ≥1 MinHash band with a
document of an earlier batch, or with a lower-id document of its own
batch — the dup-FLAGGING semantics (every document's bands enter the
index regardless of flag), which keeps the rule non-iterative and
exactly SQL-expressible for the oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_batches(
    spark: SparkSession, documents_path: str, stage_dir: str, n_batches: int
) -> None:
    """Split the documents table into one parquet file per batch key
    (``doc_id % n_batches``) with ascending mtimes, so the file stream
    replays them as ordered micro-batches."""
    docs = spark.read.parquet(documents_path)
    os.makedirs(stage_dir, exist_ok=True)
    base = 1_700_000_000
    for k in range(n_batches):
        part_dir = os.path.join(stage_dir, f"_build_{k}")
        (
            docs.filter(F.col("doc_id") % n_batches == k)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        data = [
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        ][0]
        dst = os.path.join(stage_dir, f"batch_{k}.parquet")
        shutil.move(os.path.join(part_dir, data), dst)
        shutil.rmtree(part_dir, ignore_errors=True)
        os.utime(dst, (base + k, base + k))


def make_near_dedup_batch(store_dir: str, n_batches: int):
    """``foreachBatch`` body: flag near-dups vs the band store, then
    append this batch's bands — both written as ``batch_k=<k>``
    partition overwrites (idempotent under replay)."""
    from mongo2pq_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures,
    )

    bands_dir = os.path.join(store_dir, "bands")
    flags_dir = os.path.join(store_dir, "flags")

    def body(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # batch key from the DATA: staging puts exactly one
        # doc_id % n_batches class in each file/trigger
        k = batch_df.select(
            (F.col("doc_id") % n_batches).alias("k")
        ).first()["k"]
        bands = minhash_band_table(
            minhash_signatures(batch_df), "doc_id"
        ).select("doc_id", "band_id", "band_hash")

        # within-batch rule: collides with a LOWER id of the same batch
        a = bands.select("band_id", "band_hash", F.col("doc_id").alias("hi"))
        b = bands.select("band_id", "band_hash", F.col("doc_id").alias("lo"))
        intra = (
            a.join(b, ["band_id", "band_hash"])
            .filter(F.col("lo") < F.col("hi"))
            .select(F.col("hi").alias("doc_id"))
            .distinct()
        )
        # cross-batch rule: collides with ANY band of batches < k —
        # probed from the store's own partitions, so replay is exact.
        # Explicit existence check, not try/except: a real read error
        # must fail the batch (silently treating it as "empty store"
        # would mass-unflag duplicates). At warehouse scale this
        # becomes a catalog table-exists check / MERGE source.
        has_store = os.path.isdir(bands_dir) and any(
            e.startswith("batch_k=") for e in os.listdir(bands_dir)
        )
        if has_store:
            index = (
                spark.read.option("basePath", bands_dir)
                .parquet(bands_dir)
                .filter(F.col("batch_k") < k)
                .select("band_id", "band_hash")
                .distinct()
            )
            inter = (
                bands.join(index, ["band_id", "band_hash"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            dup_ids = intra.unionByName(inter).distinct()
        else:
            dup_ids = intra
        flags = batch_df.select("doc_id").join(
            dup_ids.withColumn("is_dup", F.lit(True)), "doc_id", "left"
        ).select(
            "doc_id",
            F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
        )
        flags.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(flags_dir, f"batch_k={k}")
        )
        bands.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch_k={k}")
        )

    return body


def run_streaming_near_dedup(
    spark: SparkSession,
    documents_path: str,
    n_batches: int = 4,
    store_dir: str | None = None,
) -> DataFrame:
    """Drive the continuous near-dedup pipeline over the documents
    table replayed as ``n_batches`` ordered micro-batches; returns the
    per-document flag table ``(doc_id, batch_k, is_dup)``.

    With ``store_dir=None`` (test/demo convenience) the flags are
    materialized driver-side before the temp store is deleted — a
    collect bounded by the corpus's DOC COUNT (three narrow columns),
    same contract as ``run_foreach_batch_upsert``. A real deployment
    passes a persistent ``store_dir`` and gets the lazy store-backed
    DataFrame — nothing through the driver, and the band store + flag
    history survive for the next increment."""
    cleanup = store_dir is None
    if store_dir is None:
        store_dir = tempfile.mkdtemp(prefix="stream_neardedup_")
    stage_dir = os.path.join(store_dir, "stage")
    ckpt_dir = os.path.join(store_dir, "ckpt")
    try:
        _stage_batches(spark, documents_path, stage_dir, n_batches)
        static = spark.read.parquet(
            os.path.join(stage_dir, "batch_0.parquet")
        )
        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage_dir)
        )
        query = (
            stream.writeStream.foreachBatch(
                make_near_dedup_batch(store_dir, n_batches)
            )
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        result = (
            spark.read.option("basePath", os.path.join(store_dir, "flags"))
            .parquet(os.path.join(store_dir, "flags"))
            .select(
                "doc_id",
                F.col("batch_k").cast("bigint").alias("batch_k"),
                "is_dup",
            )
        )
        if cleanup:
            rows = result.collect()
            return spark.createDataFrame(rows, result.schema)
        return result
    finally:
        if cleanup:
            shutil.rmtree(store_dir, ignore_errors=True)
