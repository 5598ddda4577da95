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
the DATA (band-store partitions ``batch_k < offset + k``), not by
wall-clock trigger order, so a replayed/recovered batch recomputes the
identical flags (its store partitions are overwritten, never
appended). A document is flagged near-dup iff it shares ≥1 MinHash
band with a document of an earlier batch (any earlier increment
included), or with a lower-id document of its own batch — the
dup-FLAGGING semantics (every document's bands enter the index
regardless of flag), which keeps the rule non-iterative and exactly
SQL-expressible for the oracle.

Multi-increment contract: each call with a persistent ``store_dir``
is one INCREMENT over the NEW documents only (same contract as the
batch ``dedup_incremental_*`` APIs — never re-feed already-ingested
docs). An increment gets a run-unique stage + checkpoint directory
(Spark's FileStreamSource keys its seen-files map by path, so reusing
one stage dir would silently process zero new files), and its batches
get GLOBAL sequence numbers ``batch_k = offset + k`` where ``offset``
is persisted in a run manifest BEFORE any data is written — so a
crashed increment resumes with its original offset and overwrites its
own partitions, never a prior increment's. Manifest allocation and
the compaction swap protocol are the shared audited core in
``plans/bandstore_core.py`` (also backing the batch EL store).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2pq_spark.plans.bandstore_core import (
    RunLog,
    data_partition_dirs,
    recover_replace,
    replace_dir,
)


def _stage_batches(
    spark: SparkSession, documents_path: str, stage_dir: str,
    n_batches: int, id_col: str = "doc_id",
) -> None:
    """Split the table into one parquet file per batch key
    (``id_col % n_batches``) with ascending mtimes, so the file stream
    replays them as ordered micro-batches. Files that already exist
    (a resumed increment) are left untouched — the checkpoint's
    seen-files map is path-keyed, and the pinned mtimes keep the
    (mtime, path) processing order stable across the resume."""
    docs = spark.read.parquet(documents_path)
    os.makedirs(stage_dir, exist_ok=True)
    base = 1_700_000_000
    for k in range(n_batches):
        dst = os.path.join(stage_dir, f"batch_{k}.parquet")
        if os.path.exists(dst):
            continue
        part_dir = os.path.join(stage_dir, f"_build_{k}")
        (
            docs.filter(F.col(id_col) % n_batches == k)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(part_dir)
        )
        data = [
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        ][0]
        src = os.path.join(part_dir, data)
        # pin the mtime BEFORE the move (a same-filesystem rename
        # preserves it): a crash can then never leave a staged file
        # with a wall-clock mtime that would reorder the (mtime, path)
        # replay on resume — the file is either absent or fully pinned
        os.utime(src, (base + k, base + k))
        shutil.move(src, dst)
        shutil.rmtree(part_dir, ignore_errors=True)


def _begin_increment(
    store_dir: str, n_batches: int, documents_path: str = ""
) -> tuple[str, int, int]:
    """Allocate (or resume) this increment's run: returns
    ``(run_id, offset, n_batches)``. Thin wrapper over the shared
    ``RunLog.begin_numbered`` (manifest written atomically BEFORE any
    staging or store write, crashed increments resumed with their
    ORIGINAL parameters, numeric run-id ordering — see
    ``plans/bandstore_core.py``). The ``.done`` marker lands in
    ``run_streaming_near_dedup`` only after the stream drains; the
    flags are data-defined, so a resumed recomputation is identical.
    At warehouse scale this manifest is a catalog transaction / MERGE
    boundary; the shape is identical."""
    return RunLog(os.path.join(store_dir, "runs")).begin_numbered(
        n_batches, documents_path
    )


def make_near_dedup_batch(store_dir: str, n_batches: int, offset: int = 0):
    """``foreachBatch`` body: flag near-dups vs the band store, then
    append this batch's bands — both written as
    ``batch_k=<offset + k>`` partition overwrites (idempotent under
    replay, collision-free across increments)."""
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
        seq = offset + k
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
        # cross-batch rule: collides with ANY band of sequence < seq
        # (earlier batches of this increment AND every prior
        # increment) — probed from the store's own partitions, so
        # replay is exact. Explicit existence check, not try/except: a
        # real read error must fail the batch (silently treating it as
        # "empty store" would mass-unflag duplicates). At warehouse
        # scale this becomes a catalog table-exists check / MERGE
        # source.
        has_store = bool(
            data_partition_dirs(Path(bands_dir), prefix="batch_k=")
        )
        if has_store:
            index = (
                spark.read.option("basePath", bands_dir)
                .parquet(bands_dir)
                .filter(F.col("batch_k") < seq)
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
            os.path.join(flags_dir, f"batch_k={seq}")
        )
        bands.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch_k={seq}")
        )

    return body


def _recover_band_store_swap(store_dir: str) -> None:
    """Finish a compaction swap interrupted at any crash window — the
    shared ``recover_replace`` protocol (write-aside build →
    complete-by-naming swap-in → ``.old`` rollback). A crash between
    the swap renames would otherwise leave NO bands directory, which
    the batch probe would silently read as an empty store and
    mass-unflag duplicates, so every entry point (compaction and
    increment start) runs this first.

    Pre-unification stores used the names ``bands_swapin``/
    ``bands_old``; a store crashed mid-swap under THOSE names must not
    become unrecoverable after an upgrade (silent mass-unflag), so
    they are migrated to the shared names before recovery runs."""
    from mongo2pq_spark.plans.bandstore_core import aux_path

    bands = Path(store_dir) / "bands"
    for legacy, kind in (("bands_swapin", "swapin"), ("bands_old", "old")):
        legacy_dir = Path(store_dir) / legacy
        target = aux_path(bands, kind)
        if legacy_dir.is_dir() and not target.exists():
            os.rename(legacy_dir, target)
    recover_replace(bands)


def compact_band_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the persisted band index so year-long ingestion doesn't
    grow it without bound (~3 band rows/doc forever).

    Future flags depend ONLY on whether some (band_id, band_hash)
    exists with ``batch_k < seq`` — so keeping, per distinct
    (band_id, band_hash), the single row with the MINIMAL batch_k
    (min doc_id among ties, for determinism) preserves every future
    probe's answer exactly while dropping all later re-occurrences of
    a band (in a dup-heavy corpus, most of the store). The rewrite
    stays partitioned by batch_k so subsequent increments keep
    appending new partitions; it is one shuffle on the (band_id,
    band_hash) key over the band store — never the corpus — and is
    swapped in via the shared crash-safe ``replace_dir`` protocol
    (recovery at every entry point via ``_recover_band_store_swap``).
    At warehouse scale this is the MERGE/OPTIMIZE maintenance job run
    between increments; only run it with no increment in flight."""
    _recover_band_store_swap(store_dir)
    bands_dir = os.path.join(store_dir, "bands")
    if not os.path.isdir(bands_dir):
        return
    compacted = (
        spark.read.option("basePath", bands_dir)
        .parquet(bands_dir)
        .groupBy("band_id", "band_hash")
        .agg(
            F.min(F.struct("batch_k", "doc_id")).alias("first"),
        )
        .select(
            F.col("first.doc_id").alias("doc_id"),
            "band_id",
            "band_hash",
            F.col("first.batch_k").alias("batch_k"),
        )
    )
    replace_dir(
        Path(bands_dir),
        lambda build: compacted.write.mode("overwrite")
        .partitionBy("batch_k")
        .parquet(build),
    )


def run_streaming_near_dedup(
    spark: SparkSession,
    documents_path: str,
    n_batches: int = 4,
    store_dir: str | None = None,
    driver_collect_ok: bool = False,
) -> DataFrame:
    """Drive the continuous near-dedup pipeline over the documents
    table replayed as ``n_batches`` ordered micro-batches; returns the
    per-document flag table ``(doc_id, batch_k, is_dup)`` covering
    EVERY increment ingested into the store so far.

    With ``store_dir=None`` (test/demo convenience) the flags are
    materialized driver-side before the temp store is deleted — a
    collect bounded by the corpus's DOC COUNT (three narrow columns),
    same contract as ``run_foreach_batch_upsert``. A real deployment
    passes a persistent ``store_dir`` and gets the lazy store-backed
    DataFrame — nothing through the driver, and the band store + flag
    history survive so the NEXT call (with only the new documents as
    ``documents_path``) dedups the new increment against everything
    before it. Each increment stages into a run-unique directory and
    gets a fresh checkpoint (see module docstring); an increment
    interrupted by a crash is resumed — with its original offset and
    batch count — by simply calling again before starting new work.

    ``store_dir=None`` additionally requires ``driver_collect_ok=True``
    (verdict r12 #9): the convenience funnels every flag row through
    the driver, which is fine for a bounded test/verification corpus
    and catastrophic wired into a production pipeline by accident —
    the flag makes that wiring a loud error instead."""
    cleanup = store_dir is None
    if cleanup and not driver_collect_ok:
        raise ValueError(
            "store_dir=None collects the whole flag table driver-side "
            "and deletes the store — a test/verification convenience. "
            "Pass a persistent store_dir (production), or opt in "
            "explicitly with driver_collect_ok=True on a corpus you "
            "know is driver-bounded."
        )
    if store_dir is None:
        store_dir = tempfile.mkdtemp(prefix="stream_neardedup_")
    _recover_band_store_swap(store_dir)
    run_id, offset, n_batches = _begin_increment(
        store_dir, n_batches, documents_path
    )
    stage_dir = os.path.join(store_dir, f"stage_{run_id}")
    ckpt_dir = os.path.join(store_dir, f"ckpt_{run_id}")
    runs_dir = os.path.join(store_dir, "runs")
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
                make_near_dedup_batch(store_dir, n_batches, offset)
            )
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        RunLog(runs_dir).mark_done(run_id)
        # the staged corpus copy and the checkpoint are only needed
        # while the increment is un-done; dropping them here keeps a
        # persistent store's footprint at bands+flags (the module
        # contract: the store is the corpus's only trace) instead of
        # accumulating a full duplicate of every increment's text
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
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


def make_hamming_dedup_batch(
    store_dir: str,
    n_batches: int,
    offset: int,
    fingerprint_fn,
    max_hamming: int = 3,
    bits: int = 60,
    max_band_bucket: int = 100_000,
):
    """``foreachBatch`` body for FINGERPRINTED content — the streaming
    face of ``operators/dedup.py::hamming_incremental_new``, serving
    every fingerprint modality (text simhash, image dHash, audio
    envelope) through one code path: fingerprint ONLY this batch's
    rows, flag each doc whose fingerprint lies within ``max_hamming``
    of any EARLIER-batch fingerprint (any prior increment included)
    or a lower-id same-batch one, then append this batch's banded
    fingerprints as a ``batch_k=<offset + k>`` partition overwrite
    (idempotent under replay, exactly the MinHash store's contract).

    The store keeps (doc_id, fp, band_id, band_value) — four small
    ints per (doc, band); content is never stored or re-read. The
    cross-batch probe is an equi-join of this batch's bands against
    the store's bands plus an exact popcount verify: the banding is
    pigeonhole-complete for ≤ max_hamming, so (modulo the degenerate-
    bucket cap, which only ever UNDER-flags) the flag rule is exactly
    "∃ earlier doc at Hamming ≤ max_hamming" — non-iterative and
    SQL-expressible for the oracle."""
    from mongo2pq_spark.operators.dedup import _hamming_band_table

    bands_dir = os.path.join(store_dir, "bands")
    flags_dir = os.path.join(store_dir, "flags")

    def body(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        k = batch_df.select(
            (F.col("doc_id") % n_batches).alias("k")
        ).first()["k"]
        seq = offset + k
        fp = fingerprint_fn(batch_df)
        extra = [c for c in fp.columns if c != "doc_id"]
        if len(extra) != 1:
            # silently picking "the first" of several columns would
            # bind the wrong fingerprint and mass-mis-flag
            raise ValueError(
                "fingerprint_fn must return exactly (doc_id, <fp>); "
                f"got columns {fp.columns}"
            )
        hash_col = extra[0]
        banded = _hamming_band_table(
            fp, hash_col, "doc_id", max_hamming, bits, max_band_bucket
        ).select(
            "doc_id", F.col(hash_col).alias("fp"), "band_id", "band_value"
        )

        ham = F.bit_count(F.col("fp").bitwiseXOR(F.col("other_fp")))
        a = banded.select(
            "band_id", "band_value", F.col("doc_id").alias("hi"),
            F.col("fp"),
        )
        b = banded.select(
            "band_id", "band_value", F.col("doc_id").alias("lo"),
            F.col("fp").alias("other_fp"),
        )
        intra = (
            a.join(b, ["band_id", "band_value"])
            .filter(F.col("lo") < F.col("hi"))
            .filter(ham <= max_hamming)
            .select(F.col("hi").alias("doc_id"))
            .distinct()
        )
        has_store = bool(
            data_partition_dirs(Path(bands_dir), prefix="batch_k=")
        )
        if has_store:
            index = (
                spark.read.option("basePath", bands_dir)
                .parquet(bands_dir)
                .filter(F.col("batch_k") < seq)
                .select(
                    "band_id", "band_value",
                    F.col("fp").alias("other_fp"),
                )
            )
            inter = (
                banded.join(index, ["band_id", "band_value"])
                .filter(ham <= max_hamming)
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
            os.path.join(flags_dir, f"batch_k={seq}")
        )
        banded.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"batch_k={seq}")
        )

    return body


def compact_hamming_store(spark: SparkSession, store_dir: str) -> None:
    """Compaction for the Hamming band store: future probes verify by
    exact popcount against ``fp``, so the preservation key is the full
    (band_id, band_value, fp) triple — keep each triple's minimal
    (batch_k, doc_id) row and every future flag is unchanged while
    re-occurrences of the same fingerprint's band (the bulk of a
    dup-heavy stream) are dropped. Same crash-safe swap protocol as
    the MinHash store."""
    _recover_band_store_swap(store_dir)
    bands_dir = os.path.join(store_dir, "bands")
    if not os.path.isdir(bands_dir):
        return
    compacted = (
        spark.read.option("basePath", bands_dir)
        .parquet(bands_dir)
        .groupBy("band_id", "band_value", "fp")
        .agg(F.min(F.struct("batch_k", "doc_id")).alias("first"))
        .select(
            F.col("first.doc_id").alias("doc_id"),
            "fp",
            "band_id",
            "band_value",
            F.col("first.batch_k").alias("batch_k"),
        )
    )
    replace_dir(
        Path(bands_dir),
        lambda build: compacted.write.mode("overwrite")
        .partitionBy("batch_k")
        .parquet(build),
    )


def run_streaming_hamming_dedup(
    spark: SparkSession,
    documents_path: str,
    fingerprint_fn,
    n_batches: int = 4,
    store_dir: str | None = None,
    max_hamming: int = 3,
    bits: int = 60,
    driver_collect_ok: bool = False,
) -> DataFrame:
    """Drive continuous fingerprint near-dedup over the table at
    ``documents_path`` replayed as ``n_batches`` ordered micro-batches
    (same staging/manifest/crash contracts as
    ``run_streaming_near_dedup`` — shared helpers, shared RunLog,
    including the ``driver_collect_ok`` gate on ``store_dir=None``);
    returns ``(doc_id, batch_k, is_dup)`` for every increment ingested
    so far. ``fingerprint_fn`` maps a batch DataFrame to
    (doc_id, <fp column>) — ``simhash_fingerprints`` for text,
    ``image_dhash``/``audio_fingerprint`` over payload tables for
    media; the store and probe are fingerprint-agnostic."""
    cleanup = store_dir is None
    if cleanup and not driver_collect_ok:
        raise ValueError(
            "store_dir=None collects the whole flag table driver-side "
            "and deletes the store — a test/verification convenience. "
            "Pass a persistent store_dir (production), or opt in "
            "explicitly with driver_collect_ok=True on a corpus you "
            "know is driver-bounded."
        )
    if store_dir is None:
        store_dir = tempfile.mkdtemp(prefix="stream_hammingdedup_")
    _recover_band_store_swap(store_dir)
    run_id, offset, n_batches = _begin_increment(
        store_dir, n_batches, documents_path
    )
    stage_dir = os.path.join(store_dir, f"stage_{run_id}")
    ckpt_dir = os.path.join(store_dir, f"ckpt_{run_id}")
    runs_dir = os.path.join(store_dir, "runs")
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
                make_hamming_dedup_batch(
                    store_dir, n_batches, offset, fingerprint_fn,
                    max_hamming, bits,
                )
            )
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        RunLog(runs_dir).mark_done(run_id)
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
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
