"""Extract-load pipeline: scan → prune/cast/rename projection →
(optionally hive-partitioned) Parquet sink.

Replaces the reference's whole EL phase
(/root/reference/mongo2pq/extract_load.py:13-88): the hand-rolled
distinct-partition discovery, per-partition cursors, adaptive batch
sizing, and asyncio pipelining all collapse into one declarative write —
``df.write.partitionBy(key).parquet(...)`` produces the identical
``key=value/`` hive layout, with partition fan-out executed in parallel
by Spark tasks instead of event-loop tasks.

Scale notes (100 TB): the projection is a single narrow stage (no
shuffle). The partitioned write shuffles once on the partition key so
each task owns whole partition directories — without it, every task
writes a file into every partition (task_count × partition_count small
files). AQE coalesces post-shuffle partitions to the target size.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2pq_spark.schema.model import Schema


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    """Persist a DataFrame hash-bucketed on ``bucket_key``.

    Bucketing pre-shuffles the data ONCE at write time; every later
    join or aggregation on the bucket key reads co-located buckets and
    skips its shuffle entirely (verified by plan test: no Exchange in a
    bucketed⋈bucketed join). This is the 100 TB answer to repeated
    fact-fact joins — pay the shuffle once, reuse it forever.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed previous run can leave an orphan managed location that
    # DROP TABLE doesn't know about; clear it or saveAsTable refuses
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    orphan = Path(warehouse.removeprefix("file:")) / table_name.lower()
    if orphan.exists():
        import shutil

        shutil.rmtree(orphan, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def extract_load_collection(
    df: DataFrame,
    schema: Schema,
    outdir: str | Path,
    partition_key: str | None = None,
    strict_compat: bool = False,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    single_file: bool = False,
    compression: str | None = None,
    metrics: dict | None = None,
    dynamic_partition_overwrite: bool = False,
) -> str:
    """Run the EL pipe for one collection; returns the dataset path
    (``<outdir>/<name>.parquet``, same naming as the reference).

    ``max_records_per_file`` caps output file size (small-file control's
    dual): at 100 TB a single giant partition would otherwise become a
    single giant file per task.

    ``compression`` picks the parquet codec (None = session default,
    snappy). At archival scale ``zstd`` typically cuts storage and scan
    IO 25-40% over snappy for modest extra write CPU — per-write choice
    because hot intermediate datasets and cold corpus storage want
    different trade-offs.

    ``metrics``: pass a dict to receive write-job observation metrics
    (currently ``rows_written``) measured by the write itself — no
    second scan.

    ``dynamic_partition_overwrite``: with ``mode="overwrite"`` and a
    ``partition_key``, only the hive partitions PRESENT IN ``df`` are
    replaced; untouched partitions survive. This is the incremental
    backfill pattern — re-extract one day/segment without rewriting
    (or losing) the rest of a 100 TB dataset.

    ``single_file`` reproduces the reference's exact layout — ONE
    parquet file per collection (extract_load.py:40-45) via
    ``coalesce(1)``. Strictly a small-data compat mode: it serializes
    the write through one task, so it is rejected alongside
    ``partition_key`` and should never be used at scale.
    """
    if single_file and partition_key:
        raise ValueError("single_file is incompatible with partition_key")
    out_path = str(Path(outdir) / f"{schema.name}.parquet")
    projected = schema.apply(df, strict_compat=strict_compat)
    # Observation: rows-written metric piggybacks on the write job
    # itself (zero extra scan) — the Spark answer to the reference's
    # tqdm progress accounting (extract_load.py:24), which needed a
    # separate estimated_document_count round-trip. Read it after the
    # write via `observation.get` (surfaced by the CLI per collection).
    from pyspark.sql import Observation

    observation = Observation(f"el_{schema.name}")
    projected = projected.observe(
        observation, F.count(F.lit(1)).alias("rows_written")
    )
    if single_file:
        projected = projected.coalesce(1)
    if partition_key:
        if partition_key not in projected.columns:
            raise ValueError(
                f"partition key {partition_key!r} not in schema fields"
            )
        # One shuffle on the key co-locates each hive partition's rows.
        projected = projected.repartition(partition_key)
    writer = projected.write.mode(mode)
    if dynamic_partition_overwrite:
        if not partition_key:
            raise ValueError(
                "dynamic_partition_overwrite requires a partition_key"
            )
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_key:
        writer = writer.partitionBy(partition_key)
    writer.parquet(out_path)
    if metrics is not None:
        metrics.update(observation.get)
    return out_path


def compact_partitions(
    spark,
    path: str,
    partition_key: str,
    target_files: int = 1,
) -> list[dict]:
    """Small-file compaction for a hive-partitioned parquet dataset —
    the maintenance operation that keeps a 100 TB lake readable:
    incremental/streaming writers mint a file per task per trigger, and
    a partition holding 10k tiny files costs more in open/footer
    overhead than in data (the classic small-file death). Rewrites
    every partition down to ≤ ``target_files`` files via one shuffle
    keyed on (partition, deterministic row-hash salt) — each (key,
    salt) group lands wholly in one task, so each partition dir gets
    at most ``target_files`` files — then swaps the rewrite in through
    the band stores' audited crash-safe ``replace_dir``: at every
    crash point recovery yields either the complete old or the
    complete new dataset (the source of the rewrite IS the target, and
    it is only renamed aside after the build is complete-by-naming).

    Returns one audit dict per partition: value, files/rows before and
    after. Both the file counts AND the row counts come from parquet
    FOOTER metadata read driver-side — never a data scan: an audit
    that re-read the dataset twice (before and after) would triple the
    I/O of the rewrite it audits.

    Reference has no lake-maintenance surface (it writes once,
    `mongo2pq/extract_load.py`); this extends the EL sink family.
    """
    import pyarrow.parquet as pq

    from mongo2pq_spark.plans.bandstore_core import (
        recover_replace,
        replace_dir,
    )

    root = Path(path)
    recover_replace(root)

    def survey(p: Path) -> dict[str, dict]:
        out = {}
        for d in sorted(p.glob(f"{partition_key}=*")):
            if d.is_dir():
                files = list(d.glob("*.parquet"))
                out[d.name.split("=", 1)[1]] = {
                    "files": len(files),
                    "rows": sum(
                        pq.ParquetFile(f).metadata.num_rows
                        for f in files
                    ),
                }
        return out

    before = survey(root)
    df = spark.read.parquet(str(root))
    data_cols = [c for c in df.columns if c != partition_key]

    def writer(build_path: str) -> None:
        salt = F.pmod(
            F.hash(*[F.col(c) for c in data_cols]), F.lit(target_files)
        )
        (
            df.withColumn("__salt", salt)
            .repartition(F.col(partition_key), F.col("__salt"))
            .drop("__salt")
            .write.partitionBy(partition_key)
            .mode("overwrite")
            .parquet(build_path)
        )

    replace_dir(root, writer)
    after = survey(root)
    return [
        {
            "partition": k,
            "files_before": before[k]["files"],
            "files_after": after.get(k, {}).get("files", 0),
            "rows_before": before[k]["rows"],
            "rows_after": after.get(k, {}).get("rows", 0),
        }
        for k in sorted(before)
    ]
