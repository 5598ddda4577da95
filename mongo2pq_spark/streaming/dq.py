"""Streaming data-quality monitoring: the contract runner's
Structured Streaming face. The batch CLI path (``--dq-rules``) judges
a whole collection before its write; this runner judges each
micro-batch as it arrives via ``foreachBatch`` and lands one bounded
per-rule report partition per batch — the continuous-ingestion
monitor that pages on a violating batch WITHOUT re-scanning history.

Rule scope: only per-row-decomposable kinds (not_null / min / max /
in_set / regex / fk-against-a-static-dim) — for those, the sum of
per-batch violation counts IS the whole-input count, which is exactly
what the registered query's oracle checks. ``unique`` is NOT
batch-decomposable (cross-batch duplicates are invisible to any
single batch), so this runner rejects it with a typed error pointing
at the batch surface; cross-batch duplicate detection is the
streaming near-dedup store's job (`streaming/neardedup.py`), which
maintains the cross-batch index a streaming uniqueness check
actually requires.

Idempotency is the ``foreach_batch_upsert`` recipe shared by every
streaming sink here: the report partition is keyed by the
DETERMINISTIC micro-batch id, so a checkpoint replay overwrites its
own report instead of double-counting it.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo2pq_spark.streaming.neardedup import _stage_batches


def run_streaming_dq_monitor(
    spark: SparkSession,
    table_path: str,
    rules: list[dict],
    n_batches: int = 4,
    store_dir: str | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Replay ``table_path`` as ``n_batches`` ordered micro-batches,
    validating each against ``rules`` and appending its bounded
    report partition; returns the cross-batch rollup ``(rule_id,
    kind, column, n_batches_seen, n_rows, n_violations,
    violation_frac, passed)`` — for decomposable rules this must
    equal the one-shot batch contract over the whole table, which is
    the registered query's full value oracle. The rollup is
    materialized driver-side (rules-bounded) so it outlives the
    ephemeral store's cleanup."""
    from mongo2pq_spark.operators.contracts import validate_rules

    for r in rules:
        if r["kind"] == "unique":
            raise ValueError(
                "'unique' is not batch-decomposable: a micro-batch "
                "cannot see cross-batch duplicates — run uniqueness "
                "on the batch surface (operators/contracts.py), or "
                "use the streaming near-dedup store for cross-batch "
                "duplicate detection"
            )

    cleanup = store_dir is None
    if store_dir is None:
        store_dir = tempfile.mkdtemp(prefix="stream_dq_")
    stage_dir = os.path.join(store_dir, "stage")
    ckpt_dir = os.path.join(store_dir, "ckpt")
    report_dir = os.path.join(store_dir, "reports")
    try:
        _stage_batches(spark, table_path, stage_dir, n_batches, id_col)
        static = spark.read.parquet(
            os.path.join(stage_dir, "batch_0.parquet")
        )

        def check_batch(batch_df, batch_id: int) -> None:
            # deterministic batch id: a checkpoint replay overwrites
            # its own report partition rather than double-counting
            validate_rules(batch_df, rules).write.mode(
                "overwrite"
            ).parquet(os.path.join(report_dir, f"batch=s{batch_id}"))

        stream = (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage_dir)
        )
        q = (
            stream.writeStream.foreachBatch(check_batch)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        reports = spark.read.option("basePath", report_dir).parquet(
            os.path.join(report_dir, "batch=*")
        )
        rollup = (
            reports.groupBy("rule_id", "kind", "column")
            .agg(
                F.count("*").cast("bigint").alias("n_batches_seen"),
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum("n_violations").cast("bigint").alias("n_violations"),
            )
            .select(
                "rule_id",
                "kind",
                "column",
                "n_batches_seen",
                "n_rows",
                "n_violations",
                (
                    F.round(
                        F.col("n_violations").cast("double")
                        / F.greatest(F.col("n_rows"), F.lit(1)),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("violation_frac"),
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
        # rules-bounded driver materialization (outlives the rmtree)
        rows = rollup.collect()
        return spark.createDataFrame(rows, rollup.schema)
    finally:
        if cleanup:
            shutil.rmtree(store_dir, ignore_errors=True)
