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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Dataset-version diff between two snapshots of one table — the
    audit a pipeline runs between yesterday's and today's EL output
    before promoting it: per key, ``added`` (key only in new),
    ``removed`` (only in old), ``changed`` (present in both, compared
    columns differ), or ``unchanged``.

    Returns one row per key: ``(*key_cols, status)``. Comparison is
    an md5 over the canonicalized compare columns (null-safe: NULL
    encodes distinctly from any string, so NULL→value transitions
    count as changed). Scale shape: ONE full-outer equi-join on the
    key — the minimal possible plan for a diff; no windows, no
    collects; at 100 TB both sides hash-shuffle once on the key and
    AQE handles size asymmetry."""
    def digest(df: DataFrame) -> Column:
        return F.md5(
            F.concat_ws(
                "\x01",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ],
            )
        )

    o = old.select(*key_cols, digest(old).alias("__old_d"))
    n = new.select(*key_cols, digest(new).alias("__new_d"))
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__old_d").isNull(), "added")
        .when(F.col("__new_d").isNull(), "removed")
        .when(F.col("__old_d") != F.col("__new_d"), "changed")
        .otherwise("unchanged")
    )
    return j.select(*key_cols, status.alias("status"))
