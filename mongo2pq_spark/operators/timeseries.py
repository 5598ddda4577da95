"""Time-series operators: hypertable-style bucket rollup with gap
filling, and a bucketized (scale-safe) interval range join.

Both operators exist because Spark has no native `time_bucket
gapfill` / `RANGE JOIN` operator; both are expressed as compositions
of built-in DataFrame ops so Catalyst owns the physical strategy.

Scale shape (100 TB):
- Rollup: ONE aggregation keyed by (group, bucket) — map-side partial
  aggregation shrinks every task's output to its distinct (group,
  bucket) pairs, so shuffle volume is bounded by the bucket grid, not
  the event count. The gap-fill spine (bucket range × groups) is
  metadata-sized — built from the rolled-up result's own min/max, it
  never touches the raw events again.
- Range join: the naive formulation (`a.ts BETWEEN b.ts - w AND
  b.ts`) is a theta-join — Spark can only execute it as a broadcast
  nested loop, quadratic at scale. Bucketizing time into width-w cells
  turns it into an EQUI-join: each probe row explodes into the (at
  most 2) cells its window overlaps, matches build rows by (key,
  cell), and a residual filter applies the exact bounds. Candidate
  cost is |build rows per (key, 2w)| per probe — linear, AQE-skew
  handled, never nested-loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Per-(group, time-bucket) aggregate: event count plus mean/sum of
    ``value_col``, bucketed by `date_trunc(unit)`."""
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    return (
        df.groupBy(*group_cols, bucket)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
    )


def rollup_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """`time_bucket_rollup` plus gap filling: every (group, bucket)
    cell in the [min, max] bucket range of the data appears exactly
    once; empty cells carry ``n_events = 0`` and null aggregates —
    the hypertable/timescale `time_bucket_gapfill` shape.

    The spine is built by `sequence(min, max, interval 1 unit)` over
    the ROLLED-UP table's own bounds (one metadata-cheap aggregate of
    an already-small table) cross-joined with the distinct groups —
    both sides are grid-sized, so the cross join and the final left
    join are broadcast-sized at any corpus scale.
    """
    rolled = time_bucket_rollup(df, ts_col, group_cols, value_col, unit)
    step = F.expr(f"interval 1 {unit}")
    spine_ts = (
        rolled.agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        )
        .select(F.explode(F.sequence("lo", "hi", step)).alias("bucket"))
    )
    groups = df.select(*group_cols).distinct()
    spine = spine_ts.crossJoin(F.broadcast(groups))
    return (
        spine.join(rolled, ["bucket", *group_cols], "left")
        .select(
            *group_cols,
            "bucket",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias(
                "n_events"
            ),
            F.col("avg_value"),
            F.col("sum_value"),
        )
    )


def bucketed_range_join_count(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    probe_id_col: str,
    probe_ts: str,
    build_ts: str,
    window_seconds: int,
    count_alias: str = "n_in_window",
) -> DataFrame:
    """For every probe row, count build rows with the same ``key_col``
    and ``build.ts`` in ``[probe.ts − window, probe.ts)`` — an interval
    range join executed as an equi-join (see module docstring).

    ``probe_id_col`` must uniquely identify probe rows; candidate
    matches are counted per id and left-joined back onto the full
    probe table, so zero-match probe rows are kept with count 0.
    Timestamps compare at microsecond precision (`unix_micros`),
    matching parquet's physical resolution.
    """
    w_us = window_seconds * 1_000_000
    # the window [t−w, t) overlaps at most 2 width-w cells
    probe_cells = probe.select(
        F.col(probe_id_col).alias("__pid"),
        F.col(key_col).alias("__pkey"),
        F.unix_micros(F.col(probe_ts)).alias("__pus"),
    ).withColumn(
        "__cell",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("__pus") - w_us) / F.lit(w_us)),
                    F.floor(F.col("__pus") / F.lit(w_us)),
                )
            )
        ),
    )
    build_cells = build.select(
        F.col(key_col).alias("__bkey"),
        F.unix_micros(F.col(build_ts)).alias("__bus"),
    ).withColumn("__cell", F.floor(F.col("__bus") / F.lit(w_us)))
    counts = (
        probe_cells.join(
            build_cells,
            (F.col("__pkey") == F.col("__bkey"))
            & (probe_cells["__cell"] == build_cells["__cell"])
            & (F.col("__bus") >= F.col("__pus") - F.lit(w_us))
            & (F.col("__bus") < F.col("__pus")),
        )
        .groupBy("__pid")
        .agg(F.count("*").alias(count_alias))
    )
    return (
        probe.join(
            counts, probe[probe_id_col] == counts["__pid"], "left"
        )
        .drop("__pid")
        .withColumn(
            count_alias, F.coalesce(F.col(count_alias), F.lit(0)).cast("bigint")
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    l_start: str = "s",
    l_end: str = "e",
    r_start: str = "s",
    r_end: str = "e",
    cell_seconds: int = 3600,
) -> DataFrame:
    """INTERVAL × INTERVAL overlap join: all (left, right) pairs with
    the same ``key_col`` whose CLOSED time intervals [start, end]
    intersect (``l.s ≤ r.e AND r.s ≤ l.e``) — the interval sibling of
    the point-in-window range join above, completing the temporal-join
    matrix (as-of / point-range / interval-overlap).

    A naive BETWEEN theta-join plans as BroadcastNestedLoopJoin —
    quadratic per key at scale. Decomposition: every interval explodes
    to the width-``cell_seconds`` grid cells it covers; two
    overlapping intervals both cover the cell containing any shared
    instant, so an equi-join on (key, cell) generates a candidate
    superset, deduplicated and verified with the exact predicate.
    Cost: Σ(interval_len / cell + 1) rows per side into one equi-join
    — pick ``cell_seconds`` near the typical interval length so most
    intervals explode to 1–2 cells (a multi-cell-spanning pair is
    double-counted by the grid, hence the distinct).

    Output: key, the four bounds (aliased ``l_start/l_end/r_start/
    r_end``), and ``overlap_us`` (BIGINT microseconds, ≥ 0; 0 means
    the intervals touch at a point). Timestamps compare at
    microsecond precision, parquet's physical resolution.

    CONTRACT: interval rows must be unique per (key, start, end) —
    the grid-dedup ``distinct`` collapses exact duplicate intervals
    (gaps-and-islands session sets satisfy this by construction: one
    key's sessions are pairwise disjoint).
    """
    w_us = cell_seconds * 1_000_000

    def cells(df, start, end, sa, ea):
        s_us = F.unix_micros(F.col(start))
        e_us = F.unix_micros(F.col(end))
        return df.select(
            F.col(key_col),
            F.col(start).alias(sa),
            F.col(end).alias(ea),
            F.explode(
                F.sequence(
                    F.floor(s_us / F.lit(w_us)), F.floor(e_us / F.lit(w_us))
                )
            ).alias("__cell"),
        )

    lc = cells(left, l_start, l_end, "l_start", "l_end")
    rc = cells(right, r_start, r_end, "r_start", "r_end")
    pairs = (
        lc.join(rc, [key_col, "__cell"])
        .drop("__cell")
        .distinct()
        .filter(
            (F.col("l_start") <= F.col("r_end"))
            & (F.col("r_start") <= F.col("l_end"))
        )
    )
    overlap = F.unix_micros(
        F.least(F.col("l_end"), F.col("r_end"))
    ) - F.unix_micros(F.greatest(F.col("l_start"), F.col("r_start")))
    return pairs.select(
        key_col,
        "l_start",
        "l_end",
        "r_start",
        "r_end",
        overlap.cast("bigint").alias("overlap_us"),
    )
