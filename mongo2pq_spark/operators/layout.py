"""Physical-layout operators: Z-order clustering for multi-column
file skipping.

Parquet scan pruning uses per-row-group min/max statistics; sorting by
one column makes ITS ranges tight but leaves any second filter column
with full-range stats in every row group. Interleaving the bits of two
columns (a Z-order / Morton key) and sorting by THAT keeps both
columns' per-row-group ranges narrow, so filters on EITHER column skip
row groups — the standard lakehouse layout technique for secondary-
dimension pruning at 100 TB (Delta/Iceberg `ZORDER BY`), expressed
here as a pure Catalyst column expression (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` of two non-negative
    integer columns (c1 → even bit positions, c2 → odd). Built-in
    shift/mask expressions only — whole-stage codegen, no Python.

    PRECONDITION: values must fit in ``bits`` (0 ≤ v < 2**bits).
    A wider value aliases on its ignored HIGH bits and the key order
    becomes unrelated to the real column order, silently destroying
    the min/max pruning the layout exists for. ``write_zordered``
    range-fits arbitrary non-negative domains before calling this."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit1 = F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1))
        bit2 = F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1))
        key = (
            key
            + F.shiftleft(bit1, 2 * i)
            + F.shiftleft(bit2, 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` clustered by the Z-order of (col1, col2):
    range-partition + sort on the Morton key so consecutive files and
    row groups cover compact rectangles of the (col1, col2) space —
    filters on either column then prune via min/max stats.

    ``repartitionByRange`` on the key gives globally ordered output
    splits (each task owns a contiguous key range); the within-
    partition sort orders row groups inside each file.

    Arbitrary non-negative integer domains (large ids, epoch
    timestamps) are RANGE-FIT first: one tiny min/max agg observes
    each column's SPAN, values are rebased to the minimum and spans
    wider than ``bits`` right-shifted so the bits that actually vary
    — not the constant high bits of an epoch offset, not aliasing low
    bits — feed the interleave (the raw low-bits key aliased
    everything ≥ 2**bits and the layout claim silently did not hold).
    Rebase + shift is rank-monotonic, so row-group min/max stats stay
    pruning-tight at span/2**bits granularity."""
    mx = df.agg(
        F.max(F.col(col1).cast("long")).alias("m1"),
        F.max(F.col(col2).cast("long")).alias("m2"),
        F.min(F.col(col1).cast("long")).alias("lo1"),
        F.min(F.col(col2).cast("long")).alias("lo2"),
    ).first()
    if (mx["lo1"] is not None and mx["lo1"] < 0) or (
        mx["lo2"] is not None and mx["lo2"] < 0
    ):
        raise ValueError(
            "write_zordered requires non-negative clustering columns "
            f"(got min {col1}={mx['lo1']}, {col2}={mx['lo2']} — offset "
            "negative domains before clustering)"
        )

    def _fit(col: str, lo, hi) -> Column:
        lo, hi = int(lo or 0), int(hi or 0)
        shift = max(0, (hi - lo).bit_length() - bits)
        return F.shiftright(F.col(col).cast("long") - F.lit(lo), shift)

    key = zorder_key(
        _fit(col1, mx["lo1"], mx["m1"]),
        _fit(col2, mx["lo2"], mx["m2"]),
        bits=bits,
    )
    clustered = (
        df.withColumn("__z", key)
        .repartitionByRange("__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    # note: dropping __z after the sort keeps the ordering (the sort
    # already happened physically); the written files carry only the
    # original columns
    writer = clustered.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
