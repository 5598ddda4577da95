"""Z-order layout: per-row-group min/max stats must be tight on BOTH
clustering columns, so filters on either dimension skip row groups.
Measured directly from the parquet footers (the same stats the scan
pruner consults), compared against a single-column-sorted layout where
the second column's ranges stay full-width.
"""

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mongo2pq_spark.operators.layout import write_zordered, zorder_key


def _avg_range_fraction(out_dir: str, col: str, total_span: float) -> float:
    """Mean (max-min)/span of `col` across all row groups — 1.0 means
    every row group covers the full domain (no skipping possible)."""
    spans = []
    for part in Path(out_dir).iterdir():
        if part.suffix != ".parquet":
            continue
        meta = pq.ParquetFile(part).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(names[col]).statistics
            spans.append((stats.max - stats.min) / total_span)
    assert spans
    return sum(spans) / len(spans)


def test_zorder_key_interleaves_bits(spark):
    row = spark.range(1).select(
        zorder_key(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    ).collect()[0]
    # c1 bits → even positions (1,0,1 -> 0b010001), c2 → odd (0b001010)
    assert row["z"] == (0b010001 | 0b001010)


def test_zorder_tightens_both_columns(spark, tmp_path):
    """Clustering on zorder(u, v) must shrink row-group ranges for BOTH
    columns vs a u-only sort (where v ranges stay ~full-width in every
    row group). Synthetic 8-bit × 8-bit domain; v is a deterministic
    hash of the id so the two dimensions are independent."""
    df = spark.range(100_000).select(
        (F.col("id") % 256).cast("long").alias("u"),
        F.pmod(F.hash(F.col("id")), F.lit(256)).cast("long").alias("v"),
    )

    z_dir = str(tmp_path / "zordered")
    write_zordered(df, z_dir, "u", "v", bits=8, max_records_per_file=5000)

    s_dir = str(tmp_path / "sorted_single")
    (
        df.repartitionByRange("u")
        .sortWithinPartitions("u")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", "5000")
        .parquet(s_dir)
    )

    z_u = _avg_range_fraction(z_dir, "u", 255)
    z_v = _avg_range_fraction(z_dir, "v", 255)
    s_u = _avg_range_fraction(s_dir, "u", 255)
    s_v = _avg_range_fraction(s_dir, "v", 255)

    # single sort: u razor-tight, v useless (full-width)
    assert s_u < 0.2, s_u
    assert s_v > 0.9, s_v
    # z-order: BOTH dimensions materially tighter than full-width
    assert z_u < 0.6, z_u
    assert z_v < 0.6, z_v
    # and v is far tighter than in the single-sort layout
    assert z_v < s_v * 0.7, (z_v, s_v)


def test_zorder_range_fits_wide_domains(spark, tmp_path):
    """Epoch-scale values (≫ 2**bits) must still cluster: the range
    fit right-shifts so the TOP bits interleave. The pre-fix key used
    the LOW bits, which for a ~1.7e9-wide domain are noise — every row
    group then spanned the full domain on both columns."""
    base = 1_700_000_000
    df = spark.range(100_000).select(
        (F.lit(base) + F.col("id") * 17).alias("u"),  # timestamp-like
        (
            F.lit(10_000_000)
            + F.pmod(F.hash(F.col("id")), F.lit(1_000_000)).cast("long")
        ).alias("v"),  # large-id-like, independent of u
    )
    out = str(tmp_path / "wide")
    write_zordered(df, out, "u", "v", bits=8, max_records_per_file=5000)
    span_u = 100_000 * 17
    z_u = _avg_range_fraction(out, "u", span_u)
    z_v = _avg_range_fraction(out, "v", 1_000_000)
    assert z_u < 0.6, z_u
    assert z_v < 0.6, z_v


def test_zorder_rejects_negative_domain(spark, tmp_path):
    import pytest

    df = spark.range(100).select(
        (F.col("id") - 50).alias("u"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="non-negative"):
        write_zordered(df, str(tmp_path / "neg"), "u", "v")


def test_zorder_epoch_micros_and_large_id_domain(spark, tmp_path):
    """Domains ≥ 2**32 — epoch MICROseconds (~1.7e15) × large ids
    (> 4e9): the range fit must rebase + right-shift so the top bits
    that actually vary interleave, keeping BOTH columns' row-group
    min/max materially tighter than the single-sort layout leaves the
    second column. This is the domain scale the round-7 range-fit fix
    targets; the earlier wide-domain test stopped at ~1.7e9."""
    base_us = 1_700_000_000_000_000  # epoch micros, ≈ 2**50
    id_base = 5_000_000_000  # > 2**32
    n = 100_000
    df = spark.range(n).select(
        (F.lit(base_us) + F.col("id") * 1_000_000).alias("u"),
        (
            F.lit(id_base)
            + F.pmod(F.hash(F.col("id")), F.lit(1_000_000)).cast("long")
        ).alias("v"),
    )
    z_dir = str(tmp_path / "z")
    s_dir = str(tmp_path / "s")
    write_zordered(df, z_dir, "u", "v", bits=8, max_records_per_file=5000)
    (
        df.repartitionByRange(4, "u")
        .sortWithinPartitions("u")
        .write.option("maxRecordsPerFile", 5000)
        .parquet(s_dir)
    )
    span_u = float(n * 1_000_000)
    span_v = 1_000_000.0
    z_u = _avg_range_fraction(z_dir, "u", span_u)
    z_v = _avg_range_fraction(z_dir, "v", span_v)
    s_v = _avg_range_fraction(s_dir, "v", span_v)
    assert z_u < 0.6, z_u
    assert z_v < 0.6, z_v
    # the single-sort layout leaves v full-width; z-order must not
    assert s_v > 0.9, s_v
    assert z_v < s_v * 0.7, (z_v, s_v)
