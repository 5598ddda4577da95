"""Mimic of the driver's correctness gate: run each registered query on
Spark AND its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(value):
    if value is None:
        return "∅"
    if isinstance(value, Decimal):
        value = float(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.10g}"
    if isinstance(value, datetime):
        return value.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(value, date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    return str(value)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(row[i]) for i in order) for row in rows]
    return sorted(out)


def compare_query(spark, spec, sf_dir: str, con=None) -> dict:
    """Run spec.fn on Spark and spec.oracle on DuckDB; return a result
    dict with match flags and diagnostics."""
    from mongo2pq_spark.queries.registry import complex_top_level_cols

    sdf = spec.fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    result = {
        "name": spec.name,
        "spark_rows": len(spark_rows),
        "oracle": spec.oracle is not None,
        # array/struct/map result columns crash the driver canonicalizer
        "complex_cols": complex_top_level_cols(sdf.schema),
    }
    if spec.oracle is None:
        result["match"] = None
        return result

    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        rel = con.sql(spec.oracle)
        duck_cols = list(rel.columns)
        # Driver-typing guard: the driver canonicalizes through pandas,
        # where a DuckDB HUGEINT (the type of any un-cast integer
        # sum()) becomes float64 and renders '2936.0' vs Spark's
        # '2936' — a hash mismatch this harness's fetchall() path
        # (Python int) silently masks (CORRECTNESS_r10
        # q12_delay_priority). Surface those columns so the test can
        # demand an explicit CAST in the oracle SQL.
        result["hugeint_cols"] = [
            c
            for c, t in zip(duck_cols, rel.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")
        ]
        duck_rows = rel.fetchall()
    finally:
        if own_con:
            con.close()

    result["duck_rows"] = len(duck_rows)
    result["cols_match"] = sorted(spark_cols) == sorted(duck_cols)
    s_canon = canonical_rows(spark_cols, spark_rows)
    d_canon = canonical_rows(duck_cols, duck_rows)
    result["values_match"] = s_canon == d_canon
    result["match"] = (
        result["cols_match"]
        and len(spark_rows) == len(duck_rows)
        and result["values_match"]
    )
    if not result["match"]:
        only_spark = [r for r in s_canon if r not in set(d_canon)][:3]
        only_duck = [r for r in d_canon if r not in set(s_canon)][:3]
        result["spark_cols"] = spark_cols
        result["duck_cols"] = duck_cols
        result["sample_only_spark"] = only_spark
        result["sample_only_duck"] = only_duck
    return result
