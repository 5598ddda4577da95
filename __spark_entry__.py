"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are materialized from the engine's
query registry (mongo2pq_spark.queries): every implemented operator
from SURVEY.md §2 plus the mandated large-scale extensions registers a
(Spark builder, DuckDB oracle SQL) pair there.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the engine importable even when this file is loaded by path
# from a foreign cwd (the driver's loader may not add the repo root)
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing
    summary (scan → pushed-down filter → two-level aggregation)."""
    from mongo2pq_spark.queries.registry import load_all

    specs = load_all()
    return specs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mongo2pq_spark.queries.registry import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from mongo2pq_spark.queries.registry import load_all

    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
