"""Query registry: every engine capability is declared as a named
(Spark builder, DuckDB oracle SQL) pair. The driver contract
(__spark_entry__.py) and the test harness both consume this table.

``oracle`` is ANSI SQL over the pre-registered testdata views
(region nation customer supplier part orders lineitem events documents
embeddings). ``oracle=None`` marks genuinely non-SQL-expressible ops
(driver records a weaker rows-only check).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: Optional[str]
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run."""
    from mongo2pq_spark.queries import (  # noqa: F401
        analytics,
        dedup,
        functions_lib,
        joins_ext,
        multimodal,
        relational,
        sampling_quant,
        similarity,
        streaming,
        text,
        udfs,
    )

    return QUERIES
