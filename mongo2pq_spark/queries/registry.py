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


# The driver's correctness gate checks the FIRST 50 registry entries.
# This list pins the window: queries with no hard correctness signal
# yet (round-1 positions > 50) and queries whose implementation or
# oracle changed this round come first; long-stable round-1-green
# parity queries rotate to the back. Every name must exist — load_all
# fails loudly on a typo.
_DRIVER_WINDOW_FIRST = [
    # NEW this round (never driver-checked): mongodump dotted-path
    # flattening, SCD2 interval build, histogram/KLL/theta sketch
    # rollups, native-XML EL roundtrip
    "el_mongodump_flatten",
    "scd2_user_state_history",
    "histogram_quantile_rollup",
    "kll_quantile_rollup",
    "theta_overlap_users",
    "el_xml_roundtrip",
    "dedup_incremental_near_dups",
    "full_outer_daily_activity",
    # CHANGED this round: mongodump decode hardening (permissive now
    # covers corrupt wrappers; epoch typing from ALL sampled values)
    "el_mongodump_scan",
    # CHANGED this round: _cap_buckets gates its broadcast hint on an
    # exact oversized count — re-verify both LSH consumers
    "embedding_near_dup",
    "ann_lsh_topk",
    # CHANGED this round: foreachBatch upsert re-backed by a parquet
    # store (per-batch partition overwrite) instead of a driver dict
    "streaming_foreach_batch_upsert",
    # STALE rotation (verdict r6 #1): latest driver rows predate the
    # round-3 testdata regeneration (r1/r2 rows, different parquet
    # bytes) — with 50 slots this retires the entire backlog
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "count_rows",
    "distinct_values",
    "partition_counts",
    "limit_page",
    "top_k",
    "filter_equality",
    "scan_projection",
    "rename_projection",
    "column_casts",
    "falsy_suppression",
    "speculative_parse",
    "epoch_seconds",
    "systematic_sample",
    "merge_upsert_events",
    "salted_join_revenue",
    "asof_purchase_last_click",
    "case_when_bucketing",
    "cube_order_counts",
    "median_value_by_type",
    "percentile_approx_values",
    "distinct_users_exact",
    "distinct_users_approx",
    "array_functions",
    "math_functions",
    "json_extract_props",
    "json_schema_promotion",
    "multimodal_metadata",
    "text_token_stats",
    "text_quality_scores",
    "text_language_id",
    "text_fingerprints",
    "text_winnow_fingerprints",
    "text_tfidf_top_terms",
    "text_top_bigrams",
    "udf_text_normalize",
    # FRESHNESS fill (r5 rows, the oldest remaining): the heaviest /
    # least-SQL-like operators where a hard signal is worth most
    "ann_ivf_recall",
]


def complex_top_level_cols(schema) -> list[str]:
    """Names of top-level array/struct/map columns in a Spark schema.

    Registered queries must return NONE: the driver's canonicalizer
    sorts and hashes result rows with pandas, and an unhashable list /
    dict cell crashes it (hit twice: multimodal_decode_features r1,
    embedding_quantize_int8 r2). Scalarize instead — emit the size plus
    an md5 digest of the serialized value (see those two queries)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def unchecked_queries_outside_window(
    names: list[str], checked: set[str], window_size: int = 50
) -> list[str]:
    """Registered queries that have NEVER had a driver correctness row
    AND sit outside the driver's check window — i.e. queries that would
    ship with zero correctness signal. Must be empty: new queries go at
    the front of _DRIVER_WINDOW_FIRST (rotating out stable green
    anchors) until a CORRECTNESS round has covered them."""
    return [n for n in names[window_size:] if n not in checked]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run;
    return the registry reordered so the driver's 50-query correctness
    window covers every query lacking a hard signal (see
    _DRIVER_WINDOW_FIRST)."""
    from mongo2pq_spark.queries import (  # noqa: F401
        analytics,
        corpus_stats,
        dedup,
        functions_lib,
        joins_ext,
        llm_pipeline,
        multimodal,
        relational,
        sampling_quant,
        similarity,
        streaming,
        text,
        timeseries,
        udfs,
    )

    ordered = {name: QUERIES[name] for name in _DRIVER_WINDOW_FIRST}
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
