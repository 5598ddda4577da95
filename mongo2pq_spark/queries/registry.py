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
    # new this round: corpus stats / QA batch (corpus_stats.py)
    "corpus_train_val_split",
    "text_unigram_logprob",
    "contamination_overlap_frac",
    "embedding_norm_outliers",
    "events_anomaly_mad",
    "orders_retention_cohorts",
    "grouping_sets_revenue",
    "events_heavy_hitters",
    # changed this round: sampling / quantization
    "stratified_sample",
    "value_quartile_buckets",
    "embedding_quantize_int8",
    # new this round: TPC-H semi-join / outer-distribution shapes
    "q4_late_shipment_priority",
    # changed this round (LSH optimization pass): ANN / similarity
    "embedding_near_dup",
    "el_mongodump_scan",
    "ann_ivf_recall",
    "ann_lsh_topk",
    # new this round: formats / windows / streaming joins
    "el_orc_roundtrip",
    "events_rolling_1h_user",
    "streaming_stream_join",
    "text_boilerplate_ngrams",
    "text_zipf_slope",
    "events_funnel_conversion",
    # new or fixed or changed this round
    "text_clean",
    "text_decontaminate",
    "text_gopher_quality_flags",
    "text_repetition_stats",
    "docs_pii_redact",
    "corpus_filter_funnel",
    "embedding_dim_stats",
    "token_pack_greedy",
    "el_csv_roundtrip",
    "doc_chunks_fixed",
    "corpus_mix_upsample",
    "events_rollup_gapfill",
    "range_join_click_attribution",
    "events_value_histogram",
    "streaming_enrich_static",
    "multimodal_frame_sample",
    "dedup_minhash_containment",
    "el_jsonl_roundtrip",
    "corpus_shuffle_shards",
    "streaming_parquet_sink",
    "q13_customer_order_distribution",
    "multimodal_decode_features",
    "udaf_user_value_gini",
    "el_schema_evolution",
    "q7_nation_volume",
    "q8_market_share",
    "dedup_cleaned_corpus",
    "dedup_exact",
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
