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
    # r16 window (pure-freshness rotation per the r15 handoff,
    # verified against CORRECTNESS_r01..r15 this session). Order:
    # (a) the two entries with NO driver row yet — the r15 late
    # registration (first per _NEXT_WINDOW_QUEUE contract) and this
    # round's new FLAC full-decode roundtrip;
    "pipeline_incremental_tokenize",
    "multimodal_flac_pcm_roundtrip",
    "el_tar_incremental_ship",
    "multimodal_flac_wav_crosscodec",
    "multimodal_avi_mjpeg_frames",
    "multimodal_wav_codec_matrix",
    "multimodal_wav_ima_adpcm_roundtrip",
    "multimodal_wav_ima_adpcm_stereo",
    "multimodal_jpeg_subsampled_roundtrip",
    # (a') queries whose hashes moved in r16: the ~15 parquet/CSV/
    # JSONL/ORC/XML/mongodump/index EL queries re-keyed from fixed
    # /tmp dirs onto sources/staging.py::generation_tmp_dir (VERDICT
    # r15 #2 — closes the staging-hazard class), the four NB-store
    # queries (per-process staging guard, VERDICT #4), the
    # incremental-tokenize id-offset fix + null-text coalesce
    # (ADVICE r15), and multimodal_flac_streaminfo (doc note);
    "el_partitioned_roundtrip",
    "el_jsonl_roundtrip",
    "el_orc_roundtrip",
    "el_schema_evolution",
    "el_csv_roundtrip",
    "el_mongodump_scan",
    "el_mongodump_flatten",
    "el_xml_roundtrip",
    "el_zorder_roundtrip",
    "el_mongodump_export_roundtrip",
    "el_compact_roundtrip",
    "el_jsonl_gzip_roundtrip",
    "el_footer_manifest",
    "el_inverted_index_roundtrip",
    "el_inverted_index_incremental",
    "el_index_bm25_topk",
    "el_index_phrase_matches",
    "dedup_near_clusters_checkpointed",
    "streaming_tar_ingest",
    "streaming_nb_ingest",
    "classifier_nb_incremental",
    "classifier_nb_compacted",
    "pipeline_classify_route_shards",
    "pipeline_route_label_quota",
    "multimodal_flac_streaminfo",
    "multimodal_jpeg_pixel_roundtrip",
    # (b) the oldest 23 of the 34 r10-latest entries, in their r10
    # window order (el_mongodump_scan/flatten and el_xml_roundtrip
    # are already above; the remaining 16 — partition_counts,
    # percentile_approx_values, q1_pricing_summary,
    # q6_forecast_revenue, salted_join_revenue,
    # streaming_foreach_batch_upsert, systematic_sample,
    # text_fingerprints, text_language_id,
    # text_quality_scores, text_tfidf_top_terms, text_token_stats,
    # text_top_bigrams, text_winnow_fingerprints, theta_overlap_users,
    # udf_text_normalize — roll to r17's front).
    "dedup_incremental_near_dups",
    "dedup_simhash_pairs",
    "ann_ivf_recall",
    "asof_purchase_last_click",
    "cube_order_counts",
    "distinct_users_approx",
    "distinct_users_exact",
    "full_outer_daily_activity",
    "histogram_quantile_rollup",
    "json_extract_props",
    "json_schema_promotion",
    "kll_quantile_rollup",
    "median_value_by_type",
    "merge_upsert_events",
    "multimodal_metadata",
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
    # From r14 on the rotation is pure freshness; a new query goes in
    # the front of _DRIVER_WINDOW_FIRST (rotating out a stable green
    # anchor) or stages here with full pytest-oracle parity until the
    # next round covers it.
    #
    # r16: empty — pipeline_incremental_tokenize moved to the window
    # front per its r15 staging contract; every r16 registration went
    # directly into the window.
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
