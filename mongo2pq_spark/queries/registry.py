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
    # r14 window (VERDICT r13 #1: pure-freshness rotation from the
    # corrected starting point — registry 251+3 new, r8-latest front
    # is 8 entries). Order:
    # (a) queries changed or new in r14: the generation-management
    # composition pipeline (VERDICT r13 #4), the manifest-only scan
    # (payloads=false driver proof) and the reshard roundtrip (both
    # new), plus the five queries whose underlying machinery changed
    # this round — streaming tar ingest (O(member) sequential parse
    # replaces the whole-shard binaryFile row; doc/hash moved) and
    # the four tarshards-source consumers (reader gained the
    # payloads=false option; fsck feeding the roundtrip's
    # verification chain went chunked) — their next driver row must
    # reflect r14 code — plus the trained-NB-classifier third wave
    # (new registrations);
    "classifier_nb_lang",
    "classifier_nb_hashed",
    "classifier_nb_crossval",
    "classifier_nb_incremental",
    "streaming_nb_ingest",
    "pipeline_tokens_to_shards",
    "pipeline_packed_sequences",
    "pipeline_generation_resplit",
    "el_tar_manifest_scan",
    "el_tar_reshard_roundtrip",
    "streaming_tar_ingest",
    "el_tar_shards_native_read",
    "el_tar_shards_roundtrip",
    "multimodal_wds_samples",
    "multimodal_wds_snapshot_diff",
    # (b) the 8 r8-latest freshness leftovers (oldest rows in the
    # registry; set recomputed from CORRECTNESS_r01..r13 — includes
    # grouping_sets_revenue, which the r13 note omitted);
    "grouping_sets_revenue",
    "q13_customer_order_distribution",
    "q4_late_shipment_priority",
    "scd2_user_state_history",
    "sessions_overlap_join",
    "orders_retention_cohorts",
    "udaf_user_value_gini",
    "value_quartile_buckets",
    # (c) 27 of the 48 r9-latest rows, in their r9 window order; the
    # final 21 (q7_nation_volume, q8_market_share, rollup_customer_counts,
    # session_window_native, sketch_rollup_distinct_users,
    # sql_api_revenue_by_day, streaming_dedup_events — displaced by
    # the r14 classifier/tokenizer waves — plus
    # streaming_enrich_static, streaming_parquet_sink,
    # streaming_session_windows .. window_top_orders_per_customer)
    # roll to r15's freshness front — all hold green r9 rows, so
    # coverage stays total.
    "embedding_drift",
    "dedup_levenshtein_blocked",
    "embedding_near_dup",
    "ann_lsh_topk",
    "ann_lsh_buckets",
    "ann_topk_bruteforce",
    "approx_topk_event_types",
    "cogroup_asof_enrich",
    "customers_without_orders",
    "dedup_incremental_new_docs",
    "dedup_minhash_candidates",
    "dedup_minhash_jaccard_est",
    "dedup_near_cleaned_corpus",
    "dedup_near_clusters",
    "dedup_ngram_jaccard",
    "dedup_simhash_fingerprints",
    "dq_audit_lineitem",
    "el_partitioned_roundtrip",
    "event_type_matrix",
    "events_except",
    "events_time_slice",
    "multimodal_image_dims",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q3_top_unshipped",
    "q5_local_supplier_volume",
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
