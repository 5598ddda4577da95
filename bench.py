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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mongo2pq_spark.queries.registry import load_all
    from mongo2pq_spark.session import get_spark

    spark = get_spark(app_name="mongo2pq_spark_bench")
    specs = load_all()

    # JVM/session warmup outside the timed region
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # best-of-3: external host-load contention measurably inflates
    # single runs up to 5x; three repeats also absorb the one-time
    # codegen compile of the large LSH expression trees
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in HEADLINE:
        spec = specs[name]
        best, n = None, 0
        try:
            for _ in range(max(1, repeats)):  # best-of-N damps host noise
                start = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                # noop sink materializes EVERY output column; a bare
                # count() lets Catalyst prune projection-only queries
                # down to a parquet metadata read
                df.write.format("noop").mode("overwrite").save()
                elapsed = time.perf_counter() - start
                best = elapsed if best is None else min(best, elapsed)
            n = df.count()  # row count for the log line (untimed)
        except Exception as exc:  # one broken query must not zero the suite
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
