"""Streaming queries (Structured Streaming over the bounded events
source). A tumbling window over a bounded stream must equal the batch
GROUP BY time_bucket — that equality IS the oracle."""

from __future__ import annotations

from mongo2pq_spark.queries.registry import register
from mongo2pq_spark.streaming.windows import run_tumbling_window_counts


@register(
    "streaming_window_counts",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window counts (file source → window agg "
        "→ memory sink), drained with processAllAvailable; equals the batch "
        "time_bucket aggregate",
)
def streaming_window_counts(spark, sf_dir):
    return run_tumbling_window_counts(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_sliding_window_counts",
    """
    WITH slid AS (
        SELECT event_type,
               time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes'
                   AS window_start
        FROM events, unnest([0, 1]) AS offsets(k)
    )
    SELECT window_start, event_type, count(*) AS n
    FROM slid GROUP BY 1, 2
    """,
    doc="sliding windows (10 min / 5 min slide): each event counted in two "
        "overlapping windows; streaming result equals the batch unnest "
        "formulation",
)
def streaming_sliding_window_counts(spark, sf_dir):
    from mongo2pq_spark.streaming.windows import run_sliding_window_counts

    return run_sliding_window_counts(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_stateful_sessions",
    """
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    doc="custom stateful streaming operator (applyInPandasWithState): "
        "per-user sessionization with O(1) state; final emissions equal "
        "the batch lag/gap sessionization",
)
def streaming_stateful_sessions(spark, sf_dir):
    from mongo2pq_spark.streaming.stateful import run_stateful_sessionization

    return run_stateful_sessionization(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_session_windows",
    """
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    islands AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM islands GROUP BY user_id, session_id
    """,
    doc="event-time SESSION windows on a stream (session_window in a "
        "streaming aggregation): dynamic windows closing after 30 min "
        "inactivity per user — completes the streaming window-type "
        "matrix (tumbling/sliding/session); equals both the batch "
        "session_window aggregate and the gaps-and-islands SQL. "
        "Exact-gap boundary: an event at exactly prev_ts + 30 min "
        "stays in-session on BOTH sides (session_window merges "
        "adjacent windows; the oracle's strict '>' agrees) — pinned "
        "by test_session_window_exact_gap_boundary_matches_oracle",
)
def streaming_session_windows(spark, sf_dir):
    from mongo2pq_spark.streaming.windows import run_streaming_session_windows

    return run_streaming_session_windows(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_dedup_events",
    """
    SELECT DISTINCT user_id, event_type, ts FROM events
    """,
    doc="streaming exact dedup: the file source replays events TWICE "
        "(staged duplicate links) and dropDuplicates on "
        "(user_id, event_type, ts) + watermark collapses the replay to the "
        "distinct set with bounded state — equals batch SELECT DISTINCT",
)
def streaming_dedup_events(spark, sf_dir):
    from mongo2pq_spark.streaming.windows import run_streaming_dedup

    return run_streaming_dedup(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_enrich_static",
    """
    SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
           c.c_mktsegment,
           count(*) AS n,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="stream-static enrichment: the event stream joins the customer "
        "dimension (broadcast, re-read per micro-batch — slowly-changing "
        "dims pick up updates live) and aggregates hourly per market "
        "segment; state bounded by (windows in watermark) × segments; "
        "equals the batch join+time_bucket aggregate",
)
def streaming_enrich_static(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table
    from mongo2pq_spark.streaming.windows import run_stream_static_enrichment

    dim = read_sf_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return run_stream_static_enrichment(
        spark, f"{sf_dir}/events.parquet", dim
    )


@register(
    "streaming_stream_join",
    """
    SELECT p.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.ts AS click_ts,
           p.ts AS purchase_ts,
           CAST(p.value AS DOUBLE) AS purchase_value
    FROM (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
    """,
    doc="stream-stream inner join with an event-time range condition "
        "(clicks within 30 min before each purchase, per user): both "
        "streams watermarked, and the time-bound join condition lets "
        "Spark evict buffered state past the watermark — bounded-state "
        "streaming attribution; equals the batch range join",
)
def streaming_stream_join(spark, sf_dir):
    from mongo2pq_spark.streaming.windows import run_stream_stream_join

    return run_stream_stream_join(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_foreach_batch_upsert",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="foreachBatch custom sink backed by a REAL idempotent store: "
        "each micro-batch's distributed partial aggregate lands in a "
        "parquet partition keyed by batch_id via per-partition "
        "overwrite (the exactly-once recipe for non-transactional "
        "sinks — a replayed batch rewrites its partition instead of "
        "appending; restart-safety tested in test_streaming_resume); "
        "the final totals are a distributed fold over the store and "
        "equal the batch aggregate",
)
def streaming_foreach_batch_upsert(spark, sf_dir):
    from mongo2pq_spark.streaming.windows import run_foreach_batch_upsert

    return run_foreach_batch_upsert(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_parquet_sink",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="streaming EL to a parquet file sink with checkpointing (the "
        "continuous-ingestion production topology — exactly-once via "
        "sink transaction log + checkpointed offsets); the drained "
        "output is re-read and aggregated, and must equal the batch "
        "aggregate of the source",
)
def streaming_parquet_sink(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.streaming.windows import run_streaming_parquet_sink

    out = run_streaming_parquet_sink(spark, f"{sf_dir}/events.parquet")
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


def _near_dedup_oracle(n_batches: int = 4) -> str:
    """Batch formulation of the streaming pipeline's dup rule, built
    from the SAME MD5-MinHash constants as the Spark operators: doc X
    (batch = doc_id % n) is a near-dup iff it shares ≥1 LSH band with
    a doc of an earlier batch or a lower-id doc of its own batch."""
    from mongo2pq_spark.queries.dedup import _BANDS, _ROWS, _minhash_sig_sql

    bands_cte = (
        _minhash_sig_sql()
        + ",\n    bands AS (\n"
        + "\n        UNION ALL\n".join(
            "        SELECT doc_id, {b} AS band_id, md5({concat}) AS band_hash FROM sig".format(
                b=b,
                concat=" || ',' || ".join(
                    f"mh{b * _ROWS + r}" for r in range(_ROWS)
                ),
            )
            for b in range(_BANDS)
        )
        + "\n    )"
    )
    n = n_batches
    return f"""
    {bands_cte}
    SELECT d.doc_id,
           CAST(d.doc_id % {n} AS BIGINT) AS batch_k,
           EXISTS (
               SELECT 1 FROM bands a JOIN bands b
                 ON a.band_id = b.band_id AND a.band_hash = b.band_hash
               WHERE a.doc_id = d.doc_id
                 AND (b.doc_id % {n} < d.doc_id % {n}
                      OR (b.doc_id % {n} = d.doc_id % {n}
                          AND b.doc_id < d.doc_id))
           ) AS is_dup
    FROM documents d
    """


@register(
    "streaming_near_dedup",
    _near_dedup_oracle(),
    doc="streaming incremental near-dedup "
        "(streaming/neardedup.py::run_streaming_near_dedup): documents "
        "replayed as ordered micro-batches; each batch shingles only "
        "itself, probes the persisted MinHash band store for "
        "collisions against earlier batches, flags near-dups "
        "(cross-batch, or lower-id within batch), and appends its "
        "bands — idempotent per-partition overwrites keyed by the "
        "DATA's batch class, so replay recomputes identical flags. "
        "Continuous-ingestion economics: cost per batch ∝ batch size, "
        "corpus text never re-read, the band store is history's only "
        "trace. The oracle is the batch formulation of the same rule "
        "over the same MD5-MinHash constants",
)
def streaming_near_dedup(spark, sf_dir):
    from mongo2pq_spark.streaming.neardedup import run_streaming_near_dedup

    # driver_collect_ok: this registered query IS the bounded
    # verification surface (sf fixtures); production passes store_dir
    return run_streaming_near_dedup(
        spark, f"{sf_dir}/documents.parquet", driver_collect_ok=True
    )


def _hamming_stream_oracle() -> str:
    from mongo2pq_spark.queries.dedup import _simhash_fp_sql

    return _simhash_fp_sql() + """,
    b AS (
        SELECT doc_id, simhash, CAST(doc_id % 4 AS BIGINT) AS batch_k
        FROM fp
    )
    SELECT d.doc_id, d.batch_k,
           EXISTS (
               SELECT 1 FROM b e
               WHERE (e.batch_k < d.batch_k
                      OR (e.batch_k = d.batch_k AND e.doc_id < d.doc_id))
                 AND bit_count(xor(e.simhash, d.simhash)) <= 3
           ) AS is_dup
    FROM b d
    """


@register(
    "streaming_hamming_dedup",
    _hamming_stream_oracle(),
    doc="streaming incremental HAMMING near-dedup "
        "(streaming/neardedup.py::run_streaming_hamming_dedup): the "
        "fingerprint-modality face of the streaming store — documents "
        "replayed as ordered micro-batches; each batch fingerprints "
        "only itself (here text simhash; the same runner takes image "
        "dHash / audio envelope — the store and probe are fingerprint-"
        "agnostic), probes the persisted banded-fingerprint store with "
        "exact popcount verify for Hamming<=3 hits against earlier "
        "batches, flags, and appends its bands — idempotent partition "
        "overwrites keyed by the DATA's batch class, shared staging/"
        "manifest/crash core with the MinHash store. The banding is "
        "pigeonhole-complete at <=3, so the oracle is the pure batch "
        "rule: a doc is dup iff an earlier-batch (or lower-id same-"
        "batch) doc sits within Hamming 3 of its simhash",
)
def streaming_hamming_dedup(spark, sf_dir):
    from mongo2pq_spark.operators.dedup import simhash_fingerprints
    from mongo2pq_spark.streaming.neardedup import (
        run_streaming_hamming_dedup,
    )

    # driver_collect_ok: bounded verification surface (see
    # streaming_near_dedup)
    return run_streaming_hamming_dedup(
        spark,
        f"{sf_dir}/documents.parquet",
        simhash_fingerprints,
        driver_collect_ok=True,
    )


def _streaming_index_oracle() -> str:
    from mongo2pq_spark.functions.textfns import sql_tokens

    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (
        SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS doc_md5
    FROM tf GROUP BY term
    """


@register(
    "streaming_index_append",
    _streaming_index_oracle(),
    doc="streaming retrieval-index maintenance "
        "(streaming/indexing.py::run_streaming_index_append): the "
        "documents table replayed as 4 ordered micro-batches, each "
        "appending ONLY ITS OWN postings to the shared inverted-index "
        "artifact via foreachBatch — per-batch cost ∝ batch size, "
        "earlier postings never re-read; partitions keyed by the "
        "deterministic micro-batch id so checkpoint replays overwrite "
        "rather than duplicate (the foreach_batch_upsert exactly-once "
        "recipe). The drained store must equal a from-scratch index "
        "over the WHOLE table: the oracle recomputes every term's "
        "df / total tf / sorted-doc-list md5 directly from documents, "
        "a full value check of the complete vocabulary",
)
def streaming_index_append(spark, sf_dir):
    from mongo2pq_spark.queries.text import _postings_summary
    from mongo2pq_spark.streaming.indexing import (
        run_streaming_index_append,
    )

    # finalize aggregates INSIDE the runner so the ephemeral store's
    # end-of-run materialization is vocabulary-bounded (term summary
    # rows), never the full posting list
    return run_streaming_index_append(
        spark, f"{sf_dir}/documents.parquet", finalize=_postings_summary
    )


@register(
    "streaming_dq_monitor",
    """
    WITH a AS (
        SELECT count(*) AS n_rows,
               sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS v_nn,
               sum(CASE WHEN value IS NOT NULL AND value < 0
                        THEN 1 ELSE 0 END) AS v_min,
               sum(CASE WHEN event_type IS NOT NULL AND event_type
                        NOT IN ('click','view','purchase','signup','error')
                        THEN 1 ELSE 0 END) AS v_set
        FROM events
    ),
    rules(rule_id, kind, col, v) AS (
        SELECT 'r1_event_id_not_null', 'not_null', 'event_id',
               (SELECT v_nn FROM a)
        UNION ALL SELECT 'r2_value_min', 'min', 'value',
               (SELECT v_min FROM a)
        UNION ALL SELECT 'r3_event_type_domain', 'in_set', 'event_type',
               (SELECT v_set FROM a)
    )
    SELECT rule_id, kind, col AS column,
           CAST(4 AS BIGINT) AS n_batches_seen,
           CAST((SELECT n_rows FROM a) AS BIGINT) AS n_rows,
           CAST(v AS BIGINT) AS n_violations,
           round(CAST(v AS DOUBLE)
                 / greatest((SELECT n_rows FROM a), 1), 6) + 0.0
               AS violation_frac,
           v = 0 AS passed
    FROM rules ORDER BY rule_id
    """,
    doc="streaming data-quality monitoring (streaming/dq.py): the "
        "events table replayed as 4 ordered micro-batches, each "
        "judged against the contract in foreachBatch and landing its "
        "bounded report partition keyed by the deterministic batch id "
        "(checkpoint replays overwrite, never double-count). The "
        "cross-batch rollup must equal the ONE-SHOT batch contract "
        "over the whole table — decomposable rules only (the runner "
        "rejects 'unique' with a typed error: cross-batch duplicates "
        "are the streaming near-dedup store's job) — which the oracle "
        "checks as whole-table conditional sums, n_batches_seen=4 "
        "included",
)
def streaming_dq_monitor(spark, sf_dir):
    from mongo2pq_spark.streaming.dq import run_streaming_dq_monitor

    return run_streaming_dq_monitor(
        spark,
        f"{sf_dir}/events.parquet",
        [
            {"rule_id": "r1_event_id_not_null", "kind": "not_null",
             "col": "event_id"},
            {"rule_id": "r2_value_min", "kind": "min", "col": "value",
             "value": 0.0},
            {"rule_id": "r3_event_type_domain", "kind": "in_set",
             "col": "event_type",
             "values": ["click", "view", "purchase", "signup", "error"]},
        ],
    )


@register(
    "streaming_tar_ingest",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    doc="continuous tar-shard ingestion (streaming/taringest.py): the "
        "documents table is written as THREE tar-shard waves into a "
        "landing tree (the crawler-drop deployment shape), then "
        "tailed by a binaryFile file-source stream pruned to the "
        "path column (Spark's own exactly-once new-file log, "
        "maxFilesPerTrigger=2 forcing multiple microbatches); each "
        "batch parses its shards sequentially on executors (r14: "
        "tarfile r| — ONE member in RAM, never the shard; digest "
        "parity with the batch parser is contract-tested) and lands "
        "a batch-id-keyed manifest partition with overwrite (replays "
        "overwrite themselves, exactly-once end to end). The "
        "cross-batch manifest must equal the whole-table oracle: "
        "every document present exactly once, member bytes + md5 "
        "equal the source text's UTF-8 bytes",
)
def streaming_tar_ingest(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table
    from mongo2pq_spark.sources.tarshards import register_tarshards
    from mongo2pq_spark.streaming.taringest import run_streaming_tar_ingest

    register_tarshards(spark)
    docs = read_sf_table(spark, sf_dir, "documents")
    # staging keyed by the source generation (sources/staging.py):
    # re-runs over the SAME testdata re-write identical shard bytes
    # under the same paths, the file-source log skips already-seen
    # files, and batch-keyed manifest partitions overwrite themselves
    # — idempotent across repeated invocations. A REGENERATED
    # testdata tree gets a fresh root, because the file-source log
    # keys on path and would otherwise skip re-written shards and
    # serve stale digests.
    from mongo2pq_spark.sources.staging import generation_tmp_dir

    root = generation_tmp_dir(str(sf_dir), "stream_tar_ingest")
    landing = os.path.join(root, "landing")
    for k in range(3):
        (
            docs.filter(F.col("doc_id") % 3 == k)
            .select(
                F.concat(
                    F.lit("doc"), F.col("doc_id").cast("string"),
                    F.lit(".txt"),
                ).alias("name"),
                F.encode(F.col("text"), "UTF-8").alias("payload"),
            )
            .repartition(2)
            .write.format("tarshards")
            .mode("overwrite")
            .save(os.path.join(landing, f"wave{k}"))
        )
    manifest = run_streaming_tar_ingest(
        spark,
        landing,
        os.path.join(root, "manifest"),
        os.path.join(root, "ckpt"),
    )
    return manifest.select(
        F.regexp_extract(F.col("name"), r"^doc(\d+)\.txt$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "content_md5",
    )


def _nb_stream_oracle() -> str:
    """The SAME from-scratch single-pass NB SQL as classifier_nb_lang
    (train on the salted-md5 80% slice, score the held-out 20%):
    value-exact equality proves the STREAMED, batch-keyed count
    ingestion composes losslessly with the persisted store — waves
    may arrive in any grouping without changing a single score."""
    from mongo2pq_spark.queries.llm_pipeline import (
        _NB_TERMS_SQL,
        _nb_oracle,
    )

    return _nb_oracle(_NB_TERMS_SQL)


@register(
    "streaming_nb_ingest",
    _nb_stream_oracle(),
    doc="continuous classifier refresh (streaming/nbingest.py): the "
        "80% train slice lands as THREE parquet waves in a landing "
        "tree, tailed by a file-source stream (Spark's exactly-once "
        "new-file log, maxFilesPerTrigger=2 forcing multiple "
        "microbatches); each microbatch folds ONLY its own docs into "
        "the persisted NB count store under a stream-batch-keyed "
        "overwrite (replays replace themselves), the model rebuilds "
        "from two groupBy-sums over the store, and the held-out 20% "
        "is scored. Oracle = classifier_nb_lang's from-scratch SQL: "
        "equality proves streamed additive ingestion is lossless",
)
def streaming_nb_ingest(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from mongo2pq_spark.functions.hashing import token_hash32
    from mongo2pq_spark.operators.classifier import nb_score
    from mongo2pq_spark.queries.llm_pipeline import (
        _NB_SPLIT_SALT,
        _NB_TRAIN_PCT,
    )
    from mongo2pq_spark.sources.registry import read_sf_table
    from mongo2pq_spark.streaming.nbingest import run_streaming_nb_ingest

    docs = read_sf_table(spark, sf_dir, "documents")
    bucket = (
        token_hash32(
            F.concat(
                F.lit(_NB_SPLIT_SALT + ":"), F.col("doc_id").cast("string")
            )
        )
        % 100
    )
    split = docs.select("doc_id", "text", "lang", bucket.alias("bucket"))
    train = split.filter(F.col("bucket") < _NB_TRAIN_PCT)
    test = split.filter(F.col("bucket") >= _NB_TRAIN_PCT)

    # staging keyed by the source generation (sources/staging.py),
    # waves written ONCE behind a _SUCCESS guard: parquet part names
    # are not deterministic across writes, so re-writing a wave would
    # look like NEW files to the file-source log and double-ingest it
    # — the guard makes re-runs pure no-ops instead (production
    # landing trees are append-only producer drops; this rewrite
    # hazard is a test-fixture shape). A regenerated testdata tree
    # gets a fresh root.
    from mongo2pq_spark.sources.staging import generation_tmp_dir

    root = generation_tmp_dir(str(sf_dir), "stream_nb_ingest")
    landing = os.path.join(root, "landing")
    for k in range(3):
        wave = os.path.join(landing, f"wave{k}")
        if not os.path.exists(os.path.join(wave, "_SUCCESS")):
            (
                train.filter(F.col("doc_id") % 3 == k)
                .select("doc_id", "text", "lang")
                .write.mode("overwrite")
                .parquet(wave)
            )
    model, priors = run_streaming_nb_ingest(
        spark,
        landing,
        "doc_id bigint, text string, lang string",
        os.path.join(root, "nbstore"),
        os.path.join(root, "ckpt"),
        "lang",
    )
    pred = nb_score(test, model, priors)
    return pred.join(
        test.select("doc_id", F.col("lang").alias("true_label")), "doc_id"
    ).select("doc_id", "true_label", "pred_label", "score", "margin")
