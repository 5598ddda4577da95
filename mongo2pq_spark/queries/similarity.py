"""Similarity-search queries over the embeddings table.

Cosine values are computed in double precision in both engines and
rounded to 6 dp before ranking/compare; ranking ties break on
neighbor id, so orderings are engine-stable.
"""

from __future__ import annotations

from mongo2pq_spark.operators import similarity as ops
from mongo2pq_spark.queries.registry import register

_DIM = 64


def _sql_cosine(a: str, b: str) -> str:
    return f"list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


@register(
    "ann_topk_bruteforce",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
    ),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round({_sql_cosine('q.qv', 'e.embedding')}, 6) AS cosine_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine_sim,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
               ) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
    """,
    doc="exact top-5 cosine neighbors for 10 query vectors: queries broadcast, "
        "corpus never shuffled",
)
def ann_topk_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ops.cosine_topk(emb, queries, k=5)


def _lsh_bucket_sql(n_hyperplanes: int, seed: int = 7) -> str:
    planes = ops.hyperplanes(n_hyperplanes, _DIM, seed)
    terms = []
    for h, plane in enumerate(planes):
        lits = ", ".join(repr(c) for c in plane)
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), [{lits}]) > 0 "
            f"THEN (CAST(1 AS BIGINT) << {h}) ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def _lsh_multi_cte(n_tables: int, n_hyperplanes: int, seed: int = 7,
                   cap: int = ops.DEFAULT_MAX_BUCKET) -> str:
    """CTEs mirroring lsh_multi_assignments + the bucket-size cap."""
    per_table = "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, {t} AS table_id, "
        f"{_lsh_bucket_sql(n_hyperplanes, seed + t)} AS bucket FROM embeddings"
        for t in range(n_tables)
    )
    return f"""
    asg AS (
        {per_table}
    ),
    capped AS (
        SELECT vec_id, table_id, bucket FROM asg
        QUALIFY count(*) OVER (PARTITION BY table_id, bucket) <= {cap}
    )"""


@register(
    "embedding_near_dup",
    f"""
    WITH {_lsh_multi_cte(ops.NEAR_DUP_TABLES, ops.NEAR_DUP_PLANES)},
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM capped a JOIN capped b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
    )
    SELECT id_a AS vec_a, id_b AS vec_b,
           round({_sql_cosine('ea.embedding', 'eb.embedding')}, 6) AS cosine_sim
    FROM cand
    JOIN embeddings ea ON ea.vec_id = id_a
    JOIN embeddings eb ON eb.vec_id = id_b
    WHERE round({_sql_cosine('ea.embedding', 'eb.embedding')}, 6) >= 0.4
    """,
    doc=f"embedding-cosine near-dup pairs (≥ 0.4) via multi-table LSH "
        f"({ops.NEAR_DUP_TABLES} tables × 2^{ops.NEAR_DUP_PLANES} buckets, "
        "per-bucket cap) + exact cosine verify — candidate cost L·n·cap, "
        "linear in corpus size; all-pairs kept only as the test oracle",
)
def embedding_near_dup(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    return ops.embedding_near_dup_lsh(emb, threshold=0.4, dim=_DIM)


@register(
    "ann_lsh_buckets",
    f"""
    SELECT vec_id, {_lsh_bucket_sql(ops.DEFAULT_HYPERPLANES)} AS bucket
    FROM embeddings
    """,
    doc=f"random-hyperplane LSH bucket assignment ({ops.DEFAULT_HYPERPLANES} "
        "planes → 2^16 buckets); deterministic fixed-seed hyperplanes",
)
def ann_lsh_buckets(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    return ops.lsh_bucket_assignments(emb, dim=_DIM)


@register(
    "ann_ivf_recall",
    """
    SELECT vec_id AS query_id,
           CAST(5 AS BIGINT) AS n_results,
           true AS found_true_neighbor
    FROM embeddings WHERE vec_id < 10
    """,
    doc="IVF-style ANN with a built-in recall check: KMeans coarse "
        "quantizer (fixed seed → deterministic), n_probe=4 of 16 inverted "
        "lists per query, exact cosine within lists, then the IVF top-5 is "
        "joined against the brute-force top-5 computed in the same query. "
        "Emits per query: result count and whether ≥1 TRUE top-5 neighbor "
        "was recovered. The oracle asserts the invariant (5 results, "
        "neighbor found, for every query) — the tolerance-oracle pattern "
        "used for the approx aggregates; SQL cannot run KMeans, but it can "
        "pin what the quantizer must achieve",
)
def ann_ivf_recall(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ivf = ops.ivf_topk(emb, queries, k=5, n_probe=4)
    bf = ops.cosine_topk(emb, queries, k=5).select(
        "query_id", F.col("neighbor_id").alias("bf_neighbor_id")
    )
    hits = (
        ivf.join(
            bf,
            (ivf["query_id"] == bf["query_id"])
            & (ivf["neighbor_id"] == bf["bf_neighbor_id"]),
        )
        .groupBy(ivf["query_id"])
        .agg(F.count("*").alias("hits"))
        .select(F.col("query_id").alias("hit_query_id"), "hits")
    )
    per_query = ivf.groupBy("query_id").agg(
        F.count("*").alias("n_results")
    )
    return per_query.join(
        hits, per_query["query_id"] == hits["hit_query_id"], "left"
    ).select(
        "query_id",
        "n_results",
        (F.coalesce(F.col("hits"), F.lit(0)) >= 1).alias("found_true_neighbor"),
    )


@register(
    "ann_lsh_topk",
    f"""
    WITH {_lsh_multi_cte(ops.TOPK_TABLES, ops.TOPK_PLANES)},
    cand AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM capped a JOIN capped b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id <> b.vec_id
    ),
    sims AS (
        SELECT query_id, neighbor_id,
               round({_sql_cosine('eq.embedding', 'en.embedding')}, 6) AS cosine_sim
        FROM cand
        JOIN embeddings eq ON eq.vec_id = query_id
        JOIN embeddings en ON en.vec_id = neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine_sim,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
               ) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
    """,
    doc=f"approximate top-5 via multi-table LSH ({ops.TOPK_TABLES} tables × "
        f"2^{ops.TOPK_PLANES} buckets, per-bucket cap, candidate union) — no "
        "self-join on a small key; recall grows with table count at linear cost",
)
def ann_lsh_topk(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    return ops.lsh_topk(emb, k=5, dim=_DIM)


#: DuckDB oracle for `embedding_drift` (operators/similarity.py::
#: embedding_drift over a vec_id-parity split): per-dimension means
#: via a list-comprehension unnest (DuckDB lacks WITH ORDINALITY),
#: then the same cosine/L2/max-shift scalars. The max_shift_dim
#: tiebreak is EXPLICIT and mirrored in the Spark operator: the
#: lowest dim achieving the max absolute shift (arg_max/max_by are
#: nondeterministic on ties, and the zero-drift case ties every dim
#: at exactly 0.0). Cross-engine parity is also pinned by
#: tests/test_operators.py::test_embedding_drift_matches_duckdb_oracle.
DRIFT_ORACLE_SQL = """
    WITH m AS (
        SELECT vec_id % 2 AS segment, s.i AS dim, avg(s.v) AS mean_val
        FROM (
            SELECT vec_id,
                   unnest([{'i': i - 1, 'v': embedding[i]}
                           FOR i IN generate_series(1, len(embedding))]) AS s
            FROM embeddings
        )
        GROUP BY 1, 2
    ), a AS (SELECT dim, mean_val AS ma FROM m WHERE segment = 0),
       b AS (SELECT dim, mean_val AS mb FROM m WHERE segment = 1),
       j AS (
        SELECT dim, ma, mb, abs(ma - mb) AS shift,
               max(abs(ma - mb)) OVER () AS mx
        FROM a JOIN b USING (dim)
       )
    SELECT round(sum(ma*mb) / (sqrt(sum(ma*ma)) * sqrt(sum(mb*mb))), 6)
               AS mean_cosine,
           round(sqrt(sum(shift*shift)), 6) AS shift_l2,
           CAST(min(CASE WHEN shift = mx THEN dim END) AS BIGINT)
               AS max_shift_dim,
           round(max(shift), 6) AS max_shift
    FROM j
    """


@register(
    "embedding_drift",
    DRIFT_ORACLE_SQL,
    doc="drift report between two corpus halves (vec_id parity split): "
        "cosine of the segment mean vectors, L2 norm of the mean shift, "
        "and the lowest dimension achieving the max absolute shift — one "
        "linear posexplode pass into a (segment, dim) aggregate, then "
        "everything computes on 2×dim rows; deterministic tiebreak "
        "mirrored in the DuckDB oracle",
)
def embedding_drift(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    return ops.embedding_drift(emb, F.pmod(F.col("vec_id"), F.lit(2)))


@register(
    "semdedup_prune_consistency",
    """
    SELECT vec_id, true AS prune_consistent
    FROM embeddings
    """,
    doc="SemDeDup-style semantic dedup (KMeans clusters + within-"
        "cluster cosine prune at 0.4, lowest id kept — "
        "operators/similarity.py::semdedup_prune, after Abbas et al. "
        "2023). The tolerance/invariant oracle pattern (as "
        "ann_ivf_recall): SQL cannot run KMeans, but it can pin what "
        "the prune rule must satisfy for EVERY vector — the emitted "
        "kept/dropped status is re-derived here from the returned "
        "cluster assignment with an independent aggregation-based "
        "formulation (per-vector max cosine to lower-id cluster "
        "members via groupBy, vs the operator's filter+distinct+"
        "anti-join path) and must agree on all rows",
)
def semdedup_prune_consistency(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.functions.vectors import cosine
    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    # DELIBERATELY not cache_stream-ed (measured r11, A/B at sf0.1):
    # res feeds three consumers, but the a/b branches prune away the
    # expensive dropped-set anti-join (they only need vec_id/cluster),
    # so uncached the prune join runs ONCE (in the final branch) over
    # the operator's cached assignment — warm 2.9 s. Caching res
    # forces materializing the FULL plan incl. the left join before
    # any branch can prune, measured 4.8 s warm. Catalyst's
    # cross-branch column pruning beats the cache here.
    res = ops.semdedup_prune(emb, n_clusters=16, threshold=0.4, dim=_DIM)
    labeled = res.join(emb.select("vec_id", "embedding"), "vec_id")
    a = labeled.select(
        "cluster",
        F.col("vec_id").alias("lo_id"),
        F.col("embedding").alias("lo_vec"),
    )
    b = labeled.select(
        "cluster",
        F.col("vec_id").alias("hi_id"),
        F.col("embedding").alias("hi_vec"),
    )
    # independent re-derivation: a vector must be dropped iff its max
    # exact cosine to any LOWER-id member of its cluster reaches the
    # threshold (the fixture sits far below the operator's skew guard,
    # so sub-bucketing is inactive and cluster scope is exact)
    wit = (
        a.join(b, "cluster")
        .filter(F.col("lo_id") < F.col("hi_id"))
        .groupBy("hi_id")
        .agg(
            F.max(
                F.round(cosine(F.col("lo_vec"), F.col("hi_vec")), 6)
            ).alias("max_cos")
        )
        .select(F.col("hi_id").alias("vec_id"), "max_cos")
    )
    consistent = F.when(
        F.col("kept"),
        F.coalesce(F.col("max_cos") < 0.4, F.lit(True)),
    ).otherwise(F.coalesce(F.col("max_cos") >= 0.4, F.lit(False)))
    return (
        res.join(wit, "vec_id", "left")
        .select("vec_id", consistent.alias("prune_consistent"))
    )


def _lsh_asg_sql(where: str, n_tables: int, n_hyperplanes: int,
                 seed: int = 7) -> str:
    """Per-table assignment UNION mirroring lsh_multi_assignments over
    a filtered slice of the embeddings view."""
    return "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, {t} AS table_id, "
        f"{_lsh_bucket_sql(n_hyperplanes, seed + t)} AS bucket "
        f"FROM embeddings WHERE {where}"
        for t in range(n_tables)
    )


@register(
    "embedding_incremental_near_dups",
    f"""
    WITH idx_asg AS (
        {_lsh_asg_sql('vec_id % 2 = 0', ops.NEAR_DUP_TABLES,
                      ops.NEAR_DUP_PLANES)}
    ),
    idx_capped AS (
        SELECT vec_id, table_id, bucket FROM idx_asg
        QUALIFY count(*) OVER (PARTITION BY table_id, bucket)
                <= {ops.DEFAULT_MAX_BUCKET}
    ),
    inc_asg AS (
        {_lsh_asg_sql('vec_id % 2 = 1', ops.NEAR_DUP_TABLES,
                      ops.NEAR_DUP_PLANES)}
    ),
    cand AS (
        SELECT DISTINCT i.vec_id AS inc_id, x.vec_id AS idx_id
        FROM inc_asg i JOIN idx_capped x
          ON i.table_id = x.table_id AND i.bucket = x.bucket
    ),
    dups AS (
        SELECT DISTINCT inc_id FROM cand
        JOIN embeddings ei ON ei.vec_id = inc_id
        JOIN embeddings ex ON ex.vec_id = idx_id
        WHERE round({_sql_cosine('ei.embedding', 'ex.embedding')}, 6) >= 0.4
    )
    SELECT vec_id,
           NOT EXISTS (SELECT 1 FROM dups d WHERE d.inc_id = vec_id)
               AS is_new
    FROM embeddings WHERE vec_id % 2 = 1
    """,
    doc="Incremental EMBEDDING dedup against a corpus vector index "
        "(operators/similarity.py::embedding_incremental_near_dups), "
        "completing the incremental-ingestion matrix across all four "
        "content modalities (text digests/bands, image dHash, audio "
        "envelope, embedding LSH): odd-id vectors arrive as the new "
        "batch and probe the even-id corpus via the multi-table LSH "
        "bucket equi-join — O(increment·L + collisions), corpus never "
        "self-joined — with exact cosine verify at 0.4 and the corpus-"
        "side bucket cap (degenerate buckets only ever UNDER-flag). "
        "Deterministic fixed-seed hyperplanes, so the oracle runs the "
        "identical pipeline in SQL and values match bit-for-bit",
)
def embedding_incremental_near_dups(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    index = emb.filter(F.col("vec_id") % 2 == 0)
    new_batch = emb.filter(F.col("vec_id") % 2 == 1)
    return ops.embedding_incremental_near_dups(
        new_batch, index, threshold=0.4, dim=_DIM
    )


@register(
    "ann_hard_negatives",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv, label AS ql
        FROM embeddings WHERE vec_id < 10
    ),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               e.label AS neighbor_label,
               round({_sql_cosine('q.qv', 'e.embedding')}, 6)
                   AS cosine_sim
        FROM q, embeddings e
        WHERE e.label <> q.ql
    ),
    ranked AS (
        SELECT query_id, neighbor_id, neighbor_label, cosine_sim,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine_sim DESC, neighbor_id
               ) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine_sim, rank
    FROM ranked WHERE rank <= 5
    """,
    doc="hard-negative mining (contrastive-training data prep): per "
        "query vector the 5 most-similar corpus vectors with a "
        "DIFFERENT label — label mismatch filtered below the ranking "
        "window; queries broadcast, corpus scanned once, never "
        "shuffled (self-match excluded for free: same vector => same "
        "label)",
)
def ann_hard_negatives(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    return ops.hard_negatives(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "embedding_covariance",
    """
    WITH x AS (
        SELECT vec_id,
               unnest(generate_series(1, len(embedding))) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    n AS (SELECT count(*) AS n FROM embeddings),
    m AS (SELECT i, avg(v) AS m FROM x GROUP BY i),
    xx AS (
        SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS s
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    )
    SELECT CAST(xx.i - 1 AS BIGINT) AS dim_i,
           CAST(xx.j - 1 AS BIGINT) AS dim_j,
           round(s / n.n - mi.m * mj.m, 6) + 0.0 AS cov
    FROM xx
    JOIN m mi ON xx.i = mi.i
    JOIN m mj ON xx.j = mj.i
    CROSS JOIN n
    """,
    doc="embedding covariance matrix (upper triangle as rows) — the "
        "cross-dimension statistic behind whitening/PCA that per-dim "
        "stats cannot see. Spark side is the map-side GRAM pattern: "
        "each Arrow batch reduces to one dxd partial (sum xx^T, sum "
        "x, n) on the executor, so the shuffle carries O(batches*d^2) "
        "tiny rows and the corpus is read once; the oracle's per-pair "
        "self-join formulation (d^2-amplifying) is exactly the shape "
        "the operator avoids. Output bounded at d(d+1)/2 rows",
)
def embedding_covariance(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    return ops.embedding_covariance(emb)


#: fixed query-by-example documents for the hybrid retrieval surface
#: (ids exist at every scale factor; the SAME literals are baked into
#: the oracle SQL below)
RRF_EXAMPLES = [7, 123, 321]
_RRF_DEPTH = 50
_RRF_K = 60
_RRF_TOPN = 10


def _rrf_oracle() -> str:
    from mongo2pq_spark.functions.textfns import sql_tokens

    ex_values = ", ".join(f"('ex{i}', {i})" for i in RRF_EXAMPLES)
    return f"""
    WITH ex(query_id, qid) AS (VALUES {ex_values}),
    toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    q AS (
        SELECT ex.query_id, ex.qid, tf.term
        FROM tf JOIN ex ON tf.doc_id = ex.qid
    ),
    docfreq AS (
        SELECT q.query_id, q.term, count(*) AS df
        FROM tf JOIN q ON tf.term = q.term GROUP BY 1, 2
    ),
    scored AS (
        SELECT q.query_id, q.qid, tf.doc_id,
               round(sum(
                   ln(1.0 + (stats.n_docs - docfreq.df + 0.5)
                          / (docfreq.df + 0.5))
                   * (tf.tf * (1.2 + 1.0))
                   / (tf.tf + 1.2 * (1.0 - 0.75
                      + 0.75 * dl.dl / stats.avgdl))
               ), 6) AS score
        FROM tf
        JOIN q ON tf.term = q.term
        JOIN docfreq ON q.query_id = docfreq.query_id
                    AND q.term = docfreq.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY q.query_id, q.qid, tf.doc_id
    ),
    lex AS (
        SELECT query_id, doc_id, rank AS lex_rank FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, doc_id
                   ) AS rank
            FROM scored WHERE doc_id <> qid
        ) WHERE rank <= {_RRF_DEPTH}
    ),
    dense AS (
        SELECT query_id, doc_id, rank AS dense_rank FROM (
            SELECT ex.query_id, e.vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY ex.query_id
                       ORDER BY round({_sql_cosine('qe.embedding',
                                                   'e.embedding')}, 6)
                                DESC, e.vec_id
                   ) AS rank
            FROM ex
            JOIN embeddings qe ON qe.vec_id = ex.qid
            CROSS JOIN embeddings e
            WHERE e.vec_id <> ex.qid
        ) WHERE rank <= {_RRF_DEPTH}
    ),
    fused AS (
        SELECT coalesce(l.query_id, d.query_id) AS query_id,
               coalesce(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rank, d.dense_rank,
               round(coalesce(1.0 / ({_RRF_K} + l.lex_rank), 0.0)
                     + coalesce(1.0 / ({_RRF_K} + d.dense_rank), 0.0),
                     9) AS rrf_score
        FROM lex l FULL OUTER JOIN dense d
          ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score, rank, lex_rank, dense_rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id
               ) AS rank
        FROM fused
    ) WHERE rank <= {_RRF_TOPN}
    """


@register(
    "retrieval_rrf_fusion",
    _rrf_oracle(),
    doc="hybrid retrieval: reciprocal-rank fusion (k=60) of BM25 and "
        "exact-cosine rankings for 3 query-by-example documents — "
        "each example's distinct tokens form its sparse query and its "
        "embedding its dense query, both rankings truncated at depth "
        "50 with the example excluded, fused over the candidate UNION "
        "(absent rank contributes 0), top-10 emitted. Composes the "
        "BM25 scoring core with cosine_topk: one cached tokenize "
        "pass, broadcast query terms, two-phase salted lexical top-k, "
        "broadcast example vectors (corpus never shuffled); fusion "
        "joins two pre-truncated <=150-row rankings, so its full-"
        "outer join and final window are bounded by construction. "
        "rrf_score rounds to 9 dp before ranking, ties break on "
        "doc_id; lex_rank/dense_rank are NULL where one side did not "
        "surface the candidate",
)
def retrieval_rrf_fusion(spark, sf_dir):
    from mongo2pq_spark.operators.retrieval import hybrid_rrf_topk
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    emb = read_sf_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(
        docs,
        emb,
        RRF_EXAMPLES,
        depth=_RRF_DEPTH,
        rrf_k=_RRF_K,
        top_n=_RRF_TOPN,
    )


@register(
    "ann_pq_recall",
    """
    SELECT vec_id AS query_id,
           CAST(10 AS BIGINT) AS n_results,
           true AS found_true_neighbor
    FROM embeddings WHERE vec_id < 10
    """,
    doc="product-quantization ANN with a built-in recall check "
        "(Jegou et al. 2011): vectors L2-normalize and split into 16 "
        "subspaces quantized to 32 centroids each (the corpus "
        "compresses ~25x and search never touches raw vectors); ADC "
        "ranks each query by summing per-subspace lookup-table "
        "distances in a JVM-side array fold over the broadcast LUT. "
        "The PQ top-10 joins against the exact-cosine top-5 computed "
        "in the same query; the oracle asserts the invariant (10 "
        "results and >=1 true top-5 neighbor recovered, for every "
        "query) — the IVF/semdedup tolerance-oracle pattern: SQL "
        "cannot run k-means, but it can pin what the quantizer must "
        "achieve. Codebooks train driver-side on a bounded "
        "deterministic sample; encoding is one Arrow-batched pass",
)
def ann_pq_recall(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    from mongo2pq_spark.operators.cache import cache_stream

    emb = read_sf_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # the top-k feeds three branches (hits join, per-query counts);
    # uncached, each branch re-runs the Arrow encode pass over the
    # corpus — and unlike semdedup, no branch prunes the expensive
    # subtree, so caching the ≤ queries×k-row result is pure win
    pq = cache_stream(ops.pq_topk(emb, queries, k=10, m=16, ksub=32))
    bf = ops.cosine_topk(emb, queries, k=5).select(
        "query_id", F.col("neighbor_id").alias("bf_neighbor_id")
    )
    hits = (
        pq.join(
            bf,
            (pq["query_id"] == bf["query_id"])
            & (pq["neighbor_id"] == bf["bf_neighbor_id"]),
        )
        .groupBy(pq["query_id"])
        .agg(F.count("*").alias("hits"))
        .select(F.col("query_id").alias("hit_query_id"), "hits")
    )
    per_query = pq.groupBy("query_id").agg(
        F.count("*").alias("n_results")
    )
    return per_query.join(
        hits, per_query["query_id"] == hits["hit_query_id"], "left"
    ).select(
        "query_id",
        "n_results",
        (F.coalesce(F.col("hits"), F.lit(0)) >= 1).alias(
            "found_true_neighbor"
        ),
    )


@register(
    "embedding_label_agreement",
    f"""
    WITH x AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    m AS (SELECT label AS clabel, i, avg(v) AS mv FROM x GROUP BY 1, 2),
    c AS (
        SELECT clabel, array_agg(mv ORDER BY i) AS centroid
        FROM m GROUP BY 1
    ),
    s AS (
        SELECT e.vec_id, e.label, c.clabel,
               round({_sql_cosine('e.embedding', 'c.centroid')}, 6) AS s
        FROM embeddings e CROSS JOIN c
    ),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY vec_id ORDER BY s DESC, clabel
               ) AS rn
        FROM s
    )
    SELECT vec_id, label, CAST(clabel AS INTEGER) AS nearest_label,
           s AS centroid_sim, label = clabel AS agrees
    FROM r WHERE rn = 1
    """,
    doc="label-noise screening by nearest-centroid classification "
        "(the Confident-Learning-style check before trusting labels): "
        "per-label mean embeddings via the drift monitor's "
        "map-side-combinable (label, dim) aggregate, broadcast back; "
        "each vector's argmax over the bounded label set is a grouped "
        "struct max (sim desc, lowest label on 6-dp ties — never a "
        "tie-nondeterministic max_by, never a corpus-partitioned "
        "window); disagreement rows are the mislabeling candidates",
)
def embedding_label_agreement(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    return ops.nearest_centroid_agreement(emb)


@register(
    "retrieval_eval_metrics",
    f"""
    WITH {_lsh_multi_cte(ops.TOPK_TABLES, ops.TOPK_PLANES)},
    cand AS (
        SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
        FROM capped a JOIN capped b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id <> b.vec_id
    ),
    approx AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round({_sql_cosine('eq.embedding',
                                               'en.embedding')}, 6) DESC,
                            neighbor_id
               ) AS rank
        FROM cand
        JOIN embeddings eq ON eq.vec_id = query_id
        JOIN embeddings en ON en.vec_id = neighbor_id
        WHERE query_id < 10
    ),
    approx5 AS (SELECT * FROM approx WHERE rank <= 5),
    truth AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({_sql_cosine('q.qv',
                                                   'e.embedding')}, 6) DESC,
                                e.vec_id
                   ) AS rank
            FROM (SELECT vec_id AS query_id, embedding AS qv
                  FROM embeddings WHERE vec_id < 10) q,
                 embeddings e
            WHERE e.vec_id <> q.query_id
        ) WHERE rank <= 5
    ),
    scored AS (
        SELECT a.query_id, a.rank,
               CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END
                   AS rel,
               CASE WHEN t.rank = 1 THEN a.rank END AS top1_rank
        FROM approx5 a
        LEFT JOIN truth t
          ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    ),
    per_q AS (
        SELECT query_id,
               sum(rel) AS hits,
               sum(rel / log2(CAST(rank + 1 AS DOUBLE))) AS dcg,
               min(top1_rank) AS rr_rank
        FROM scored GROUP BY query_id
    ),
    ideal AS (
        SELECT query_id, count(*) AS n_truth,
               sum(1.0 / log2(CAST(rank + 1 AS DOUBLE))) AS idcg
        FROM truth GROUP BY query_id
    )
    SELECT i.query_id,
           CAST(i.n_truth AS BIGINT) AS n_truth,
           CAST(coalesce(p.hits, 0) AS BIGINT) AS hits,
           round(coalesce(p.hits, 0) * 1.0 / i.n_truth, 6) + 0.0
               AS recall_at_5,
           round(coalesce(1.0 / p.rr_rank, 0.0), 6) + 0.0 AS rr_at_5,
           round(coalesce(p.dcg, 0.0) / i.idcg, 6) + 0.0 AS ndcg_at_5
    FROM ideal i LEFT JOIN per_q p USING (query_id)
    """,
    doc="retrieval-quality evaluation harness: recall@5, reciprocal "
        "rank of the TRUE nearest neighbor, and binary-relevance "
        "nDCG@5 of the multi-table-LSH ranking against the exact "
        "cosine ground truth, per query — the metrics every "
        "ANN-index rollout gates on (the pq recall invariant is the "
        "pass/fail version; this emits the graded scores). Shape: "
        "both rankings come from the existing bounded machinery "
        "(queries broadcast, banded candidates), the metric joins "
        "are over ≤ queries×k rows. Engine-exact: hit counts are "
        "integers, the only floats are the fixed 1/log2(rank+1) "
        "weights summed over ≤5 terms and rounded",
)
def retrieval_eval_metrics(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.operators.cache import cache_stream
    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # truth (queries×k rows) feeds TWO consumers — the relevance join
    # and the ideal-DCG aggregate; uncached, each re-runs the full
    # broadcast-cosine corpus scan (guide §1.2/§5; measured r19: the
    # scan appeared twice in the plan, 17 jobs)
    truth = cache_stream(ops.cosine_topk(emb, queries, k=5))
    approx = ops.lsh_topk(emb, k=5, dim=_DIM).filter(F.col("query_id") < 10)
    scored = approx.join(
        truth.select(
            "query_id",
            "neighbor_id",
            F.col("rank").alias("t_rank"),
        ),
        ["query_id", "neighbor_id"],
        "left",
    ).select(
        "query_id",
        "rank",
        F.when(F.col("t_rank").isNotNull(), 1).otherwise(0).alias("rel"),
        F.when(F.col("t_rank") == 1, F.col("rank")).alias("top1_rank"),
    )
    per_q = scored.groupBy("query_id").agg(
        F.sum("rel").alias("hits"),
        F.sum(
            F.col("rel") / F.log2((F.col("rank") + 1).cast("double"))
        ).alias("dcg"),
        F.min("top1_rank").alias("rr_rank"),
    )
    ideal = truth.groupBy("query_id").agg(
        F.count("*").alias("n_truth"),
        F.sum(
            F.lit(1.0) / F.log2((F.col("rank") + 1).cast("double"))
        ).alias("idcg"),
    )
    j = ideal.join(per_q, "query_id", "left")
    return j.select(
        "query_id",
        F.col("n_truth").cast("bigint").alias("n_truth"),
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
        (
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) * 1.0
                / F.col("n_truth"),
                6,
            )
            + F.lit(0.0)
        ).alias("recall_at_5"),
        (
            F.round(
                F.coalesce(F.lit(1.0) / F.col("rr_rank"), F.lit(0.0)), 6
            )
            + F.lit(0.0)
        ).alias("rr_at_5"),
        (
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
            )
            + F.lit(0.0)
        ).alias("ndcg_at_5"),
    )


@register(
    "embedding_calibration_bins",
    f"""
    WITH x AS (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    m AS (SELECT label AS clabel, i, avg(v) AS mv FROM x GROUP BY 1, 2),
    c AS (
        SELECT clabel, array_agg(mv ORDER BY i) AS centroid
        FROM m GROUP BY 1
    ),
    s AS (
        SELECT e.vec_id, e.label, c.clabel,
               round({_sql_cosine('e.embedding', 'c.centroid')}, 6) AS s
        FROM embeddings e CROSS JOIN c
    ),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY vec_id ORDER BY s DESC, clabel
               ) AS rn
        FROM s
    ),
    pred AS (
        SELECT vec_id, label = clabel AS agrees, s AS conf,
               least(greatest(CAST(floor((s + 1.0) * 5) AS BIGINT),
                              0), 9) AS bin
        FROM r WHERE rn = 1
    ),
    b AS (
        SELECT bin, count(*) AS n,
               sum(CASE WHEN agrees THEN 1 ELSE 0 END) AS n_correct,
               round(avg(conf), 6) AS avg_conf
        FROM pred GROUP BY bin
    )
    SELECT bin,
           CAST(n AS BIGINT) AS n,
           CAST(n_correct AS BIGINT) AS n_correct,
           round(CAST(n_correct AS DOUBLE) / n, 6) + 0.0 AS accuracy,
           avg_conf + 0.0 AS avg_conf,
           round(abs(round(CAST(n_correct AS DOUBLE) / n, 6)
                     - avg_conf), 6) + 0.0 AS calibration_gap
    FROM b
    """,
    doc="calibration audit of the nearest-centroid classifier "
        "(reliability-diagram bins, the per-bin terms of expected "
        "calibration error): confidence = cosine similarity to the "
        "predicted centroid, binned into 10 fixed-width bins over "
        "[-1, 1]; each bin reports observed accuracy vs mean "
        "confidence and their gap — an over-confident label model is "
        "exactly what a label-noise screen must not trust. Shape: "
        "the classifier is the label_agreement machinery (bounded "
        "centroid broadcast, grouped struct-max argmax), then one "
        "bounded 10-key aggregate. The gap subtracts the two ROUNDED "
        "quantities, so it is engine-exact given the 6-dp contract "
        "the whole similarity family uses",
)
def embedding_calibration_bins(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    pred = ops.nearest_centroid_agreement(emb).select(
        F.col("agrees"),
        F.col("centroid_sim").alias("conf"),
        F.least(
            F.greatest(
                F.floor((F.col("centroid_sim") + 1.0) * 5).cast("bigint"),
                F.lit(0),
            ),
            F.lit(9),
        ).alias("bin"),
    )
    b = pred.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("agrees"), 1).otherwise(0)).alias("n_correct"),
        F.round(F.avg("conf"), 6).alias("avg_conf"),
    )
    acc = F.round(F.col("n_correct").cast("double") / F.col("n"), 6)
    return b.select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        (acc + F.lit(0.0)).alias("accuracy"),
        (F.col("avg_conf") + F.lit(0.0)).alias("avg_conf"),
        (F.round(F.abs(acc - F.col("avg_conf")), 6) + F.lit(0.0)).alias(
            "calibration_gap"
        ),
    )


@register(
    "embedding_pca_invariants",
    """
    SELECT a AS comp_a, b AS comp_b, true AS ok
    FROM (SELECT unnest(generate_series(0, 3)) AS a) x,
         (SELECT unnest(generate_series(0, 3)) AS b) y
    WHERE a <= b
    """,
    doc="PCA projection under the invariant-oracle pattern "
        "(promotes the tested-but-unregistered pca_project operator "
        "into the driver gate): project the corpus onto its top-4 "
        "principal components (Gram-sums bounded collect, driver-side "
        "eigh, JVM-side zip_with/aggregate folds — no Python in the "
        "per-row path), then verify WHAT PCA MUST ACHIEVE, which SQL "
        "can pin even though it cannot run an eigendecomposition: "
        "component variances are positive and non-increasing "
        "(var(pc0) >= ... >= var(pc3)) and distinct components are "
        "uncorrelated (|cov| < 1e-3, the tolerance absorbing the "
        "operator's published 6-dp rounding). One corpus pass for "
        "the projection, one map-side aggregate row for all 15 "
        "moments, a 10-row literal pair table joined against it — "
        "output bounded by k², independent of corpus size",
)
def embedding_pca_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    k = 4
    pcs = ops.pca_project(emb, k=k)
    cols = [f"pc{c}" for c in range(k)]
    aggs = (
        [F.count("*").alias("n")]
        + [F.sum(F.col(c)).alias(f"s{i}") for i, c in enumerate(cols)]
        + [
            F.sum(F.col(cols[a]) * F.col(cols[b])).alias(f"p{a}_{b}")
            for a in range(k)
            for b in range(a, k)
        ]
    )
    stats = pcs.agg(*aggs)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(k) for b in range(k) if a <= b],
        "comp_a int, comp_b int",
    )

    def cov(a: int, b: int):
        a, b = min(a, b), max(a, b)
        return (
            F.col(f"p{a}_{b}") / F.col("n")
            - (F.col(f"s{a}") / F.col("n")) * (F.col(f"s{b}") / F.col("n"))
        )

    # element_at-indexed flat k x k cov table so one expression serves
    # every (comp_a, comp_b) row of the literal pair table
    cov_arr = F.array(*[cov(a, b) for a in range(k) for b in range(k)])
    var_arr = F.array(*[cov(a, a) for a in range(k)])
    j = pairs.crossJoin(F.broadcast(stats))
    cab = F.element_at(cov_arr, F.col("comp_a") * k + F.col("comp_b") + 1)
    va = F.element_at(var_arr, F.col("comp_a") + 1)
    va_next = F.element_at(
        var_arr, F.least(F.col("comp_a") + 2, F.lit(k))
    )
    ok = F.when(
        F.col("comp_a") == F.col("comp_b"),
        (va > 1e-9)
        & ((F.col("comp_a") == k - 1) | (va >= va_next - 1e-6)),
    ).otherwise(F.abs(cab) < 1e-3)
    return j.select("comp_a", "comp_b", ok.alias("ok"))


@register(
    "embedding_whitening_identity",
    """
    SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
           true AS ok
    FROM (SELECT unnest(generate_series(0, 63)) AS i) a,
         (SELECT unnest(generate_series(0, 63)) AS j) b
    WHERE i <= j
    """,
    doc="ZCA whitening under the invariant oracle: whiten the corpus "
        "(one-pass Gram sums, driver-side eigh, JVM-side folds — the "
        "pca_project machinery) and verify WHAT WHITENING MUST "
        "ACHIEVE: the whitened population covariance is the identity "
        "— diagonal within 1e-4 of 1 (eps=1e-9 regularization and "
        "the spectrum's lambda_min ~7e-3 keep lambda/(lambda+eps) "
        "indistinguishable from 1), off-diagonal within 1e-4 of 0. "
        "The check reuses embedding_covariance's map-side-Gram "
        "verification pass over the whitened vectors, so the "
        "invariant is established by the INDEPENDENT covariance "
        "formulation, not by the whitener's own numbers. Output "
        "d(d+1)/2 rows, bounded by embedding width",
)
def embedding_whitening_identity(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    emb = read_sf_table(spark, sf_dir, "embeddings")
    white = ops.whiten_embeddings(emb).select(
        "vec_id", F.col("white").alias("embedding")
    )
    cov = ops.embedding_covariance(white)
    ident = F.when(F.col("dim_i") == F.col("dim_j"), 1.0).otherwise(0.0)
    return cov.select(
        "dim_i",
        "dim_j",
        (F.abs(F.col("cov") - ident) < 1e-4).alias("ok"),
    )
