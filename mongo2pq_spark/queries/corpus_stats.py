"""Corpus- and dataset-level statistics queries: deterministic
train/val/test splitting, unigram language-model quality scoring,
contamination overlap profiling, embedding-norm QA, robust (median/MAD)
anomaly detection, cohort retention, grouping-sets aggregation, and
exact heavy-hitter detection.

These extend the training-data-pipeline surface (llm_pipeline.py /
text.py) with the audit/QA passes a 100 TB corpus runs between dedup
and shipping shards. Every query is a pure DataFrame plan with a
value-exact DuckDB oracle; medians are rounded to 6 decimals in BOTH
engines before any downstream comparison so interpolation ulp noise
cannot flip a flag.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2pq_spark.functions.hashing import sql_token_hash32, token_hash32
from mongo2pq_spark.functions.textfns import (
    sql_tokens,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from mongo2pq_spark.functions.vectors import norm
from mongo2pq_spark.queries.registry import register


def _t(spark, sf_dir, name):
    from mongo2pq_spark.sources.registry import read_sf_table

    return read_sf_table(spark, sf_dir, name)


# -- deterministic train/val/test split --------------------------------------

_SPLIT_SALT = "split:"
_TRAIN_PCT, _VAL_PCT = 80, 10  # test = remainder


@register(
    "corpus_train_val_split",
    f"""
    WITH b AS (
        SELECT doc_id,
               {sql_token_hash32(f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")}
                   % 100 AS bucket
        FROM documents
    )
    SELECT doc_id,
           CAST(bucket AS BIGINT) AS bucket,
           CASE WHEN bucket < {_TRAIN_PCT} THEN 'train'
                WHEN bucket < {_TRAIN_PCT + _VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="deterministic train/val/test assignment: split = md5-hash of the "
        "salted doc id mod 100 against fixed 80/10/10 cut points — a pure "
        "map-side projection (ZERO shuffles, no RNG state), stable across "
        "engines, runs, and cluster sizes, so a doc never migrates between "
        "splits when the corpus is re-processed. The salt decorrelates the "
        "split from every other hash use of doc_id",
)
def corpus_train_val_split(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        token_hash32(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string")))
        % 100
    )
    return docs.select(
        "doc_id",
        bucket.cast("bigint").alias("bucket"),
        F.when(bucket < _TRAIN_PCT, "train")
        .when(bucket < _TRAIN_PCT + _VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


# -- unigram LM quality proxy ------------------------------------------------


@register(
    "text_unigram_logprob",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ),
    dt AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    cf AS (SELECT term, sum(tf) AS cf FROM dt GROUP BY 1),
    tot AS (SELECT sum(cf) AS total FROM cf)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(sum(tf * ln(CAST(total AS DOUBLE) / CAST(cf AS DOUBLE)))
                 / sum(tf), 6) AS avg_neg_logp
    FROM dt JOIN cf USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="unigram-LM quality proxy (perplexity stand-in): per-document "
        "mean negative log-probability of its tokens under the corpus "
        "unigram distribution — the classic cheap fluency score for "
        "corpus filtering. Shape: doc×term counts (high-cardinality "
        "groupBy, map-side combinable), PERSISTED once via the bounded "
        "cache — the aggregate feeds three consumers (term freqs, the "
        "corpus total, and the scoring join) and Catalyst has no "
        "cross-branch subtree reuse, so without the cache the corpus "
        "would be scanned and exploded three times (verified in the "
        "physical plan) → shuffle join on term (AQE; vocab is too big "
        "to assume broadcast at 100 TB) → one final agg per doc. The "
        "corpus-total is a 1-row cross join, not a driver collect",
)
def text_unigram_logprob(spark, sf_dir):
    from mongo2pq_spark.operators.cache import cache_stream

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    dt = cache_stream(
        toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    cf = dt.groupBy("term").agg(F.sum("tf").alias("cf"))
    tot = cf.agg(F.sum("cf").alias("total"))
    scored = dt.join(cf, "term").crossJoin(F.broadcast(tot))
    neg_logp = F.col("tf") * F.log(
        F.col("total").cast("double") / F.col("cf").cast("double")
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(F.sum(neg_logp) / F.sum("tf"), 6).alias("avg_neg_logp"),
    )


# -- contamination overlap profile -------------------------------------------

_BENCH_FILTER = "doc_id % 100 = 0"  # deterministic benchmark stand-in
_CONTAM_FRAC = 0.05


@register(
    "contamination_overlap_frac",
    f"""
    WITH bench AS (SELECT text FROM documents WHERE {_BENCH_FILTER}),
    btoks AS (SELECT {sql_tokens('text')} AS t FROM bench),
    bsh AS (
        SELECT DISTINCT {sql_token_hash32('s')} AS h
        FROM (SELECT unnest(list_distinct({sql_word_shingles('t', 3)})) AS s
              FROM btoks)
    ),
    dtoks AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
    dsh AS (
        SELECT doc_id, {sql_token_hash32('s')} AS h
        FROM (SELECT doc_id, unnest(list_distinct({sql_word_shingles('t', 3)})) AS s
              FROM dtoks)
    ),
    agg AS (
        SELECT doc_id,
               count(*) AS n_shingles,
               sum(CASE WHEN h IN (SELECT h FROM bsh) THEN 1 ELSE 0 END)
                   AS bench_overlap
        FROM dsh GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(a.bench_overlap, 0) AS BIGINT) AS bench_overlap,
           round(coalesce(a.bench_overlap, 0) * 1.0
                 / greatest(coalesce(a.n_shingles, 0), 1), 6) AS overlap_frac,
           round(coalesce(a.bench_overlap, 0) * 1.0
                 / greatest(coalesce(a.n_shingles, 0), 1), 6)
               >= {_CONTAM_FRAC} AS contaminated
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
    doc="contamination PROFILE (the graded companion to the boolean "
        "text_decontaminate): per document, the fraction of its distinct "
        "3-gram shingles that appear in any benchmark text, flagged at "
        "≥ 5% overlap. The benchmark shingle set is tiny (eval suites, "
        "not web data) and explicitly broadcast; the corpus side is one "
        "explode → left join → per-doc aggregation, never self-joined",
)
def contamination_overlap_frac(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    doc_sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), 3))
        ).alias("s"),
    ).select("doc_id", token_hash32(F.col("s")).alias("h"))
    bench_sh = (
        docs.filter(F.expr(_BENCH_FILTER))
        .select(
            F.explode(
                F.array_distinct(word_shingles(tokens(F.col("text")), 3))
            ).alias("s")
        )
        .select(token_hash32(F.col("s")).alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        doc_sh.join(F.broadcast(bench_sh), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("bench_overlap"),
        )
    )
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0))
    ov = F.coalesce(F.col("bench_overlap"), F.lit(0))
    frac = F.round(ov * 1.0 / F.greatest(n_sh, F.lit(1)), 6)
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        n_sh.cast("bigint").alias("n_shingles"),
        ov.cast("bigint").alias("bench_overlap"),
        frac.alias("overlap_frac"),
        (frac >= _CONTAM_FRAC).alias("contaminated"),
    )


# -- embedding norm QA -------------------------------------------------------


@register(
    "embedding_norm_outliers",
    """
    WITH n AS (
        SELECT vec_id,
               sqrt(list_sum([x * x FOR x IN CAST(embedding AS DOUBLE[])]))
                   AS nrm
        FROM embeddings
    ),
    m AS (SELECT round(median(nrm), 6) AS med FROM n)
    SELECT vec_id,
           round(nrm, 6) AS l2_norm,
           round(nrm / med, 6) AS ratio_to_median,
           nrm < 0.5 * med AS is_low,
           nrm > 1.5 * med AS is_high
    FROM n CROSS JOIN m
    """,
    doc="embedding-column QA: per-vector L2 norm versus the corpus "
        "median norm, flagging degenerate (near-zero) and blown-up "
        "vectors before they poison cosine math downstream. One narrow "
        "fold per row + a 1-row median cross join (broadcast); the "
        "median is rounded to 6 decimals in both engines so "
        "interpolation ulp noise cannot flip a flag",
)
def embedding_norm_outliers(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", norm(F.col("embedding")).alias("nrm"))
    med = norms.agg(F.round(F.median("nrm"), 6).alias("med"))
    return norms.crossJoin(F.broadcast(med)).select(
        "vec_id",
        F.round(F.col("nrm"), 6).alias("l2_norm"),
        F.round(F.col("nrm") / F.col("med"), 6).alias("ratio_to_median"),
        (F.col("nrm") < 0.5 * F.col("med")).alias("is_low"),
        (F.col("nrm") > 1.5 * F.col("med")).alias("is_high"),
    )


# -- robust anomaly detection (median / MAD) ---------------------------------

_MAD_K = 1.4826  # consistency constant for normal data
_MAD_SIGMAS = 3.0


@register(
    "events_anomaly_mad",
    f"""
    WITH med AS (
        SELECT event_type, round(median(value), 6) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, round(median(dev), 6) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n,
           min(d.med) AS med,
           min(m.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > {_MAD_SIGMAS} * {_MAD_K} * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           round(sum(CASE WHEN d.dev > {_MAD_SIGMAS} * {_MAD_K} * m.mad
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS anomaly_rate
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    doc="robust per-group anomaly detection: |value − median| > "
        "3·1.4826·MAD — the outlier rule that survives heavy tails where "
        "mean/stddev z-scores break. Two exact-median aggregations "
        "(grouping on low-cardinality event_type is fine for AGGREGATION "
        "— partial aggregates shrink each task to |groups| rows — unlike "
        "windowing) with the 5-row median tables broadcast back; medians "
        "rounded to 6dp in both engines before the flag compare",
)
def events_anomaly_mad(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.median("dev"), 6).alias("mad")
    )
    joined = dev.join(F.broadcast(mad), "event_type")
    is_anom = (
        F.col("dev") > F.lit(_MAD_SIGMAS) * F.lit(_MAD_K) * F.col("mad")
    ).cast("int")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.sum(is_anom).cast("bigint").alias("n_anomalies"),
        F.round(F.sum(is_anom) * 1.0 / F.count("*"), 6).alias("anomaly_rate"),
    )


# -- cohort retention --------------------------------------------------------


@register(
    "orders_retention_cohorts",
    """
    WITH f AS (
        SELECT o_custkey, min(o_orderdate) AS first_dt
        FROM orders GROUP BY o_custkey
    )
    SELECT strftime(f.first_dt, '%Y-%m') AS cohort_month,
           CAST((year(o.o_orderdate) - year(f.first_dt)) * 12
                + (month(o.o_orderdate) - month(f.first_dt)) AS BIGINT)
               AS month_offset,
           count(DISTINCT o.o_custkey) AS n_customers
    FROM orders o JOIN f USING (o_custkey)
    GROUP BY 1, 2
    """,
    doc="cohort retention matrix: customers grouped by first-order month, "
        "counted distinct at each month offset — the standard retention "
        "triangle. First-order dates via one aggregation on the "
        "high-cardinality customer key, joined back on that same key "
        "(co-partitioned — AQE reuses the exchange), then a distinct "
        "count per (cohort, offset); integer month arithmetic keeps the "
        "offset engine-portable",
)
def orders_retention_cohorts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    j = o.join(first, "o_custkey")
    offset = (
        (F.year("o_orderdate") - F.year("first_dt")) * 12
        + (F.month("o_orderdate") - F.month("first_dt"))
    ).cast("bigint")
    return (
        j.select(
            F.date_format("first_dt", "yyyy-MM").alias("cohort_month"),
            offset.alias("month_offset"),
            "o_custkey",
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


# -- grouping sets -----------------------------------------------------------

_DEC = "decimal(18,2)"


@register(
    "grouping_sets_revenue",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
               AS gid,
           CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS {_DEC})
                    * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE)
               AS sum_disc_price,
           count(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="GROUPING SETS aggregation (detail + per-flag subtotal + grand "
        "total in ONE pass) with grouping-id disambiguation — the "
        "multi-granularity report shape; Spark expands the sets into a "
        "single shuffle, decimal sums keep cross-engine exactness "
        "(completes the rollup_customer_counts / cube_order_counts "
        "grouping-family coverage)",
)
def grouping_sets_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem_gsq")
    return spark.sql(
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS {_DEC})
                        * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE)
                   AS sum_disc_price,
               count(*) AS n_items
        FROM lineitem_gsq
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


# -- exact heavy hitters -----------------------------------------------------

_HH_FACTOR = 1.2


@register(
    "events_heavy_hitters",
    f"""
    WITH c AS (
        SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ),
    t AS (SELECT sum(n_events) AS total, count(*) AS n_users FROM c)
    SELECT user_id,
           n_events,
           round(n_events * 1.0 / total, 6) AS share
    FROM c CROSS JOIN t
    WHERE n_events * 1.0 > {_HH_FACTOR} * total / n_users
    """,
    doc=f"exact heavy-hitter detection: users with more than "
        f"{_HH_FACTOR}× the mean event count, with their traffic share — "
        "the skew-probe run before choosing join/salting strategy. One "
        "aggregation on the high-cardinality user key (map-side "
        "combinable) + a 1-row total cross join; no second scan, no "
        "window, no sort",
)
def events_heavy_hitters(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("n_events"))
    t = c.agg(
        F.sum("n_events").alias("total"), F.count("*").alias("n_users")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .filter(
            F.col("n_events") * 1.0
            > F.lit(_HH_FACTOR) * F.col("total") / F.col("n_users")
        )
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events") * 1.0 / F.col("total"), 6).alias(
                "share"
            ),
        )
    )


@register(
    "dq_audit_lineitem",
    """
    SELECT (SELECT count(*) FROM lineitem) AS n_rows,
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
               AS neg_quantity,
           (SELECT count(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1) AS bad_discount,
           (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL)
               AS null_shipdate,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
               AS orphan_lineitems
    """,
    doc="declarative data-quality audit (the pre-publication gate a "
        "corpus pipeline runs before promoting a dataset): row-level "
        "constraint violations (non-positive quantity, discount out of "
        "[0,1], null ship date) counted in ONE conditional-aggregation "
        "pass over the fact table, plus referential integrity "
        "(lineitems without a parent order) as a LEFT ANTI equi-join "
        "count — never a per-constraint rescan. The 1-row violation "
        "summary broadcasts trivially into alerting joins",
)
def dq_audit_lineitem(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    scan_checks = l.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("neg_quantity"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("bad_discount"),
        F.count(F.when(F.col("l_shipdate").isNull(), 1)).alias(
            "null_shipdate"
        ),
    )
    orphans = (
        l.select("l_orderkey")
        .join(o, l.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    return scan_checks.crossJoin(F.broadcast(orphans))


@register(
    "text_bigram_logprob",
    f"""
    WITH toks AS (
        SELECT doc_id, {sql_tokens('text')} AS t FROM documents
    ),
    bgs AS (
        SELECT doc_id, unnest({sql_word_shingles('t', 2)}) AS bg
        FROM toks
    ),
    db AS (SELECT doc_id, bg, count(*) AS tf FROM bgs GROUP BY 1, 2),
    cb AS (SELECT bg, sum(tf) AS cbg FROM db GROUP BY 1),
    ctx AS (
        SELECT string_split(bg, ' ')[1] AS w, sum(cbg) AS cctx
        FROM cb GROUP BY 1
    ),
    voc AS (
        SELECT count(DISTINCT u) AS v
        FROM (SELECT unnest(t) AS u FROM toks)
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_bigrams,
           round(sum(tf * ln(CAST(cctx + v AS DOUBLE)
                             / CAST(cbg + 1 AS DOUBLE))) / sum(tf),
                 6) AS avg_neg_logp
    FROM db
    JOIN cb USING (bg)
    JOIN ctx ON string_split(bg, ' ')[1] = ctx.w
    CROSS JOIN voc
    GROUP BY doc_id
    """,
    doc="bigram-LM fluency score (the unigram proxy's next rung, the "
        "KenLM-filtering shape): per-doc mean -ln P(w_i | w_i-1) under "
        "add-1-smoothed corpus bigram counts, P = (C(bigram)+1) / "
        "(C(context)+V). Shape: doc x bigram counts cached once "
        "(feeds corpus counts AND scoring; no cross-branch reuse in "
        "Catalyst), context counts derived FROM the bigram table "
        "(vocab-sized, not corpus-sized), scoring join on the bigram "
        "key (AQE; vocab too big to assume broadcast at 100 TB), "
        "1-row V broadcast, one final doc agg. Docs with <2 tokens "
        "have no bigram rows and drop out in both engines",
)
def text_bigram_logprob(spark, sf_dir):
    from mongo2pq_spark.operators.cache import cache_stream

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    bgs = toks.select(
        "doc_id", F.explode(word_shingles(F.col("t"), 2)).alias("bg")
    )
    db = cache_stream(
        bgs.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    )
    cb = db.groupBy("bg").agg(F.sum("tf").alias("cbg"))
    ctx = (
        cb.groupBy(F.split(F.col("bg"), " ")[0].alias("w"))
        .agg(F.sum("cbg").alias("cctx"))
    )
    voc = toks.select(F.explode("t").alias("u")).agg(
        F.countDistinct("u").alias("v")
    )
    scored = (
        db.join(cb, "bg")
        .join(ctx, F.split(F.col("bg"), " ")[0] == F.col("w"))
        .crossJoin(F.broadcast(voc))
    )
    neg = F.col("tf") * F.log(
        (F.col("cctx") + F.col("v")).cast("double")
        / (F.col("cbg") + 1).cast("double")
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(neg) / F.sum("tf"), 6).alias("avg_neg_logp"),
    )


@register(
    "text_trigram_backoff",
    f"""
    WITH train AS (
        SELECT {sql_tokens('text')} AS t FROM documents
        WHERE doc_id % 5 <> 0
    ),
    score AS (
        SELECT doc_id, {sql_tokens('text')} AS t FROM documents
        WHERE doc_id % 5 = 0
    ),
    tri_c AS (
        SELECT tg, count(*) AS c3
        FROM (SELECT unnest({sql_word_shingles('t', 3)}) AS tg FROM train)
        GROUP BY 1
    ),
    bi_c AS (
        SELECT bg, count(*) AS c2
        FROM (SELECT unnest({sql_word_shingles('t', 2)}) AS bg FROM train)
        GROUP BY 1
    ),
    uni_c AS (
        SELECT w, count(*) AS c1
        FROM (SELECT unnest(t) AS w FROM train) q(w)
        GROUP BY 1
    ),
    stats AS (
        SELECT sum(c1) AS n, count(*) AS v FROM uni_c
    ),
    dt AS (
        SELECT doc_id, tg, count(*) AS tf,
               string_split(tg, ' ')[1] || ' ' || string_split(tg, ' ')[2]
                   AS ctx12,
               string_split(tg, ' ')[2] || ' ' || string_split(tg, ' ')[3]
                   AS b23,
               string_split(tg, ' ')[2] AS w2,
               string_split(tg, ' ')[3] AS w3
        FROM (SELECT doc_id, unnest({sql_word_shingles('t', 3)}) AS tg
              FROM score)
        GROUP BY 1, 2
    ),
    s AS (
        SELECT dt.doc_id, dt.tf,
               CASE
                   WHEN t3.c3 IS NOT NULL
                       THEN CAST(t3.c3 AS DOUBLE) / bctx.c2
                   WHEN b23c.c2 IS NOT NULL
                       THEN 0.4 * CAST(b23c.c2 AS DOUBLE) / u2.c1
                   ELSE 0.16 * (CAST(coalesce(u3.c1, 0) AS DOUBLE) + 1)
                        / (stats.n + stats.v)
               END AS sb,
               CASE WHEN t3.c3 IS NULL THEN dt.tf ELSE 0 END AS backed
        FROM dt
        LEFT JOIN tri_c t3 ON dt.tg = t3.tg
        LEFT JOIN bi_c bctx ON dt.ctx12 = bctx.bg
        LEFT JOIN bi_c b23c ON dt.b23 = b23c.bg
        LEFT JOIN uni_c u2 ON dt.w2 = u2.w
        LEFT JOIN uni_c u3 ON dt.w3 = u3.w
        CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_trigrams,
           round(sum(tf * -ln(sb)) / sum(tf), 6) AS avg_neg_logp,
           round(CAST(sum(backed) AS DOUBLE) / sum(tf), 6)
               AS backoff_frac
    FROM s GROUP BY doc_id
    """,
    doc="stupid-backoff trigram LM (Brants et al. 2007, the web-scale "
        "LM scoring that skips normalization): docs with doc_id%5==0 "
        "are scored against counts from the OTHER 80% — a held-out "
        "split, so backoff genuinely fires (self-scoring would make "
        "every trigram seen). S(w3|w1w2) = c3/c2(ctx) when the "
        "trigram is attested, else 0.4*c2(w2w3)/c1(w2), else "
        "0.4^2*(c1(w3)+1)/(N+V) (add-1 floor keeps OOV finite). "
        "Shape: count tables derive from one tokenize pass each, "
        "scoring joins are all equi-joins on n-gram keys (AQE "
        "decides broadcast; vocab too big to assume it at 100 TB), "
        "1-row N/V broadcast, one final doc agg. backoff_frac = "
        "fraction of trigram tokens that fell below the full "
        "trigram — the score's reliability diagnostic",
)
def text_trigram_backoff(spark, sf_dir):
    from mongo2pq_spark.operators.cache import cache_stream

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0).select(
        tokens(F.col("text")).alias("t")
    )
    score = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    tri_c = (
        train.select(F.explode(word_shingles(F.col("t"), 3)).alias("tg"))
        .groupBy("tg")
        .agg(F.count("*").alias("c3"))
    )
    bi_c = cache_stream(
        train.select(F.explode(word_shingles(F.col("t"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count("*").alias("c2"))
    )
    uni_c = cache_stream(
        train.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    stats = uni_c.agg(
        F.sum("c1").alias("n"), F.count("*").alias("v")
    )
    parts = F.split(F.col("tg"), " ")
    dt = (
        score.select(
            "doc_id", F.explode(word_shingles(F.col("t"), 3)).alias("tg")
        )
        .groupBy("doc_id", "tg")
        .agg(F.count("*").alias("tf"))
        .select(
            "doc_id",
            "tg",
            "tf",
            F.concat_ws(" ", parts[0], parts[1]).alias("ctx12"),
            F.concat_ws(" ", parts[1], parts[2]).alias("b23"),
            parts[1].alias("w2"),
            parts[2].alias("w3"),
        )
    )
    j = (
        dt.join(tri_c.withColumnRenamed("tg", "tg3"),
                F.col("tg") == F.col("tg3"), "left")
        .join(
            bi_c.select(
                F.col("bg").alias("ctx_bg"), F.col("c2").alias("cctx")
            ),
            F.col("ctx12") == F.col("ctx_bg"),
            "left",
        )
        .join(
            bi_c.select(
                F.col("bg").alias("b23_bg"), F.col("c2").alias("cb23")
            ),
            F.col("b23") == F.col("b23_bg"),
            "left",
        )
        .join(
            uni_c.select(F.col("w").alias("u2_w"), F.col("c1").alias("cw2")),
            F.col("w2") == F.col("u2_w"),
            "left",
        )
        .join(
            uni_c.select(F.col("w").alias("u3_w"), F.col("c1").alias("cw3")),
            F.col("w3") == F.col("u3_w"),
            "left",
        )
        .crossJoin(F.broadcast(stats))
    )
    sb = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("cctx"),
        )
        .when(
            F.col("cb23").isNotNull(),
            0.4 * F.col("cb23").cast("double") / F.col("cw2"),
        )
        .otherwise(
            0.16
            * (F.coalesce(F.col("cw3"), F.lit(0)).cast("double") + 1)
            / (F.col("n") + F.col("v"))
        )
    )
    backed = F.when(F.col("c3").isNull(), F.col("tf")).otherwise(F.lit(0))
    return (
        j.select("doc_id", "tf", sb.alias("sb"), backed.alias("backed"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_trigrams"),
            F.round(
                F.sum(F.col("tf") * -F.log("sb")) / F.sum("tf"), 6
            ).alias("avg_neg_logp"),
            F.round(
                F.sum("backed").cast("double") / F.sum("tf"), 6
            ).alias("backoff_frac"),
        )
    )


@register(
    "corpus_perplexity_buckets",
    f"""
    WITH toks AS (
        SELECT doc_id, {sql_tokens('text')} AS t FROM documents
    ),
    bgs AS (
        SELECT doc_id, unnest({sql_word_shingles('t', 2)}) AS bg
        FROM toks
    ),
    db AS (SELECT doc_id, bg, count(*) AS tf FROM bgs GROUP BY 1, 2),
    cb AS (SELECT bg, sum(tf) AS cbg FROM db GROUP BY 1),
    ctx AS (
        SELECT string_split(bg, ' ')[1] AS w, sum(cbg) AS cctx
        FROM cb GROUP BY 1
    ),
    voc AS (
        SELECT count(DISTINCT u) AS v
        FROM (SELECT unnest(t) AS u FROM toks)
    ),
    scores AS (
        SELECT doc_id,
               round(sum(tf * ln(CAST(cctx + v AS DOUBLE)
                                 / CAST(cbg + 1 AS DOUBLE))) / sum(tf),
                     6) AS nlp
        FROM db
        JOIN cb USING (bg)
        JOIN ctx ON string_split(bg, ' ')[1] = ctx.w
        CROSS JOIN voc
        GROUP BY doc_id
    ),
    binned AS (
        SELECT doc_id, CAST(floor(nlp * 100) AS BIGINT) AS ppl_bin
        FROM scores
    ),
    hist AS (
        SELECT ppl_bin, count(*) AS cnt FROM binned GROUP BY 1
    ),
    cdf AS (
        SELECT ppl_bin,
               sum(cnt) OVER (ORDER BY ppl_bin
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS below,
               sum(cnt) OVER () AS n_total
        FROM hist
    )
    SELECT b.doc_id, b.ppl_bin,
           CASE WHEN 3 * coalesce(cdf.below, 0) < cdf.n_total
                    THEN 'head'
                WHEN 3 * coalesce(cdf.below, 0) < 2 * cdf.n_total
                    THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM binned b JOIN cdf USING (ppl_bin)
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): every "
        "doc's bigram-LM score quantizes to a 0.01-wide bin, the "
        "BOUNDED bin histogram (score range x100 rows, one partial-agg "
        "shuffle) yields an exact cumulative distribution, and docs "
        "split into head/middle/tail terciles by INTEGER comparison "
        "(3*below < n) — no global sort, no per-group value collect, "
        "no float threshold: the 100 TB answer to 'bucket by "
        "percentile'. Bin-boundary docs share a bucket "
        "deterministically (binned CDF semantics). The tiny CDF "
        "broadcasts back onto the per-doc scores",
)
def corpus_perplexity_buckets(spark, sf_dir):
    from pyspark.sql import Window

    from mongo2pq_spark.operators.cache import cache_stream

    # the per-doc binned scores feed TWO consumers — the histogram
    # aggregate and the final bucket join; uncached, each re-ran the
    # whole bigram-LM scoring pipeline above the operator-level
    # (doc, bigram, tf) cache, INCLUDING the vocab aggregate's second
    # corpus tokenize (guide §1.2/§5; measured r19). The cached table
    # is (doc_id, ppl_bin) — one narrow row per doc.
    scores = cache_stream(
        text_bigram_logprob(spark, sf_dir).select(
            "doc_id",
            F.floor(F.col("avg_neg_logp") * 100).cast("bigint").alias(
                "ppl_bin"
            ),
        )
    )
    hist = scores.groupBy("ppl_bin").agg(F.count("*").alias("cnt"))
    # the histogram is bounded (score-range x 100 rows), so the
    # single-partition cumulative window is safe by construction —
    # the salting lesson applies to unbounded fan-in, not to a
    # pre-aggregated few-hundred-row table
    w = (
        Window.orderBy("ppl_bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cdf = hist.select(
        "ppl_bin",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    bucket = (
        F.when(3 * F.col("below") < F.col("n_total"), F.lit("head"))
        .when(3 * F.col("below") < 2 * F.col("n_total"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scores.join(F.broadcast(cdf), "ppl_bin").select(
        "doc_id", "ppl_bin", bucket.alias("bucket")
    )


_VG_POINTS = 10


def _vocab_growth_oracle() -> str:
    v_cols = ", ".join(
        f"CAST(sum(CASE WHEN first_seen < t.thresh[{i + 1}] THEN 1 "
        f"ELSE 0 END) AS BIGINT) AS v{i}"
        for i in range(_VG_POINTS)
    )
    n_cols = ", ".join(
        f"CAST(sum(CASE WHEN doc_id < t.thresh[{i + 1}] THEN n_toks "
        f"ELSE 0 END) AS BIGINT) AS n{i}"
        for i in range(_VG_POINTS)
    )
    point_rows = " UNION ALL ".join(
        f"SELECT {i} AS checkpoint, v{i} AS cum_distinct_terms, "
        f"n{i} AS cum_tokens FROM vv, nn"
        for i in range(_VG_POINTS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term
        FROM documents
    ),
    nt AS (
        SELECT doc_id, len({sql_tokens('text')}) AS n_toks
        FROM documents
    ),
    fs AS (SELECT term, min(doc_id) AS first_seen FROM toks GROUP BY 1),
    t AS (
        SELECT [CAST(floor((i + 1) * (max(doc_id) + 1) / {_VG_POINTS}.0)
                AS BIGINT)
                FOR i IN generate_series(0, {_VG_POINTS - 1})] AS thresh
        FROM documents
    ),
    vv AS (SELECT {v_cols} FROM fs, t),
    nn AS (SELECT {n_cols} FROM nt, t),
    pts AS ({point_rows}),
    fit AS (
        SELECT round(
            (count(*) * sum(ln(CAST(cum_tokens AS DOUBLE))
                            * ln(CAST(cum_distinct_terms AS DOUBLE)))
             - sum(ln(CAST(cum_tokens AS DOUBLE)))
               * sum(ln(CAST(cum_distinct_terms AS DOUBLE))))
            / (count(*) * sum(ln(CAST(cum_tokens AS DOUBLE))
                              * ln(CAST(cum_tokens AS DOUBLE)))
               - sum(ln(CAST(cum_tokens AS DOUBLE)))
                 * sum(ln(CAST(cum_tokens AS DOUBLE)))), 6
        ) AS heaps_exponent
        FROM pts WHERE cum_tokens > 0 AND cum_distinct_terms > 0
    )
    SELECT checkpoint, cum_tokens, cum_distinct_terms, heaps_exponent
    FROM pts CROSS JOIN fit
    """


@register(
    "corpus_vocab_growth",
    _vocab_growth_oracle(),
    doc="vocabulary growth curve + Heaps-law exponent (V ~ N^beta, "
        "Heaps 1978): cumulative distinct terms vs cumulative tokens "
        "at 10 doc-id checkpoints, with the log-log least-squares "
        "slope — the saturation diagnostic that tells a curation "
        "pipeline when more same-source data stops adding lexical "
        "diversity. RELATIONAL prefix trick: first_seen(term) = "
        "min(doc_id) makes each cumulative distinct count a "
        "conditional aggregate over a vocab-sized table — no "
        "sequential scan, no window, no global sort; thresholds "
        "derive from max(doc_id) on a 1-row broadcast",
)
def corpus_vocab_growth(spark, sf_dir):
    from mongo2pq_spark.functions.textfns import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    nt = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_toks")
    )
    fs = toks.groupBy("term").agg(F.min("doc_id").alias("first_seen"))
    mx = docs.agg(F.max("doc_id").alias("mx"))
    th = lambda i: F.floor(  # noqa: E731
        (i + 1) * (F.col("mx") + 1) / float(_VG_POINTS)
    )
    vv = fs.crossJoin(F.broadcast(mx)).agg(
        *[
            F.sum(F.when(F.col("first_seen") < th(i), 1).otherwise(0))
            .cast("bigint")
            .alias(f"v{i}")
            for i in range(_VG_POINTS)
        ]
    )
    nn = nt.crossJoin(F.broadcast(mx)).agg(
        *[
            F.sum(F.when(F.col("doc_id") < th(i), F.col("n_toks"))
                  .otherwise(0))
            .cast("bigint")
            .alias(f"n{i}")
            for i in range(_VG_POINTS)
        ]
    )
    stack_expr = ", ".join(
        f"{i}, v{i}, n{i}" for i in range(_VG_POINTS)
    )
    pts = (
        vv.crossJoin(F.broadcast(nn))
        .selectExpr(
            f"stack({_VG_POINTS}, {stack_expr}) AS "
            "(checkpoint, cum_distinct_terms, cum_tokens)"
        )
        .select(
            F.col("checkpoint").cast("int").alias("checkpoint"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
            F.col("cum_distinct_terms").cast("bigint").alias(
                "cum_distinct_terms"
            ),
        )
    )
    lx = F.log(F.col("cum_tokens").cast("double"))
    ly = F.log(F.col("cum_distinct_terms").cast("double"))
    fit = (
        pts.filter(
            (F.col("cum_tokens") > 0) & (F.col("cum_distinct_terms") > 0)
        )
        .agg(
            F.round(
                (
                    F.count("*") * F.sum(lx * ly)
                    - F.sum(lx) * F.sum(ly)
                )
                / (
                    F.count("*") * F.sum(lx * lx)
                    - F.sum(lx) * F.sum(lx)
                ),
                6,
            ).alias("heaps_exponent")
        )
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "checkpoint", "cum_tokens", "cum_distinct_terms",
        "heaps_exponent",
    )


# -- DSIR importance-resampling selection -------------------------------------

_DSIR_BUCKETS = 1024


@register(
    "corpus_dsir_select",
    f"""
    WITH toks AS (
        SELECT doc_id, lang = 'en' AS is_target,
               unnest({sql_tokens('text')}) AS tok
        FROM documents
    ),
    dtb AS (
        SELECT doc_id, is_target,
               {sql_token_hash32('tok')} % {_DSIR_BUCKETS} AS bucket,
               count(*) AS tf
        FROM toks GROUP BY doc_id, is_target, bucket
    ),
    raw AS (SELECT bucket, sum(tf) AS cr FROM dtb GROUP BY 1),
    tgt AS (
        SELECT bucket, sum(tf) AS ct FROM dtb WHERE is_target GROUP BY 1
    ),
    tot AS (
        SELECT sum(tf) AS tr,
               sum(CASE WHEN is_target THEN tf ELSE 0 END) AS tt
        FROM dtb
    ),
    lm AS (
        SELECT raw.bucket,
               ln(CAST(0.9 AS DOUBLE) * CAST(coalesce(ct, 0) AS DOUBLE)
                      / CAST(greatest(tt, 1) AS DOUBLE)
                  + CAST(9.765625e-05 AS DOUBLE))
             - ln(CAST(0.9 AS DOUBLE) * CAST(cr AS DOUBLE)
                      / CAST(greatest(tr, 1) AS DOUBLE)
                  + CAST(9.765625e-05 AS DOUBLE)) AS lw
        FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
    )
    SELECT doc_id,
           max(is_target) AS is_target,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(sum(tf * lw), 6) + 0.0 AS dsir_logw,
           (round(sum(tf * lw), 6) + 0.0) > 0 AS selected
    FROM dtb JOIN lm USING (bucket)
    GROUP BY doc_id
    """,
    doc="DSIR data selection (Xie et al. 2023): per-document "
        "importance log-weight ln(p_target/p_raw) under hashed-"
        "unigram bag-of-words LMs (1024 md5 buckets), target = the "
        "English subcorpus — the cheap distribution-matching "
        "pre-filter that selects raw-corpus docs resembling a curated "
        "domain before any expensive scoring. Smoothing is Jelinek-"
        "Mercer with a SHARED λ=0.1 (p = 0.9·c/T + λ/B): add-1 puts "
        "smoothing mass ∝ 1/T, which biases every weight negative "
        "when the target subcorpus is smaller than the raw corpus "
        "(measured: 0/500 selected), while JM makes identically-"
        "shaped distributions score exactly 0 — selected = logw > 0 "
        "then reads 'more target-like than raw'. Shape: one "
        "doc×bucket aggregate (cached — it feeds the raw LM, the "
        "target LM, and the scoring join; Catalyst has no cross-"
        "branch reuse), then BROADCAST joins only (both LM tables are "
        "≤1024 rows, the totals are 1-row) — the corpus is read once "
        "and nothing shuffles on a skewable key at any scale",
)
def corpus_dsir_select(spark, sf_dir):
    from mongo2pq_spark.operators.text import dsir_logweights

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_en", F.col("lang") == "en"
    )
    return dsir_logweights(
        docs, "is_en", n_buckets=_DSIR_BUCKETS
    )


@register(
    "corpus_source_kl",
    f"""
    WITH toks AS (
        SELECT source, unnest({sql_tokens('text')}) AS tok
        FROM documents
    ),
    sb AS (
        SELECT source,
               {sql_token_hash32('tok')} % {_DSIR_BUCKETS} AS bucket,
               count(*) AS c
        FROM toks GROUP BY source, bucket
    ),
    cb AS (SELECT bucket, sum(c) AS cc FROM sb GROUP BY 1),
    st AS (SELECT source, sum(c) AS ts FROM sb GROUP BY 1),
    ct AS (SELECT sum(cc) AS tc FROM cb),
    terms AS (
        SELECT sb.source,
               (CAST(0.9 AS DOUBLE) * CAST(sb.c AS DOUBLE)
                    / CAST(st.ts AS DOUBLE)
                + CAST(9.765625e-05 AS DOUBLE))
               * ln((CAST(0.9 AS DOUBLE) * CAST(sb.c AS DOUBLE)
                         / CAST(st.ts AS DOUBLE)
                     + CAST(9.765625e-05 AS DOUBLE))
                    / (CAST(0.9 AS DOUBLE) * CAST(cb.cc AS DOUBLE)
                           / CAST(ct.tc AS DOUBLE)
                       + CAST(9.765625e-05 AS DOUBLE))) AS term,
               st.ts
        FROM sb
        JOIN cb USING (bucket)
        JOIN st USING (source)
        CROSS JOIN ct
    )
    SELECT source,
           CAST(min(ts) AS BIGINT) AS n_tokens,
           round(sum(term), 6) + 0.0 AS kl_vs_corpus
    FROM terms GROUP BY source
    """,
    doc="per-source domain-skew diagnostic: KL(source ‖ corpus) over "
        "the 1024-bucket hashed-unigram distributions, with the SAME "
        "shared-λ Jelinek-Mercer smoothing DSIR uses (identical "
        "distributions score exactly 0; smoothing mass does not "
        "depend on subcorpus size, the add-1 trap measured there). "
        "Only the buckets a source actually OCCUPIES contribute — "
        "absent buckets have p_s = λ/B, a constant the ranking "
        "ignores — so the sum stays over the bounded source×bucket "
        "table. Shape: ONE source×bucket aggregate (bounded at "
        "|sources|×1024), corpus marginals derived from it, broadcast "
        "joins, bounded output; the corpus is read once. The mixing "
        "and selection stages (corpus_mix_temperature, "
        "corpus_dsir_select) consume exactly this signal",
)
def corpus_source_kl(spark, sf_dir):
    from mongo2pq_spark.operators.cache import cache_stream

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    sb = cache_stream(
        toks.select(
            "source",
            (token_hash32(F.col("tok")) % _DSIR_BUCKETS).alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.count("*").alias("c"))
    )
    cb = sb.groupBy("bucket").agg(F.sum("c").alias("cc"))
    st = sb.groupBy("source").agg(F.sum("c").alias("ts"))
    ct = cb.agg(F.sum("cc").alias("tc"))
    lam_b = F.lit(0.1 / _DSIR_BUCKETS)
    ps = (
        F.lit(0.9) * F.col("c").cast("double") / F.col("ts").cast("double")
        + lam_b
    )
    pc = (
        F.lit(0.9) * F.col("cc").cast("double")
        / F.col("tc").cast("double")
        + lam_b
    )
    terms = (
        sb.join(F.broadcast(cb), "bucket")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(ct))
        .select("source", "ts", (ps * F.log(ps / pc)).alias("term"))
    )
    return terms.groupBy("source").agg(
        F.min("ts").cast("bigint").alias("n_tokens"),
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("kl_vs_corpus"),
    )
