"""Extended join + aggregate queries: as-of join, salted skew join,
cube, exact/approx distinct, exact percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2pq_spark.operators.joins import asof_join, salted_join
from mongo2pq_spark.queries.registry import register

_DEC = "decimal(18,2)"


def _t(spark, sf_dir, name):
    from mongo2pq_spark.sources.registry import read_sf_table

    return read_sf_table(spark, sf_dir, name)


@register(
    "asof_purchase_last_click",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           c.event_id AS click_event_id,
           c.ts AS ts_right
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="as-of join: each purchase ⋈ most recent prior click per user "
        "(union + carry-forward window: one shuffle, no Python). Latent "
        "caveat: at EQUAL right timestamps Spark picks the max struct "
        "deterministically while DuckDB ASOF's tie choice is unspecified; "
        "fixture timestamps are unique at µs precision so ties cannot occur",
)
def asof_purchase_last_click(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id", right_payload=["event_id"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_right").alias("click_event_id"),
        "ts_right",
    )


@register(
    "cogroup_asof_enrich",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           c.event_id AS click_event_id,
           CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="cogrouped applyInPandas as-of join: purchases and clicks "
        "cogroup per user, pandas merge_asof aligns each purchase with "
        "the most recent prior click in one sorted pass per group — "
        "the canonical Spark pattern for as-of semantics the DataFrame "
        "API lacks natively, and the last pandas-API surface "
        "(cogroup) not yet demonstrated (scalar / grouped-agg / "
        "mapInPandas / mapInArrow / applyInPandasWithState / UDTF all "
        "are). Scale shape: ONE shuffle per side on user_id (a key "
        "whose cardinality grows with data), Arrow-batched groups, "
        "per-group memory bounded by a user's events. Same tie caveat "
        "as asof_purchase_last_click: fixture timestamps are unique at "
        "µs precision. Values must equal the JVM window-composition "
        "as-of (asof_purchase_last_click) and the DuckDB ASOF oracle",
)
def cogroup_asof_enrich(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"), "user_id", "ts"
    )

    def asof_merge(left, right):
        import pandas as pd

        left = left.sort_values("ts")
        right = right.sort_values("ts")
        right = right.assign(c_ts=right["ts"])[["ts", "c_ts", "click_event_id"]]
        out = pd.merge_asof(left, right, on="ts", direction="backward")
        td = out["ts"] - out["c_ts"]
        # exact µs delta: int64 via timedelta64[us]; NaT → <NA>
        us = td.values.astype("timedelta64[us]").astype("int64")
        gap_us = pd.Series(us).mask(td.isna().to_numpy()).astype("Int64")
        return pd.DataFrame(
            {
                "event_id": out["event_id"],
                "user_id": out["user_id"],
                "click_event_id": out["click_event_id"].astype("Int64"),
                "gap_us": gap_us,
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof_merge,
            schema="event_id bigint, user_id bigint, "
            "click_event_id bigint, gap_us bigint",
        )
    )


@register(
    "salted_join_revenue",
    f"""
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="salted equi-join (explicit skew mitigation): lineitem ⋈ orders with "
        "8-way salt, result identical to the plain join",
)
def salted_join_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    joined = salted_join(l, o, key="l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("total_price"),
    )


@register(
    "q6_forecast_revenue",
    f"""
    SELECT CAST(sum(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_DEC})) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style: pure scan + predicate + single agg (pushdown check)",
)
def q6_forecast_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "cube_order_counts",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions (all grouping-set combinations)",
)
def cube_order_counts(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "distinct_users_exact",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="exact distinct aggregation (two-phase partial/final)",
)
def distinct_users_exact(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "distinct_users_approx",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
               <= ceil(count(DISTINCT user_id) * 0.05) AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for distinct "
        "counts. Raw sketch values are engine-specific, so the oracle is a "
        "TOLERANCE check both engines agree on: each engine asserts its own "
        "sketch is within 5% of its own exact count (a deterministic boolean "
        "column), alongside the engine-exact distinct count",
)
def distinct_users_approx(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id").alias("__approx"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("__approx") - F.col("n_users_exact"))
                <= F.ceil(F.col("n_users_exact") * 0.05)
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "sketch_rollup_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
               <= ceil(count(DISTINCT user_id) * 0.05) AS merged_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="mergeable-sketch rollup — the pattern that makes distinct "
        "counts incremental at 100 TB: per-shard HLL sketches "
        "(hll_sketch_agg, the stand-in for per-day/per-partition "
        "partial sketches stored alongside the data) union via "
        "hll_union_agg into the corpus-wide estimate WITHOUT touching "
        "raw rows again. Sketch bytes are engine-specific, so the "
        "oracle is the established tolerance-boolean: each engine "
        "asserts its own two-level pipeline lands within 5% of its own "
        "exact count, alongside the engine-exact distinct count",
)
def sketch_rollup_distinct_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    # shard = stand-in for a storage partition (e.g. ingest day): the
    # sketch is built per shard, persisted in the real pipeline, then
    # merged — never re-scanning history
    partials = (
        e.withColumn("shard", F.pmod(F.col("user_id"), F.lit(8)))
        .groupBy("event_type", "shard")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__merged_est")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("__merged_est") - F.col("n_users_exact"))
            <= F.ceil(F.col("n_users_exact") * 0.05)
        ).alias("merged_within_5pct"),
    )


@register(
    "percentile_approx_values",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS median_exact,
           round(quantile_cont(value, 0.95), 6) AS p95_exact,
           abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
               <= greatest(0.05 * abs(quantile_cont(value, 0.5)), 0.000001)
               AS median_within_5pct,
           abs(approx_quantile(value, 0.95) - quantile_cont(value, 0.95))
               <= greatest(0.05 * abs(quantile_cont(value, 0.95)), 0.000001)
               AS p95_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="approx_percentile sketch (the 100 TB percentile path — exact "
        "percentiles need a full sort per group, the sketch is one pass). "
        "Sketch values are engine-specific, so the oracle is a TOLERANCE "
        "check: each engine asserts its own sketch is within 5% of its own "
        "exact percentile, alongside the engine-exact percentiles",
)
def percentile_approx_values(spark, sf_dir):
    e = _t(spark, sf_dir, "events")

    def _ok(approx, exact):
        return F.abs(approx - exact) <= F.greatest(
            0.05 * F.abs(exact), F.lit(0.000001)
        )

    return (
        e.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("__m_exact"),
            F.percentile("value", 0.95).alias("__p95_exact"),
            F.percentile_approx("value", 0.5).alias("__m_approx"),
            F.percentile_approx("value", 0.95).alias("__p95_approx"),
        )
        .select(
            "event_type",
            F.round("__m_exact", 6).alias("median_exact"),
            F.round("__p95_exact", 6).alias("p95_exact"),
            _ok(F.col("__m_approx"), F.col("__m_exact")).alias("median_within_5pct"),
            _ok(F.col("__p95_approx"), F.col("__p95_exact")).alias("p95_within_5pct"),
        )
    )


@register(
    "median_value_by_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           round(quantile_cont(value, 0.95), 6) AS p95_value
    FROM events GROUP BY event_type
    """,
    doc="exact interpolated percentiles (Spark percentile ≡ DuckDB "
        "quantile_cont); percentile_approx is the sketch path at scale",
)
def median_value_by_type(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 6).alias("median_value"),
        F.round(F.percentile("value", 0.95), 6).alias("p95_value"),
    )


@register(
    "approx_topk_event_types",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
    doc="approx_top_k frequency sketch (Spark-4): one-pass mergeable "
        "top-k item counting — at 100 TB this bounds memory at "
        "maxItemsTracked entries per partial where an exact per-key "
        "count would not. With maxItemsTracked ≥ the distinct "
        "cardinality the sketch degenerates to EXACT counts, so the "
        "oracle here is the exact GROUP BY — a full value oracle for "
        "the sketch code path (the heavy-hitters exact query covers "
        "the skew-probe use; this covers the sketch API)",
)
def approx_topk_event_types(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    sketch = e.agg(F.expr("approx_top_k(event_type, 10)").alias("tk"))
    return sketch.select(F.explode("tk").alias("x")).select(
        F.col("x.item").alias("event_type"),
        F.col("x.count").cast("bigint").alias("n"),
    )


@register(
    "histogram_quantile_rollup",
    """
    WITH hist AS (
        SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, bin
    ), c AS (
        SELECT event_type, bin, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS tot
        FROM hist
    )
    SELECT event_type,
           min(CASE WHEN cum * 100 >= 50 * tot THEN bin END) / 10.0
               AS p50_bin,
           min(CASE WHEN cum * 100 >= 90 * tot THEN bin END) / 10.0
               AS p90_bin,
           min(CASE WHEN cum * 100 >= 99 * tot THEN bin END) / 10.0
               AS p99_bin,
           CAST(max(tot) AS BIGINT) AS n_values
    FROM c GROUP BY event_type
    """,
    doc="mergeable HISTOGRAM sketch rollup — the deterministic sibling "
        "of the HLL rollup (sketch_rollup_distinct_users) for "
        "quantiles: per-shard fixed-width bin counts (map-side "
        "combinable; persisted per storage partition in a real "
        "pipeline) SUM into the corpus histogram without rescanning "
        "raw rows, and the p50/p90/p99 extraction then runs over the "
        "bounded merged histogram (n_types × n_bins rows), never the "
        "event stream — at 100 TB the only full-data pass is the "
        "first map-side count. Unlike percentile_approx's opaque "
        "engine sketch, binned counts are engine-independent, so the "
        "oracle is VALUE-EXACT (same bins, same cumulative-threshold "
        "arithmetic), with precision bounded by bin width",
)
def histogram_quantile_rollup(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # shard = stand-in for a storage partition; the double groupBy is
    # the partial→merge shape (partials persistable between the steps)
    hist = (
        e.withColumn("shard", F.pmod(F.col("user_id"), F.lit(8)))
        .groupBy(
            "event_type",
            "shard",
            F.floor(F.col("value") * 10).cast("bigint").alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy("event_type")
    c = hist.withColumn("cum", F.sum("cnt").over(cum_w)).withColumn(
        "tot", F.sum("cnt").over(tot_w)
    )

    def qb(pct: int):
        # INTEGER-space threshold (cum·100 ≥ pct·tot): `cum >= 0.9*tot`
        # would compare Spark's binary double against DuckDB's exact
        # DECIMAL and diverge when a cumulative count lands exactly on
        # the quantile boundary (0.9 has no finite binary expansion)
        return F.min(
            F.when(
                F.col("cum") * 100 >= F.lit(pct) * F.col("tot"),
                F.col("bin"),
            )
        ) / 10.0

    return c.groupBy("event_type").agg(
        qb(50).alias("p50_bin"),
        qb(90).alias("p90_bin"),
        qb(99).alias("p99_bin"),
        F.max("tot").cast("bigint").alias("n_values"),
    )


@register(
    "kll_quantile_rollup",
    """
    WITH vals AS (SELECT event_type, value FROM events
                  WHERE value IS NOT NULL),
    est AS (
        SELECT event_type,
               approx_quantile(value, 0.5) AS p50_est,
               approx_quantile(value, 0.95) AS p95_est
        FROM vals GROUP BY event_type
    )
    SELECT v.event_type,
           round(quantile_cont(v.value, 0.5), 6) AS p50_exact,
           abs(avg(CASE WHEN v.value <= est.p50_est THEN 1.0 ELSE 0.0 END)
               - 0.5) <= 0.05 AS p50_within_rank_5pct,
           abs(avg(CASE WHEN v.value <= est.p95_est THEN 1.0 ELSE 0.0 END)
               - 0.95) <= 0.05 AS p95_within_rank_5pct
    FROM vals v JOIN est USING (event_type)
    GROUP BY v.event_type
    """,
    doc="KLL mergeable QUANTILE-sketch rollup (Spark 4.1 DataSketches "
        "kll_sketch_agg_double / kll_sketch_merge_double) — completes "
        "the mergeable-sketch family: HLL for distincts "
        "(sketch_rollup_distinct_users), approx_top_k for heavy "
        "hitters, fixed-bin histograms for deterministic quantiles, "
        "KLL for quantiles with PROVEN rank-error bounds at ~1KB per "
        "sketch. Per-shard sketches (persisted per storage partition "
        "in a real pipeline) merge into the corpus sketch without "
        "rescanning history. Sketch bytes are engine-specific, so the "
        "oracle is the established tolerance-boolean — in RANK space, "
        "KLL's actual guarantee: each engine checks the empirical "
        "rank of its own estimate lands within ±5% of the target "
        "rank, alongside the engine-exact interpolated p50",
)
def kll_quantile_rollup(spark, sf_dir):
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "user_id", "value")
    )
    partials = (
        e.withColumn("shard", F.pmod(F.col("user_id"), F.lit(8)))
        .groupBy("event_type", "shard")
        .agg(F.kll_sketch_agg_double("value").alias("sk"))
    )
    # kll_merge_agg_double: the SQL-side merge AGGREGATE (the Python
    # API only exposes the scalar two-sketch merge in 4.1) — partial
    # sketches combine map-side like any other agg
    est = (
        partials.groupBy("event_type")
        .agg(F.expr("kll_merge_agg_double(sk)").alias("msk"))
        .select(
            "event_type",
            F.kll_sketch_get_quantile_double("msk", F.lit(0.5)).alias(
                "p50_est"
            ),
            F.kll_sketch_get_quantile_double("msk", F.lit(0.95)).alias(
                "p95_est"
            ),
        )
    )
    # rank check: one more bounded agg over the stream, estimate side
    # broadcast (n_event_types rows)
    return (
        e.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
            (
                F.abs(
                    F.avg((F.col("value") <= F.col("p50_est")).cast("double"))
                    - 0.5
                )
                <= 0.05
            ).alias("p50_within_rank_5pct"),
            (
                F.abs(
                    F.avg((F.col("value") <= F.col("p95_est")).cast("double"))
                    - 0.95
                )
                <= 0.05
            ).alias("p95_within_rank_5pct"),
        )
    )


@register(
    "theta_overlap_users",
    """
    WITH c AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase'),
         ex AS (
            SELECT (SELECT count(*) FROM c) AS n_click,
                   (SELECT count(*) FROM p) AS n_purchase,
                   (SELECT count(*) FROM c JOIN p USING (user_id))
                       AS n_both,
                   (SELECT count(*) FROM c LEFT JOIN p USING (user_id)
                    WHERE p.user_id IS NULL) AS n_click_only
         ),
         est AS (
            SELECT (SELECT approx_count_distinct(user_id) FROM
                        (SELECT user_id FROM c UNION ALL
                         SELECT user_id FROM p))
                   AS union_est,
                   (SELECT approx_count_distinct(user_id) FROM c)
                       AS c_est,
                   (SELECT approx_count_distinct(user_id) FROM p)
                       AS p_est
         )
    SELECT ex.n_click AS n_click_users,
           ex.n_purchase AS n_purchase_users,
           ex.n_both AS n_both_exact,
           ex.n_click_only AS n_click_only_exact,
           abs((est.c_est + est.p_est - est.union_est) - ex.n_both)
               <= greatest(0.05 * ex.n_both, 2.0) AS inter_within_5pct,
           abs((est.c_est - (est.c_est + est.p_est - est.union_est))
               - ex.n_click_only)
               <= greatest(0.05 * greatest(ex.n_click_only, 1), 2.0)
               AS diff_within_5pct
    FROM ex, est
    """,
    doc="theta-sketch SET-OPERATION rollup (Spark 4.1 DataSketches "
        "theta_sketch_agg / theta_intersection / theta_difference): "
        "estimate audience overlap |click ∩ purchase| and difference "
        "|click \\ purchase| directly from two per-segment sketches — "
        "NO join over raw ids. The decontamination/overlap primitive "
        "at 100 TB: per-corpus sketches are built once (map-side, "
        "~KBs), persisted, and any pairwise overlap is then a "
        "driver-cheap sketch operation, where HLL would need "
        "error-compounding inclusion-exclusion and exact needs a "
        "shuffle join. Sketch bytes are engine-specific, so the "
        "oracle mirrors the tolerance-boolean pattern with DuckDB's "
        "own sketch machinery (approx_count_distinct "
        "inclusion-exclusion) against ITS exact counts, alongside "
        "engine-exact counts",
)
def theta_overlap_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    sk = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.expr("theta_sketch_agg(user_id)").alias("sk"))
    )
    a = sk.filter(F.col("event_type") == "click").select(
        F.col("sk").alias("ska")
    )
    b = sk.filter(F.col("event_type") == "purchase").select(
        F.col("sk").alias("skb")
    )
    # 1×1 sketch rows — the cross join is two broadcast singletons
    est = (
        a.crossJoin(F.broadcast(b))
        .select(
            F.expr("theta_sketch_estimate(theta_intersection(ska, skb))")
            .alias("inter_est"),
            F.expr("theta_sketch_estimate(theta_difference(ska, skb))")
            .alias("diff_est"),
        )
    )
    exact = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "click").alias("c"),
            F.max(F.col("event_type") == "purchase").alias("p"),
        )
        .agg(
            F.count_if(F.col("c")).alias("n_click_users"),
            F.count_if(F.col("p")).alias("n_purchase_users"),
            F.count_if(F.col("c") & F.col("p")).alias("n_both_exact"),
            F.count_if(F.col("c") & ~F.col("p")).alias("n_click_only_exact"),
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_click_users",
        "n_purchase_users",
        "n_both_exact",
        "n_click_only_exact",
        (
            F.abs(F.col("inter_est") - F.col("n_both_exact"))
            <= F.greatest(0.05 * F.col("n_both_exact"), F.lit(2.0))
        ).alias("inter_within_5pct"),
        (
            F.abs(F.col("diff_est") - F.col("n_click_only_exact"))
            <= F.greatest(
                0.05 * F.greatest(F.col("n_click_only_exact"), F.lit(1)),
                F.lit(2.0),
            )
        ).alias("diff_within_5pct"),
    )


def _session_intervals_sql(etype: str) -> str:
    """Gaps-and-islands CLOSED session intervals [min ts, max ts] for
    one event_type, 24-HOUR inactivity gap — ACTIVITY EPISODES, coarser
    than user_session_stats' 30-minute sessions: at this corpus's event
    sparsity 30-minute click/purchase sessions never coincide, while
    day-grain episodes overlap routinely (the shape the overlap join
    exists for)."""
    return f"""
        SELECT user_id, min(ts) AS s, max(ts) AS e
        FROM (
            SELECT user_id, ts,
                   sum(CASE WHEN prev IS NULL
                             OR ts - prev > INTERVAL 24 HOUR
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS island
            FROM (
                SELECT user_id, ts, event_id,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
                FROM events WHERE event_type = '{etype}'
            )
        ) GROUP BY user_id, island
    """


@register(
    "sessions_overlap_join",
    f"""
    WITH cs AS ({_session_intervals_sql('click')}),
         ps AS ({_session_intervals_sql('purchase')})
    SELECT c.user_id,
           c.s AS l_start, c.e AS l_end,
           p.s AS r_start, p.e AS r_end,
           date_diff('microsecond',
                     greatest(c.s, p.s), least(c.e, p.e)) AS overlap_us
    FROM cs c JOIN ps p
      ON c.user_id = p.user_id AND c.s <= p.e AND p.s <= c.e
    """,
    doc="INTERVAL × INTERVAL overlap join (operators/timeseries.py::"
        "interval_overlap_join), completing the temporal-join matrix "
        "(as-of / point-in-window range / interval-overlap): per-user "
        "click activity episodes (24 h inactivity gap) overlap-joined "
        "with purchase episodes — which browsing episodes were the "
        "user's buying episodes. The "
        "oracle runs the naive theta join; the Spark plan decomposes "
        "each interval onto an hour grid and equi-joins (key, cell) — "
        "a BETWEEN theta join would plan BroadcastNestedLoopJoin, "
        "quadratic per key at 100 TB — then verifies the exact "
        "predicate on the deduplicated candidates (plan-asserted: no "
        "nested-loop, no cartesian)",
)
def sessions_overlap_join(spark, sf_dir):
    from pyspark.sql import Window

    from mongo2pq_spark.operators.timeseries import interval_overlap_join

    e = _t(spark, sf_dir, "events")

    def session_intervals(etype):
        f = e.filter(F.col("event_type") == etype)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_micros(F.col("ts")) - F.lag(
            F.unix_micros(F.col("ts"))
        ).over(w)
        new_s = F.when(
            gap.isNull() | (gap > 24 * 3600 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0))
        return (
            f.select("user_id", "ts", "event_id", new_s.alias("new_s"))
            .withColumn(
                "island",
                F.sum("new_s").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .groupBy("user_id", "island")
            .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
            .drop("island")
        )

    return interval_overlap_join(
        session_intervals("click"),
        session_intervals("purchase"),
        "user_id",
        cell_seconds=86400,
    )
