"""Analytics suite: joins, aggregations, windows, set ops over the
TPC-H-ish tables. These are the engine-capability queries (the
reference has none of these — SURVEY.md §2.1) and the bench headliners.

Determinism policy for oracle hashing: monetary aggregates are summed
as DECIMAL (exact, order-independent) and cast to DOUBLE only at the
end, so Spark and DuckDB produce bit-identical values regardless of
partial-aggregation order.

Scale notes: small dimensions (region/nation/customer/supplier) are
broadcast — no shuffle on the fact side; fact-fact joins
(orders⋈lineitem) shuffle on the join key once and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongo2pq_spark.queries.registry import register

_DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from mongo2pq_spark.sources.registry import read_sf_table

    return read_sf_table(spark, sf_dir, name)


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC})) * (1 + CAST(l_tax AS {_DEC}))) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: scan → partial agg (map-side combine) "
        "→ final agg; decimal sums for cross-engine exactness",
)
def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    tax = F.col("l_tax").cast(_DEC)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_unshipped",
    f"""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: shuffle join lineitem⋈orders on orderkey, top-k by "
        "aggregated revenue. customer carries NO broadcast hint — it grows "
        "with scale factor, so the join strategy is left to the planner "
        "(statistics pick broadcast while it fits; AQE re-plans at runtime "
        "when it doesn't, instead of a forced hint OOMing executors at 100×)",
)
def q3_top_unshipped(spark, sf_dir):
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style multi-join: single shuffle on orderkey for the "
        "fact-fact join. Only the FIXED-SIZE dims (nation 25 rows, region "
        "5 rows) carry broadcast hints; customer/supplier grow with scale "
        "factor, so their join strategy is left to statistics + AQE — a "
        "forced hint there overrides AQE and OOMs executors at 100×",
)
def q5_local_supplier_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "window_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    doc="window top-N per group: one shuffle on the partition key",
)
def window_top_orders_per_customer(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "rollup_customer_counts",
    """
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="hierarchical rollup (region → nation → grand total)",
)
def rollup_customer_counts(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "events_except",
    """
    SELECT event_id FROM events WHERE value > 10
    EXCEPT
    SELECT event_id FROM events WHERE value > 15
    """,
    doc="set difference (EXCEPT DISTINCT → Spark subtract)",
)
def events_except(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hi = e.filter(F.col("value") > 10).select("event_id")
    higher = e.filter(F.col("value") > 15).select("event_id")
    return hi.subtract(higher)


@register(
    "users_click_and_purchase",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="set intersection (INTERSECT)",
)
def users_click_and_purchase(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
    )
    """,
    doc="anti join (NOT EXISTS → broadcast anti); the date predicate keeps "
        "the result non-trivial on this data",
)
def customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-style: returned-item revenue per customer, top 20",
)
def q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT round(
             100.00
             * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS {_DEC}) * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE),
           6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14-style: promo revenue share. Sums stay decimal (exact); "
        "the DIVISION runs in double in BOTH engines — decimal division "
        "precision/rounding rules differ across engines and would break the "
        "value hash",
)
def q14_promo_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice").cast(_DEC) * (1 - F.col("l_discount").cast(_DEC))
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc_price
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.00)
                * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double"),
                6,
            ).alias("promo_share")
        )
    )


@register(
    "q18_large_orders",
    f"""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING sum(CAST(l_quantity AS {_DEC})) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 25
    """,
    doc="TPC-H Q18-style: large-volume orders (HAVING over grouped decimal "
        "sum). Plan: lineitem pre-aggregates by l_orderkey BEFORE any join "
        "(l_orderkey determines (c_custkey, o_orderdate), so the per-order "
        "sum is identical) — a ~7× map-side reduction, and the >150 filter "
        "then shrinks the agg side to a handful of orders, which AQE "
        "broadcasts instead of shuffling the whole orders table",
)
def q18_large_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("_qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "suppliers_with_shipments",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
    """,
    doc="semi join (EXISTS → broadcast semi)",
)
def suppliers_with_shipments(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "event_type_matrix",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup
    FROM events GROUP BY user_id
    """,
    doc="pivot via conditional aggregation (portable form of groupBy().pivot())",
)
def event_type_matrix(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ["click", "view", "purchase", "error", "signup"]
    ]
    return e.groupBy("user_id").agg(*aggs)


@register(
    "sql_api_revenue_by_day",
    """
    SELECT CAST(ts AS DATE) AS event_day,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY CAST(ts AS DATE)
    """,
    doc="spark.sql() API surface: the engine accepts raw SQL over registered "
        "views (identical text runs on both engines)",
)
def sql_api_revenue_by_day(spark, sf_dir):
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_view")
    return spark.sql(
        """
        SELECT CAST(ts AS DATE) AS event_day,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events_view
        WHERE event_type IN ('purchase', 'click')
        GROUP BY CAST(ts AS DATE)
        """
    )


@register(
    "lag_lead_values",
    """
    SELECT event_id, user_id,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    doc="lag/lead window navigation (deterministic ordering with id tiebreak)",
)
def lag_lead_values(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "unpivot_event_counts",
    """
    WITH wide AS (
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click') AS n_click,
               count(*) FILTER (WHERE event_type = 'view')  AS n_view
        FROM events GROUP BY user_id
    )
    SELECT user_id, 'n_click' AS metric, n_click AS n FROM wide
    UNION ALL
    SELECT user_id, 'n_view' AS metric, n_view AS n FROM wide
    """,
    doc="unpivot/melt: wide per-type counts back to long form",
)
def unpivot_event_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    wide = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
    )
    return wide.unpivot("user_id", ["n_click", "n_view"], "metric", "n")


@register(
    "session_window_native",
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
    doc="Spark's native session_window cross-validated against the classic "
        "gaps-and-islands SQL: per-session start + event count. Boundary "
        "semantics verified to AGREE: an event at exactly prev_ts + gap "
        "joins the session in both (probed with a synthetic 1800.000000s "
        "gap → one session on each side)",
)
def session_window_native(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "user_session_stats",
    """
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    doc="sessionization: lag + gap threshold + cumulative session ids "
        "(single shuffle on user_id)",
)
def user_session_stats(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events")
    # exact microsecond gap: cast('long') truncates to seconds, and a
    # true gap of 1800.3s would floor to exactly 1800 → "same session"
    # while the oracle's INTERVAL comparison says "new session"
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        e.select("user_id", "ts", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "events_funnel_conversion",
    """
    WITH s AS (
        SELECT user_id,
               min(ts) FILTER (event_type = 'view') AS first_view,
               min(ts) FILTER (event_type = 'click') AS first_click,
               min(ts) FILTER (event_type = 'purchase') AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN first_view IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
           CAST(sum(CASE WHEN first_view IS NOT NULL
                          AND first_click > first_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
           CAST(sum(CASE WHEN first_view IS NOT NULL
                          AND first_click > first_view
                          AND first_purchase > first_click
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS purchased_after_click,
           round(sum(CASE WHEN first_view IS NOT NULL
                           AND first_click > first_view
                           AND first_purchase > first_click
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(sum(CASE WHEN first_view IS NOT NULL
                                     THEN 1 ELSE 0 END), 1), 6)
               AS view_to_purchase_rate
    FROM s
    """,
    doc="ordered funnel conversion (view → click → purchase): per-user "
        "first-touch timestamps via ONE conditional-min aggregation on "
        "the high-cardinality user key (map-side combinable — no "
        "sessionization window, no self-join per stage, the usual "
        "funnel anti-pattern), then stage predicates enforce event "
        "ORDER, not mere presence; one global summary row",
)
def events_funnel_conversion(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    first = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    s = ev.groupBy("user_id").agg(
        first("view").alias("first_view"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    return s.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("int")).cast("bigint").alias("viewed"),
        F.sum(clicked.cast("int")).cast("bigint").alias("clicked_after_view"),
        F.sum(purchased.cast("int"))
        .cast("bigint")
        .alias("purchased_after_click"),
        F.round(
            F.sum(purchased.cast("int"))
            * 1.0
            / F.greatest(F.sum(viewed.cast("int")), F.lit(1)),
            6,
        ).alias("view_to_purchase_rate"),
    )


@register(
    "q4_late_shipment_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-shape: order-priority distribution of orders with at "
        "least one late-shipped line (EXISTS → LEFT SEMI join, so each "
        "order contributes once no matter how many lines qualify; the "
        "date filter prunes the orders side BEFORE the join). The "
        "fixture lacks commit/receipt dates, so 'late' is shipdate > "
        "orderdate + 30 days — same plan shape as the official query",
)
def q4_late_shipment_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    joined = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q13_customer_order_distribution",
    """
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13-shape: distribution of customers by order count — "
        "LEFT OUTER join so zero-order customers land in the c_count=0 "
        "bucket (count(o_orderkey) skips nulls), then a second "
        "aggregation over the tiny (c_count) domain; the first agg is "
        "keyed by the high-cardinality customer key, map-side "
        "combinable",
)
def q13_customer_order_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l_extendedprice AS {_DEC})
                    * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7-shape (volume shipping): revenue between a nation "
        "pair in both directions, per ship year. The two fact tables "
        "join on the order key (the only shuffle axis); the fixed-size "
        "nation dims are broadcast-hinted, customer/supplier (scale-"
        "growing) are left to statistics + AQE, and the nation-name "
        "filters prune through the dim joins BEFORE aggregation; "
        "decimal sums for cross-engine exactness",
)
def q7_nation_volume(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice").cast(_DEC) * (
        1 - F.col("l_discount").cast(_DEC)
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(F.sum(revenue).cast("double").alias("revenue"))


@register(
    "q8_market_share",
    f"""
    WITH all_nations AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS {_DEC})
                   * (1 - CAST(l_discount AS {_DEC})) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)
                      AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
    doc="TPC-H Q8-shape (national market share): NATION_3 suppliers' "
        "share of revenue sold into ASIA customers, per order year. "
        "Same single-shuffle fact join with broadcast dim chain "
        "(nation→region pruning the customer side); decimal sums, "
        "division in double in BOTH engines",
)
def q8_market_share(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_regionkey").alias("c_rk"),
    )
    volume = F.col("l_extendedprice").cast(_DEC) * (
        1 - F.col("l_discount").cast(_DEC)
    )
    base = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
    )
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_3", volume
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return base.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        F.round(
            F.sum(nation_vol).cast("double") / F.sum(volume).cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "scd2_user_state_history",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ), marked AS (
        SELECT user_id, ts, event_type,
               CASE WHEN prev_state IS NULL OR prev_state <> event_type
                    THEN 1 ELSE 0 END AS chg,
               event_id
        FROM ordered
    ), islands AS (
        SELECT user_id, ts, event_type,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    ), grouped AS (
        SELECT user_id, island, min(event_type) AS state,
               min(ts) AS valid_from, count(*) AS n_events
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, island) AS valid_to,
           n_events,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, island)
             IS NULL AS is_current
    FROM grouped
    """,
    doc="SCD2 (slowly-changing-dimension type 2) history build: each "
        "user's event_type stream collapses into [valid_from, "
        "valid_to) state intervals — consecutive identical states "
        "merge (gaps-and-islands), valid_to = next interval's start, "
        "open interval flagged is_current. The warehouse pattern for "
        "tracking attribute history without storing every version. "
        "Scale shape: ONE exchange on user_id serves the lag window, "
        "the cumulative island sum, the (user_id, island) aggregate "
        "AND the lead window (hash(user_id) satisfies every "
        "downstream clustered-distribution requirement) — "
        "plan-asserted single-shuffle in tests/test_plans.py",
)
def scd2_user_state_history(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marked = e.withColumn(
        "chg",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    )
    isl = marked.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    grouped = isl.groupBy("user_id", "island").agg(
        # all rows in an island share one state; min() = that state,
        # deterministically (first() is order-dependent)
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    # island is the deterministic tiebreak: two islands of one user CAN
    # share valid_from (identical ts, distinct event_id, alternating
    # event_type — the first window tie-breaks on event_id, so such
    # islands are legal); ordering by valid_from alone would make
    # valid_to/is_current nondeterministic across runs. island numbers
    # are strictly increasing per user in event order, so (valid_from,
    # island) is a total order — mirrored in the SQL oracle above.
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "island")
    nxt = F.lead("valid_from").over(w2)
    return grouped.select(
        "user_id",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


@register(
    "full_outer_daily_activity",
    """
    WITH c AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), p AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.day, p.day) AS day,
           coalesce(n_clicks, 0) AS n_clicks,
           coalesce(n_purchases, 0) AS n_purchases,
           CASE WHEN c.user_id IS NULL THEN 'purchase_only'
                WHEN p.user_id IS NULL THEN 'click_only'
                ELSE 'both' END AS activity
    FROM c FULL OUTER JOIN p
      ON c.user_id = p.user_id AND c.day = p.day
    """,
    doc="FULL OUTER equi-join — the reconciliation shape (rows alive "
        "on either side survive), completing the join-type matrix "
        "(inner/left/semi/anti/cross-broadcast/as-of/range/full): "
        "per-(user, day) click vs purchase counts with both-side "
        "null-coalescing and a presence class. Scale shape: both "
        "sides pre-aggregate map-side to (user, day) grain before "
        "the join, so the shuffle carries one row per active "
        "user-day, not per event",
)
def full_outer_daily_activity(spark, sf_dir):
    e = _t(spark, sf_dir, "events")

    def side(etype, alias):
        return (
            e.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.to_date("ts").alias("day"))
            .agg(F.count("*").alias(alias))
        )

    c = side("click", "n_clicks").alias("c")
    p = side("purchase", "n_purchases").alias("p")
    return (
        c.join(
            p,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.day") == F.col("p.day")),
            "full",
        )
        .select(
            F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
            F.coalesce(F.col("c.day"), F.col("p.day")).alias("day"),
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
            F.when(F.col("c.user_id").isNull(), "purchase_only")
            .when(F.col("p.user_id").isNull(), "click_only")
            .otherwise("both")
            .alias("activity"),
        )
    )


@register(
    "events_pivot_daily",
    """
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
               AS click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
               AS error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
               AS purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
               AS signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
               AS view,
           CAST(sum(value) FILTER (event_type = 'purchase')
                AS DOUBLE) AS purchase_value
    FROM events
    GROUP BY 1
    """,
    doc="PIVOT / wide-format daily rollup: one row per day, one count "
        "column per event type plus the purchase-value sum — the "
        "dashboard/report shape. Spark's relational pivot with an "
        "EXPLICIT value list (passing values= skips the extra "
        "distinct-scan job Spark otherwise runs to discover the "
        "column set, and makes the output schema deterministic for "
        "the oracle — at 100 TB the discovery scan is a full pass "
        "over the fact table, never worth it for a known domain); "
        "the oracle is the equivalent conditional-aggregate "
        "formulation. Counts of absent (day, type) combinations "
        "coalesce to 0 on both sides",
)
def events_pivot_daily(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    ev = read_sf_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", types)
        .agg(
            # count(*) is rejected inside a pivot aggregate
            # (INVALID_USAGE_OF_STAR_OR_REGEX); count(lit(1)) is the
            # same aggregate
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
        )
    )
    cols = [
        F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(t) for t in types
    ]
    return pivoted.select(
        "day",
        *cols,
        F.col("purchase_v").cast("double").alias("purchase_value"),
    )


_PR_D = 0.85
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    step = """
    r{k} AS (
        SELECT nodes.node,
               (1 - {d}) / n.n + {d} * coalesce(c.inflow, 0) AS rank
        FROM nodes CROSS JOIN n
        LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank / od.deg) AS inflow
            FROM e
            JOIN od ON e.src = od.src
            JOIN r{prev} r ON e.src = r.node
            GROUP BY e.dst
        ) c ON nodes.node = c.node
    )"""
    iters = ",".join(
        step.format(k=k, prev=k - 1, d=_PR_D)
        for k in range(1, _PR_ITERS + 1)
    )
    return f"""
    WITH pairs AS (
        SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                        't:' || event_type AS t
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    e AS (
        SELECT u AS src, t AS dst FROM pairs
        UNION ALL
        SELECT t AS src, u AS dst FROM pairs
    ),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM e UNION ALL SELECT dst FROM e
        )
    ),
    od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    n AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes CROSS JOIN n),
    {iters}
    SELECT node, round(rank, 4) AS rank FROM r{_PR_ITERS}
    """


@register(
    "graph_pagerank_interactions",
    _pagerank_oracle(),
    doc="damped PageRank (3 power steps, d=0.85) over the symmetrized "
        "user<->event-type interaction graph — the crawl-graph quality "
        "signal of web-corpus curation (link-structure importance "
        "weights which documents are worth keeping/upsampling), here "
        "exercised on the bipartite graph the testdata offers. Node "
        "set = nodes appearing in edges, so symmetrization leaves no "
        "dangling mass and total rank is conserved exactly. Each "
        "iteration is one shuffle (ranks join edges on src, "
        "contributions aggregate by dst); hub event-type nodes make "
        "both keys hot, which stays AQE-splittable because the plan "
        "is plain shuffle join + partial agg — no windows. Oracle: "
        "the same three steps UNROLLED as SQL CTEs",
)
def graph_pagerank_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo2pq_spark.operators.graph import pagerank
    from mongo2pq_spark.sources.registry import read_sf_table

    ev = read_sf_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    pairs = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = pairs.select(
        F.col("u").alias("src"), F.col("t").alias("dst")
    ).unionAll(
        pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )
    return pagerank(edges, iterations=_PR_ITERS, damping=_PR_D)


def _pagerank_weighted_oracle() -> str:
    step = """
    r{k} AS (
        SELECT nodes.node,
               (1 - {d}) / n.n + {d} * coalesce(c.inflow, 0) AS rank
        FROM nodes CROSS JOIN n
        LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank * e.w / od.wdeg) AS inflow
            FROM e
            JOIN od ON e.src = od.src
            JOIN r{prev} r ON e.src = r.node
            GROUP BY e.dst
        ) c ON nodes.node = c.node
    )"""
    iters = ",".join(
        step.format(k=k, prev=k - 1, d=_PR_D)
        for k in range(1, _PR_ITERS + 1)
    )
    return f"""
    WITH pairs AS (
        SELECT 'u:' || CAST(user_id AS VARCHAR) AS u,
               't:' || event_type AS t,
               CAST(count(*) AS DOUBLE) AS w
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    ),
    e AS (
        SELECT u AS src, t AS dst, w FROM pairs
        UNION ALL
        SELECT t AS src, u AS dst, w FROM pairs
    ),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM e UNION ALL SELECT dst FROM e
        )
    ),
    od AS (SELECT src, sum(w) AS wdeg FROM e GROUP BY src),
    n AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes CROSS JOIN n),
    {iters}
    SELECT node, round(rank, 4) AS rank FROM r{_PR_ITERS}
    """


@register(
    "graph_pagerank_weighted",
    _pagerank_weighted_oracle(),
    doc="WEIGHTED damped PageRank (3 power steps, d=0.85): parallel "
        "interactions count — edges are pre-aggregated to (user, "
        "event_type, n_events) and contributions become "
        "r(u)·w(u,v)/Σw(u,·), so a user's rank flows toward the event "
        "types they actually do most (the multigraph semantics the "
        "simple-graph variant documents away). Same one-shuffle-per-"
        "iteration shape; oracle = the weighted steps unrolled as "
        "CTEs",
)
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mongo2pq_spark.operators.graph import pagerank
    from mongo2pq_spark.sources.registry import read_sf_table

    ev = read_sf_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    pairs = ev.groupBy(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).agg(F.count("*").cast("double").alias("w"))
    edges = pairs.select(
        F.col("u").alias("src"), F.col("t").alias("dst"), "w"
    ).unionAll(
        pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"), "w")
    )
    return pagerank(edges, iterations=_PR_ITERS, damping=_PR_D,
                    weight_col="w")


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, event_type, count(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (SELECT prev_type, sum(n) AS n_prev FROM pairs GROUP BY 1)
    SELECT prev_type, event_type,
           CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE) / n_prev, 6) + 0.0 AS p
    FROM pairs JOIN tot USING (prev_type)
    """,
    doc="first-order Markov transition matrix over per-user event "
        "sequences: P(next event type | current), the behavioral-"
        "sequence profile that feeds curriculum ordering, anomalous-"
        "session detection, and synthetic-trace generation. Shape: "
        "ONE shuffle — the lag window partitions by user_id (the "
        "natural well-distributed key; never a global sort) with a "
        "(ts, event_id) total order inside each user; the pair "
        "counts and row totals are bounded at |types|² / |types| "
        "rows, so the conditional-probability join broadcasts",
)
def events_markov_transitions(spark, sf_dir):
    from pyspark.sql import Window

    from mongo2pq_spark.sources.registry import read_sf_table

    e = read_sf_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "event_type").agg(
        F.count("*").alias("n")
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("n_prev"))
    return pairs.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (
            F.round(F.col("n").cast("double") / F.col("n_prev"), 6)
            + F.lit(0.0)
        ).alias("p"),
    )
