"""TPC-H completion: the 11 query shapes (Q2, Q9, Q11, Q12, Q15,
Q16, Q17, Q19, Q20, Q21, Q22) not yet covered by the analytics suite,
adapted to the synthetic star schema (no ``partsupp`` table and no
comment/phone/shipmode/commitdate columns — substitutions are noted
per query and always preserve the ORIGINAL query's operator shape:
correlated aggregates, scalar subqueries, EXISTS / NOT EXISTS chains,
NOT IN anti-joins, OR-of-ANDs scan predicates, HAVING against a
global aggregate).

Together with ``analytics.py`` (Q1, Q3, Q4, Q5, Q7, Q8, Q10, Q13,
Q14, Q18) and ``joins_ext.py`` (Q6) this completes all 22 TPC-H
query shapes.

Determinism policy (same as analytics.py): monetary aggregates sum as
DECIMAL (exact, order-independent) and cast to DOUBLE only at the
end; divisions run in DOUBLE in both engines and are rounded;
``l_quantity`` values are integral doubles, so their double sums and
averages are exact regardless of aggregation order — correlated
quantity thresholds (Q17, Q20) are therefore engine-stable.

Scale notes: only FIXED-SIZE sides carry an explicit broadcast hint —
nation/region (25/5 rows) and one-row scalar-subquery thresholds
(Q11/Q15/Q22 global aggregates). part/supplier/customer/orders-derived
sides GROW with scale factor, so they carry no hint: AQE broadcasts
them at runtime when their measured size permits and falls back to a
shuffle join when it doesn't (a forced hint would override that and
OOM executors at 100×; policed by
tests/test_plans.py::test_no_broadcast_hint_on_fact_scaling_tables).
Fact-fact joins (lineitem⋈orders, lineitem self-joins in Q21) shuffle
once on the join key and AQE handles skew; every correlated subquery
is decorrelated into a grouped aggregate joined back on the
correlation key — never a per-row re-scan.
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
    "q2_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               round(min(l_extendedprice / l_quantity), 6) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT ps.l_partkey, ps.l_suppkey, ps.unit_cost,
               s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON s_suppkey = ps.l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM eu
    JOIN part ON p_partkey = eu.l_partkey
    WHERE p_size <= 5 AND p_type = 'LARGE'
      AND unit_cost = (
          SELECT min(unit_cost) FROM eu e2 WHERE e2.l_partkey = eu.l_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2-style minimum-cost supplier. No partsupp table, so the "
        "part–supplier offer is DERIVED from lineitem (min observed unit "
        "price per (part, supplier)); the correlated min-cost subquery is "
        "decorrelated into a per-part window min. min() over identical "
        "double divisions is engine-exact",
)
def q2_min_cost_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "LARGE")
    )
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6
        ).alias("unit_cost")
    )
    eu = (
        ps.join(s, ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # correlated min decorrelated: per-part window min over the
    # region-filtered offers (grid-sized: one row per (part, supplier))
    w = Window.partitionBy("l_partkey")
    best = eu.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q9_product_profit",
    f"""
    SELECT n_name, o_year, CAST(sum(amount) AS DOUBLE) AS profit
    FROM (
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS {_DEC})
                   * (1 - CAST(l_discount AS {_DEC}))
                 - CAST(0.6 AS DECIMAL(3,1))
                   * CAST(p_retailprice AS {_DEC})
                   * CAST(l_quantity AS {_DEC}) AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    """,
    doc="TPC-H Q9-style product-type profit by supplier nation and year. "
        "No partsupp.ps_supplycost, so cost is proxied as 60% of "
        "p_retailprice per unit — the operator shape (LIKE-filtered part "
        "dim, 4-way join, two-level group) is unchanged. All arithmetic "
        "stays decimal until the final cast",
)
def q9_product_profit(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast(_DEC) * (
        1 - F.col("l_discount").cast(_DEC)
    ) - F.lit("0.6").cast("decimal(3,1)") * F.col("p_retailprice").cast(
        _DEC
    ) * F.col("l_quantity").cast(_DEC)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount").cast("double").alias("profit"))
    )


@register(
    "q11_important_parts",
    f"""
    WITH supplied AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS {_DEC})
                   * CAST(l_quantity AS {_DEC})) AS value_dec
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS value
    FROM supplied
    WHERE value_dec > (
        SELECT sum(value_dec) * CAST(0.001 AS DECIMAL(4,3)) FROM supplied
    )
    """,
    doc="TPC-H Q11-style important stock: per-part supplied value for one "
        "nation, HAVING against a scalar subquery over the WHOLE filtered "
        "set (the global-fraction shape). partsupp value is derived from "
        "lineitem (price × quantity). Threshold comparison runs entirely "
        "in decimal — exact in both engines",
)
def q11_important_parts(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supplied = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * F.col("l_quantity").cast(_DEC)
            ).alias("value_dec")
        )
    )
    total = supplied.agg(
        (F.sum("value_dec") * F.lit("0.001").cast("decimal(4,3)")).alias(
            "threshold"
        )
    )
    return (
        supplied.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
    )


@register(
    "q12_delay_priority",
    """
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                THEN 'SLOW' ELSE 'FAST' END AS delay_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    doc="TPC-H Q12-style shipping-priority split. No l_shipmode/commit "
        "dates, so lines bucket by shipping DELAY (ship − order > 60 days "
        "= SLOW); the priority CASE-sum shape is unchanged. Timestamps are "
        "midnight-aligned, so day arithmetic is exact in both engines. "
        "The sums are CAST AS BIGINT: DuckDB types an un-cast integer "
        "sum() HUGEINT, which the driver's pandas canonicalizer renders "
        "as float ('2936.0' vs Spark's '2936') — the sole red row in "
        "CORRECTNESS_r10",
)
def q12_delay_priority(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60,
                F.lit("SLOW"),
            )
            .otherwise(F.lit("FAST"))
            .alias("delay_class"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice AS {_DEC})
                   * (1 - CAST(l_discount AS {_DEC}))) AS total_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_dec = (SELECT max(total_dec) FROM revenue)
    """,
    doc="TPC-H Q15 top supplier: quarterly revenue view + scalar-subquery "
        "max (ties kept, exactly as the spec requires). The equality "
        "compares exact decimal sums, so cross-engine ties are identical",
)
def q15_top_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (1 - F.col("l_discount").cast(_DEC))
            ).alias("total_dec")
        )
    )
    best = revenue.agg(F.max("total_dec").alias("best_dec"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_dec") == F.col("best_dec"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49, 50)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16-style supplier counts per (brand, type, size). The "
        "part–supplier relation is derived from lineitem; the excluded-"
        "supplier NOT IN subquery keys on negative acctbal instead of the "
        "absent comment column. NOT IN over a non-null key set = anti-join "
        "(both part and the excluded-supplier set grow with SF, so neither "
        "is hint-broadcast — AQE decides at runtime); distinct-count "
        "shuffles once on the group key",
)
def q16_supplier_part_counts(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (
            F.col("p_size").isin(
                1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49, 50
            )
        )
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    f"""
    WITH part_avg AS (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H Q17 small-quantity revenue: the correlated per-part "
        "avg(l_quantity) subquery decorrelated into a grouped aggregate "
        "joined back on partkey. Quantities are integral doubles, so the "
        "average is exact and the 0.2× threshold is engine-stable",
)
def q17_small_quantity_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    part_avg = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == part_avg.pa_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(sum(CAST(l_extendedprice AS {_DEC})
                    * (1 - CAST(l_discount AS {_DEC}))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19-style disjunctive revenue: the OR-of-ANDs predicate "
        "(brand × size band × quantity band, container/shipmode terms "
        "dropped with the absent columns) evaluated across a single "
        "equi-join (part scales with SF, so AQE — not a hint — picks the "
        "join strategy) — Catalyst splits the common p_partkey conjunct "
        "and keeps the disjunction as one post-join filter",
)
def q19_disjunctive_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (1 - F.col("l_discount").cast(_DEC))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q20_dominant_suppliers",
    """
    WITH pq AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    mx AS (
        SELECT l_partkey, max(qty) AS max_qty FROM pq GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM pq
    JOIN mx       ON mx.l_partkey = pq.l_partkey
    JOIN supplier ON s_suppkey = pq.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE pq.qty > 0.5 * mx.max_qty
      AND n_name = 'NATION_2'
    """,
    doc="TPC-H Q20-style part promotion candidates: suppliers of red "
        "parts whose 1996 shipped quantity exceeds half the part's top "
        "supplier (the >0.5×correlated-sum shape, with lineitem standing "
        "in for partsupp availability), restricted to one nation. "
        "Quantity sums are exact (integral doubles); the semi-join chain "
        "is two grid-sized grouped aggregates joined on partkey",
)
def q20_dominant_suppliers(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    pq = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    mx = pq.groupBy(F.col("l_partkey").alias("mx_partkey")).agg(
        F.max("qty").alias("max_qty")
    )
    return (
        pq.join(mx, pq.l_partkey == mx.mx_partkey)
        .filter(F.col("qty") > 0.5 * F.col("max_qty"))
        .join(s, pq.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_1'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM late l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    doc="TPC-H Q21-style suppliers who kept orders waiting: 'late' = "
        "shipped >90 days after order date (no commit/receipt columns), "
        "finished orders only; EXISTS another supplier's line in the "
        "order, NOT EXISTS another supplier's LATE line — the sole-blame "
        "double-subquery shape, decorrelated into one semi- and one "
        "anti- self-join on l_orderkey (shuffle co-partitioned; no "
        "per-row re-scan). Midnight-aligned timestamps make the +90-day "
        "comparison exact",
)
def q21_waiting_suppliers(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = l.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@register(
    "q22_dormant_customers",
    f"""
    WITH pos AS (
        SELECT CAST(c_acctbal AS {_DEC}) AS bal FROM customer
        WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE CAST(c_acctbal AS {_DEC}) * (SELECT count(*) FROM pos)
            > (SELECT sum(bal) FROM pos)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
      )
    GROUP BY 1
    """,
    doc="TPC-H Q22-style dormant high-balance customers: above-average "
        "balance (the scalar-subquery average rewritten as exact decimal "
        "cross-multiplication — bal×n > Σbal — so no double division "
        "enters the comparison), NOT EXISTS recent orders (anti-join), "
        "grouped by a nation-derived country code (no phone column). "
        "'Recent' = orders after 2000-06-01; every customer has SOME "
        "order in this dataset, so the spec's no-orders-at-all predicate "
        "would be vacuous",
)
def q22_dormant_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("total_bal"),
        F.count("*").alias("n_pos"),
    )
    recent = (
        o.filter(
            F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(
            F.col("c_acctbal").cast(_DEC) * F.col("n_pos")
            > F.col("total_bal")
        )
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(
            (F.col("c_nationkey") % 5).cast("bigint").alias("cntrycode")
        )
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC))
            .cast("double")
            .alias("totacctbal"),
        )
    )
