"""Scalar function library queries — the general string / date / math
/ JSON / array surface the reference lacks entirely (SURVEY §2.1
"no general scalar functions"). Each query pins engine-portable
semantics (explicit day-of-week mapping, rounded doubles, decimal
sums) so values hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo2pq_spark.queries.registry import register


def _t(spark, sf_dir, name):
    from mongo2pq_spark.sources.registry import read_sf_table

    return read_sf_table(spark, sf_dir, name)


@register(
    "string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           length(c_name) AS name_len,
           levenshtein(c_mktsegment, 'BUILDING') AS seg_distance
    FROM customer
    """,
    doc="string function surface: upper/substr/replace/lpad/length/levenshtein",
)
def string_functions(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("bigint").alias("seg_distance"),
    )


@register(
    "date_functions",
    """
    SELECT o_orderkey,
           CAST(extract(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(extract(day FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
    FROM orders
    """,
    doc="date/time function surface: extract, trunc, last_day, interval "
        "arithmetic, day difference",
)
def date_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).cast("bigint").alias("order_year"),
        F.month(od).cast("bigint").alias("order_month"),
        F.dayofmonth(od).cast("bigint").alias("order_day"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.last_day(od.cast("date")).alias("month_end"),
        F.date_add(od.cast("date"), 30).cast("timestamp").alias("due_ts"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
    )


@register(
    "math_functions",
    """
    SELECT event_id,
           round(sqrt(abs(value)), 6) AS sqrt_val,
           round(ln(value + 1), 6) AS log_val,
           round(pow(value, 2), 6) AS squared,
           CAST(ceil(value) AS BIGINT) AS ceil_val,
           CAST(floor(value) AS BIGINT) AS floor_val,
           CAST(sign(value - 25) AS BIGINT) AS sign_centered
    FROM events
    """,
    doc="math function surface: sqrt/ln/pow/ceil/floor/sign (rounded doubles)",
)
def math_functions(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.sqrt(F.abs(v)), 6).alias("sqrt_val"),
        F.round(F.log(v + 1), 6).alias("log_val"),
        F.round(F.pow(v, 2), 6).alias("squared"),
        F.ceil(v).cast("bigint").alias("ceil_val"),
        F.floor(v).cast("bigint").alias("floor_val"),
        F.signum(v - 25).cast("bigint").alias("sign_centered"),
    )


@register(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_value
    FROM events
    """,
    doc="JSON path extraction from a string column (semi-structured props)",
)
def json_extract_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@register(
    "array_functions",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 6) AS head_sum,
           round(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_component,
           round(list_min(CAST(embedding AS DOUBLE[])), 6) AS min_component
    FROM embeddings
    """,
    doc="array/higher-order function surface over embedding columns "
        "(slice + fold, JVM-side)",
)
def array_functions(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    head = F.slice(vec, 1, 8)
    fold = F.aggregate(
        head, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size(vec).cast("bigint").alias("dim"),
        F.round(fold, 6).alias("head_sum"),
        F.round(F.array_max(vec).cast("double"), 6).alias("max_component"),
        F.round(F.array_min(vec).cast("double"), 6).alias("min_component"),
    )


@register(
    "json_schema_promotion",
    """
    SELECT event_type,
           count(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_parsed,
           CAST(sum(CAST(CAST(json_extract(props, '$.k') AS INTEGER)
                    AS DECIMAL(18,2))) AS DOUBLE) AS total_k
    FROM events GROUP BY event_type
    """,
    doc="semi-structured promotion: parse the JSON props column into typed "
        "fields (from_json → struct) and aggregate on them",
)
def json_schema_promotion(spark, sf_dir):
    from pyspark.sql import types as T

    e = _t(spark, sf_dir, "events")
    props_schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = e.withColumn("props_struct", F.from_json("props", props_schema))
    return parsed.groupBy("event_type").agg(
        F.count("props_struct.k").alias("n_parsed"),
        F.sum(F.col("props_struct.k").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_k"),
    )


@register(
    "case_when_bucketing",
    """
    SELECT CASE WHEN value < 10 THEN 'low'
                WHEN value < 30 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1
    """,
    doc="CASE WHEN bucketing + conditional aggregation",
)
def case_when_bucketing(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 30, "mid")
        .otherwise("high")
    )
    return (
        e.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@register(
    "variant_props_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT)
               AS max_k
    FROM events GROUP BY event_type
    """,
    doc="Spark-4 VARIANT surface for semi-structured data: parse_json "
        "into the binary variant encoding once, then typed variant_get "
        "path extraction — at scale this replaces repeated per-path "
        "string JSON parsing (each get_json_object call re-parses the "
        "string; variant parses once and navigates the binary form). "
        "The oracle mirrors with DuckDB json_extract",
)
def variant_props_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )
