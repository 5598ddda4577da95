"""Sampling and quantization queries: deterministic stratified
sampling, quantile bucketing, and int8 embedding quantization (the 4×
storage-reduction path for 100 TB embedding tables)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo2pq_spark.queries.registry import register


def _t(spark, sf_dir, name):
    from mongo2pq_spark.sources.registry import read_sf_table

    return read_sf_table(spark, sf_dir, name)


@register(
    "stratified_sample",
    """
    SELECT event_id, event_type FROM (
        SELECT event_id, event_type,
               row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ) WHERE rn <= ceil(n * 0.1)
    """,
    doc="deterministic 10% stratified sample per event_type (the random "
        "path is df.sampleBy(seed); this ordered variant is oracle-exact)",
)
def stratified_sample(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    wc = Window.partitionBy("event_type")
    return (
        e.select(
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("n"),
        )
        .filter(F.col("rn") <= F.ceil(F.col("n") * 0.1))
        .select("event_id", "event_type")
    )


@register(
    "ntile_value_quartiles",
    """
    SELECT event_type, quartile, count(*) AS n,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi
    FROM (
        SELECT event_type, value,
               ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
                   AS quartile
        FROM events
    )
    GROUP BY event_type, quartile
    """,
    doc="NTILE quantile bucketing per group (deterministic tiebreak on id)",
)
def ntile_value_quartiles(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        e.select("event_type", "value", F.ntile(4).over(w).alias("quartile"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .select(
            "event_type",
            F.col("quartile").cast("bigint").alias("quartile"),
            "n", "lo", "hi",
        )
    )


@register(
    "embedding_quantize_int8",
    """
    WITH scaled AS (
        SELECT vec_id,
               list_max([abs(x) FOR x IN CAST(embedding AS DOUBLE[])]) AS max_abs,
               CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    q AS (
        SELECT vec_id,
               round(max_abs, 6) AS scale,
               [CAST(round(x * 127.0 / max_abs, 0) AS BIGINT) FOR x IN emb] AS qv
        FROM scaled WHERE max_abs > 0
    )
    SELECT vec_id, scale,
           CAST(len(qv) AS BIGINT) AS n_dims,
           md5(array_to_string(qv, ',')) AS q_md5
    FROM q
    """,
    doc="int8 symmetric quantization of embeddings (per-vector max-abs "
        "scale): 4x storage cut for 100 TB vector tables; dequantize is "
        "q * scale / 127. Output is scalarized (n_dims + md5 digest of "
        "the int array) — registered queries never return top-level "
        "array/struct columns, so any downstream canonicalizer can "
        "sort/hash the result (see tests/test_config.py registry guard)",
)
def embedding_quantize_int8(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(as_double, lambda x: F.abs(x)))
    scaled = emb.select(
        "vec_id", as_double.alias("emb"), max_abs.alias("max_abs")
    ).filter(F.col("max_abs") > 0)
    q = F.transform(
        F.col("emb"),
        lambda x: F.round(x * 127.0 / F.col("max_abs"), 0).cast("bigint"),
    )
    return scaled.select(
        "vec_id",
        F.round(F.col("max_abs"), 6).alias("scale"),
        F.size(q).cast("bigint").alias("n_dims"),
        F.md5(F.concat_ws(",", q.cast("array<string>")).cast("binary")).alias(
            "q_md5"
        ),
    )
