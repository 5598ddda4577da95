"""Pandas-UDF surface: the sanctioned slow path (Arrow-batched,
vectorized) for logic built-ins can't express — oracle-checked here on
deliberately SQL-expressible logic so the UDF machinery itself is
verified value-for-value.

UDFs are defined inside the builder: ``@pandas_udf`` resolves its DDL
return type against the active session, so module import must stay
session-free.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import functions as F

from mongo2pq_spark.queries.registry import register


#: one explicit ASCII whitespace class everywhere: pandas .split()
#: also eats NBSP/Unicode spaces, SQL trim() only eats ' ', and Java
#: vs RE2 disagree on \x0B — an explicit class keeps all three engines
#: byte-identical on edge whitespace
_WS = "[ \\t\\n\\f\\r]"


@register(
    "udf_text_normalize",
    f"""
    SELECT doc_id,
           length(regexp_replace(
               lower(regexp_replace(text, '^{_WS}+|{_WS}+$', '', 'g')),
               '{_WS}+', ' ', 'g')) AS norm_len,
           length(regexp_replace(text, '[^aeiou]', '', 'g')) AS n_vowels
    FROM documents
    """,
    doc="Arrow-batched scalar Pandas UDFs (normalize + vowel count); "
        "values must equal the pure-SQL formulation",
)
def udf_text_normalize(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    from mongo2pq_spark.sources.registry import read_sf_table

    @pandas_udf("string")
    def normalize_text(texts: pd.Series) -> pd.Series:
        trimmed = texts.str.replace("^[ \t\n\f\r]+|[ \t\n\f\r]+$", "", regex=True)
        return trimmed.str.lower().str.replace("[ \t\n\f\r]+", " ", regex=True)

    @pandas_udf("bigint")
    def vowel_count(texts: pd.Series) -> pd.Series:
        return texts.str.count("[aeiou]").astype("int64")

    docs = read_sf_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(normalize_text(F.col("text"))).cast("bigint").alias("norm_len"),
        vowel_count(F.col("text")).alias("n_vowels"),
    )


@register(
    "udtf_token_runs",
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS token,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ),
    runs AS (
        SELECT doc_id, token, pos,
               pos - row_number() OVER (
                   PARTITION BY doc_id, token ORDER BY pos) AS grp
        FROM toks
    )
    SELECT doc_id, token,
           CAST(min(pos) AS INT) AS run_start,
           CAST(count(*) AS INT) AS run_len
    FROM runs
    GROUP BY doc_id, token, grp
    HAVING count(*) >= 2
    """,
    doc="Python UDTF surface (Spark-4 table function, Arrow-batched, "
        "LATERAL-joined): run-length encoding of consecutively repeated "
        "tokens per document — the repeated-span signal LLM quality "
        "filters act on. One linear pass per row inside the UDTF vs the "
        "pure-SQL islands decomposition (explode + window + regroup = "
        "two shuffles) the oracle uses; completes the UDF/UDAF/UDTF "
        "extension matrix (the reference exposes none, SURVEY §2.1). "
        "Scale shape: the lateral call is map-side (zero shuffles; "
        "per-row state only), so it pipelines with the scan",
)
def udtf_token_runs(spark, sf_dir):
    from pyspark.sql.functions import udtf

    from mongo2pq_spark.sources.registry import read_sf_table

    @udtf(returnType="token string, run_start int, run_len int", useArrow=True)
    class TokenRuns:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split(" ")
            start = 0
            for i in range(1, len(toks) + 1):
                if i == len(toks) or toks[i] != toks[start]:
                    if i - start >= 2:
                        yield toks[start], start + 1, i - start
                    start = i

    spark.udtf.register("token_runs", TokenRuns)
    read_sf_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_docs_src"
    )
    return spark.sql(
        """
        SELECT d.doc_id, tr.token, tr.run_start, tr.run_len
        FROM udtf_docs_src d, LATERAL token_runs(d.text) tr
        """
    )


@register(
    "udaf_user_value_gini",
    """
    WITH r AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value) AS i
        FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           round(2.0 * sum(i * value) / (count(*) * sum(value))
                 - (count(*) + 1.0) / count(*), 6) AS value_gini
    FROM r GROUP BY user_id
    """,
    doc="grouped-aggregate Pandas UDF (UDAF surface): per-user Gini "
        "concentration of event values — Arrow ships each group's "
        "column to pandas once, numpy sorts in-process, one scalar "
        "returns. Grouped on user_id, a key whose cardinality GROWS "
        "with the data (so per-group pandas memory stays bounded at "
        "100 TB — a ~5-value key here would funnel billions of rows "
        "into one Arrow batch). Values equal the pure-SQL sorted-rank "
        "formulation; ties contribute identically under either tie "
        "order, so the cross-engine hash is stable",
)
def udaf_user_value_gini(spark, sf_dir):
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from mongo2pq_spark.sources.registry import read_sf_table

    @pandas_udf("double")
    def value_gini(v: pd.Series) -> float:
        x = np.sort(v.to_numpy(dtype="float64"))
        n = x.size
        total = x.sum()
        if n == 0 or total == 0.0:
            return 0.0
        ranks = np.arange(1, n + 1, dtype="float64")
        return round(
            2.0 * float((ranks * x).sum()) / (n * float(total))
            - (n + 1.0) / n,
            6,
        )

    # Spark disallows mixing grouped-agg pandas UDFs with JVM
    # aggregates in one agg() — the count is a pandas UDAF too
    @pandas_udf("bigint")
    def n_vals(v: pd.Series) -> int:
        return int(v.size)

    ev = read_sf_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        n_vals(F.col("value")).alias("n_events"),
        value_gini(F.col("value")).alias("value_gini"),
    )
