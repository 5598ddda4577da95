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
