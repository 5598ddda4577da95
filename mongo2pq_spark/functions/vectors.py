"""Vector (embedding) column expressions.

Embeddings are ``array<float>`` columns. All math is built-in
higher-order functions (``zip_with`` / ``aggregate``) — JVM-side,
no Python UDF in the hot path. Elements are cast float→double before
accumulating so both engines fold identical IEEE doubles in identical
(left-to-right) order; results are rounded before any oracle compare.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
