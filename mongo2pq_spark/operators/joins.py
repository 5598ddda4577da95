"""Join operators Spark lacks natively: as-of join and salted
(skew-resistant) equi-join.

As-of join — two implementations with identical semantics:
- ``asof_join`` (default): union + carry-forward window. Pure JVM
  (whole-stage codegen), ONE shuffle on (by-keys); the right side's
  payload is carried forward with ``last(..., ignorenulls)`` over an
  ordered window. This is the 100 TB path: no per-group Python, no
  cartesian candidate blow-up, skew handled by AQE.
- ``asof_join_pandas``: cogrouped ``applyInPandas`` over
  ``pd.merge_asof`` per key group — the escape hatch pattern for
  semantics the window form can't express (tolerance windows,
  nearest-direction). Arrow-batched; still one shuffle.

Salted join — ``salted_join`` spreads a skewed build key over
``n_salts`` sub-keys: the probe side gets a deterministic salt from a
row hash, the build side is exploded n_salts×. Result is exactly the
plain equi-join (each probe row meets its build rows exactly once).
Use when one key dominates (AQE skew-join handles moderate skew;
salting is the explicit fix for pathological keys).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_payload: Sequence[str] = (),
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (backward
    as-of, exact matches allowed — pd.merge_asof / DuckDB ASOF JOIN
    defaults). Left rows with no prior right row keep nulls.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    payload = list(right_payload) or [
        c for c in right.columns if c not in by_cols and c != on
    ]
    right_fields = [on, *payload]

    # the whole right row rides as ONE struct: a right row with a null
    # payload column is a NON-null struct, so last(ignorenulls) cannot
    # blend columns from different right rows (pd.merge_asof parity)
    right_struct = F.struct(*[F.col(c).alias(c) for c in right_fields])
    struct_type = f"struct<{', '.join(f'{c}:{dict(right.dtypes)[c]}' for c in right_fields)}>"

    tagged_right = right.select(
        *by_cols,
        F.col(on).alias("__ord"),
        F.lit(0).alias("__pri"),  # right sorts first at equal ts → "<=" match
        right_struct.alias("__rrow"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}")
            for c in left.columns
        ],
    )
    tagged_left = left.select(
        *by_cols,
        F.col(on).alias("__ord"),
        F.lit(1).alias("__pri"),
        F.lit(None).cast(struct_type).alias("__rrow"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = tagged_right.unionByName(tagged_left)
    # __rrow in the ordering breaks ties among equal-timestamp right
    # rows deterministically (struct comparison); left rows order after
    # right rows at the same instant via __pri
    w = (
        Window.partitionBy(*by_cols)
        .orderBy("__ord", "__pri", "__rrow")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "__pri",
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.last("__rrow", ignorenulls=True).over(w).alias("__carried"),
    )
    return carried.filter(F.col("__pri") == 1).select(
        *left.columns,
        *[F.col(f"__carried.{c}").alias(f"{c}{suffix}") for c in right_fields],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_payload: Sequence[str] = (),
    suffix: str = "_right",
) -> DataFrame:
    """Same semantics via cogrouped applyInPandas + pd.merge_asof.

    Demonstrates the custom-stateful escape hatch; prefer ``asof_join``
    unless you need merge_asof-only options (tolerance/nearest).
    """
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(left.sparkSession)

    payload = list(right_payload) or [
        c for c in right.columns if c != by and c != on
    ]
    right_slim = right.select(by, on, *payload)
    out_fields = (
        [f"{name} {dtype}" for name, dtype in left.dtypes]
        + [f"{on}{suffix} {dict(right.dtypes)[on]}"]
        + [f"{c}{suffix} {dict(right.dtypes)[c]}" for c in payload]
    )
    out_schema = ", ".join(out_fields)

    out_columns = [name for name, _ in left.dtypes] + [
        f"{on}{suffix}",
        *[f"{c}{suffix}" for c in payload],
    ]

    def merge(lpdf, rpdf):
        import pandas as pd

        if lpdf.empty:
            # key exists only on the right side of the cogroup: emit an
            # empty frame with the FULL output schema (a bare left frame
            # would be missing the suffix columns)
            return pd.DataFrame(columns=out_columns)
        lpdf = lpdf.sort_values(on)
        rpdf = rpdf.sort_values(on).rename(
            columns={on: f"{on}{suffix}", **{c: f"{c}{suffix}" for c in payload}}
        )
        return pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[by]),
            left_on=on,
            right_on=f"{on}{suffix}",
            direction="backward",
            allow_exact_matches=True,
        )

    return (
        left.groupBy(by)
        .cogroup(right_slim.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: probe rows get a deterministic salt in
    [0, n_salts); the build side is exploded once per salt; the join
    runs on (key, salt). Output columns = probe ⋈ build minus the
    duplicate key (same as ``probe.join(build, key)``).

    Only probe-preserving join types are allowed: build-preserving ones
    (right/full) would emit each unmatched build row n_salts times.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r} "
            "(build-preserving joins would duplicate unmatched build rows)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    salted_probe = probe.withColumn("__salt", salt)
    salted_build = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return salted_probe.join(salted_build, [key, "__salt"], how).drop("__salt")


def salted_topk(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_src: Column,
    n_salts: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Skew-safe top-k per group: a single ``row_number`` window over a
    LOW-cardinality partition key serializes every group's full match
    set through one task — at 100 TB a per-query/per-domain top-k is
    exactly that shape. This runs TWO phases: a local window over
    (partition, ``salt_src % n_salts``) prunes each group to
    ``n_salts · k`` candidates, then the global per-group window ranks
    only those. Semantically identical to the single window for any
    deterministic total order (pass tie-breaking ``order_cols``).

    ``salt_src`` must be deterministic (an id column, not rand()) so
    re-runs rank identically. Spark's WindowGroupLimit already pushes
    partial limits ahead of both exchanges; the salt bounds the FINAL
    partition at n_salts·k rows regardless of group fan-in."""
    local = Window.partitionBy(
        *partition_cols, (salt_src % n_salts).alias("__salt")
    ).orderBy(*order_cols)
    pruned = (
        df.withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
    )
    final = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        pruned.withColumn(rank_col, F.row_number().over(final).cast("bigint"))
        .filter(F.col(rank_col) <= k)
    )
