"""Schema model: an ordered (field → Arrow type) mapping with a name,
plus merge, config rewrite, and compilation into a single Catalyst
projection.

Behavioral parity notes (reference /root/reference/mongo2pq/schema.py):
- merge resolves per-field conflicts through the unify lattice
  (schema.py:34-53).
- ``use_config`` applies first-match-wins retype and rename rules per
  field; rename collisions are deduped with ``_1``, ``_2`` suffixes
  (schema.py:55-84).
- the export projection prunes schema-absent columns (schema.py:113-117)
  and suppresses "falsy" values; the reference's literal guard also
  nulls 0/0.0/False (schema.py:115 quirk) — we implement the documented
  intent (None/"" only) by default and the literal quirk behind
  ``strict_compat=True``. Same flag selects the reference's dead-branch
  ``cast_boolean`` (schema.py:126-135: every string → False) over the
  evident intent ('true'/'yes' → True).

Where the reference casts row-by-row in Python (schema.py:110-164), we
emit one ``df.select(...)`` of Catalyst cast expressions: vectorized,
whole-stage-codegen'd, and column-pruned at the parquet/Mongo scan.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import pyarrow as pa
import pyarrow.types as pat
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mongo2pq_spark.schema.types import arrow_to_spark
from mongo2pq_spark.schema.unify import unify_types


class Schema:
    """Named, ordered field→type mapping over Arrow types."""

    @classmethod
    def from_df(cls, name: str, df: DataFrame) -> "Schema":
        """Schema mirroring a DataFrame's existing types (no value-based
        inference/narrowing) — for already-typed sources like parquet
        where type preservation beats the reference's sampling rules."""
        from mongo2pq_spark.schema.types import spark_to_arrow

        return cls(
            name, {f.name: spark_to_arrow(f.dataType) for f in df.schema.fields}
        )

    def __init__(
        self,
        name: str,
        fields: Mapping[str, pa.DataType] | Iterable[tuple[str, pa.DataType]] | None = None,
    ):
        self._name = name
        self._fields: dict[str, pa.DataType] = dict(fields or {})
        self._rename_map: dict[str, str] = {}

    # -- accessors ---------------------------------------------------------

    @property
    def name(self) -> str:
        return self._name

    @property
    def fields(self) -> dict[str, pa.DataType]:
        return dict(self._fields)

    @property
    def rename_map(self) -> dict[str, str]:
        """original source column → final column name (config renames)."""
        return dict(self._rename_map)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(n, arrow_to_spark(t), True) for n, t in self._fields.items()]
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Schema)
            and self._name == other._name
            and list(self._fields) == list(other._fields)
            and all(self._fields[k].equals(other._fields[k]) for k in self._fields)
        )

    def __repr__(self) -> str:
        inner = ", ".join(f"{n}: {t}" for n, t in self._fields.items())
        return f"Schema({self._name!r}, {{{inner}}})"

    # -- algebra -----------------------------------------------------------

    def merge(self, other: "Schema") -> None:
        """Union fields; conflicting types resolve through the lattice."""
        if self._name != other._name:
            raise ValueError("cannot merge schemas with different names")
        for field_name, other_type in other._fields.items():
            known = self._fields.get(field_name)
            if known is None:
                self._fields[field_name] = other_type
            elif not known.equals(other_type):
                self._fields[field_name] = unify_types(known, other_type)
        self._rename_map.update(other._rename_map)

    def use_config(self, schema_config: Mapping[str, list]) -> None:
        """Apply parsed retype/rename rules (see config.parse_config).

        Per field, the first matching retype rule and the first
        effective rename rule win; a rename that collides with an
        existing field name gets ``_N`` appended (N = first free).
        """
        self._rename_map = {}
        rules = schema_config.get(self._name, [])

        new_fields: dict[str, pa.DataType] = {}
        for field_name, field_type in self._fields.items():
            final_type = field_type
            final_name = field_name
            retyped = renamed = False
            for rule in rules:
                if not retyped and rule["type"] == "retype":
                    if rule["field_test"](field_name) and not field_type.equals(
                        rule["field_type"]
                    ):
                        final_type = rule["field_type"]
                        retyped = True
                elif not renamed and rule["type"] == "rename":
                    candidate = rule["rename_function"](field_name)
                    if candidate != field_name:
                        taken = set(self._fields) | set(new_fields)
                        taken.discard(field_name)
                        suffix = 0
                        final_name = candidate
                        while final_name in taken:
                            suffix += 1
                            final_name = f"{candidate}_{suffix}"
                        self._rename_map[field_name] = final_name
                        renamed = True
            new_fields[final_name] = final_type
        self._fields = new_fields

    # -- compilation to a Catalyst projection -------------------------------

    def apply(self, df: DataFrame, strict_compat: bool = False) -> DataFrame:
        """Compile prune + falsy-suppression + cast + rename into ONE
        ``select`` so Catalyst sees a single projection (column pruning
        reaches the scan; casts run in whole-stage codegen)."""
        inverse_rename = {v: k for k, v in self._rename_map.items()}
        source_cols = set(df.columns)
        exprs: list[Column] = []
        for final_name, dtype in self._fields.items():
            source = inverse_rename.get(final_name, final_name)
            if source not in source_cols:
                continue  # schema field absent from this source: skip
            # backtick-quote: a flattened dotted name (meta.kind) must
            # reference the literal column, not struct navigation
            col = F.col("`" + source.replace("`", "``") + "`")
            col = _suppress_falsy(col, df.schema[source].dataType, strict_compat)
            col = _cast_expr(col, df.schema[source].dataType, dtype, strict_compat)
            exprs.append(col.alias(final_name))
        return df.select(*exprs)


def _suppress_falsy(col: Column, src: T.DataType, strict_compat: bool) -> Column:
    """None/"" → null always; under strict_compat also 0/0.0/False → null
    (the reference's literal ``if field`` guard, schema.py:115)."""
    if isinstance(src, T.StringType):
        col = F.nullif(col, F.lit(""))
        return col
    if strict_compat:
        if isinstance(src, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                            T.FloatType, T.DoubleType)):
            return F.nullif(col, F.lit(0).cast(src))
        if isinstance(src, T.BooleanType):
            return F.nullif(col, F.lit(False))
        if isinstance(src, T.BinaryType):
            return F.when(F.octet_length(col) == 0, F.lit(None).cast(src)).otherwise(col)
    return col


def _cast_expr(
    col: Column, src: T.DataType, target: pa.DataType, strict_compat: bool
) -> Column:
    """Catalyst cast honoring the reference's special cases:

    - timestamp targets accept numeric epoch seconds
      (reference schema.py:142-150 keeps ints/floats and lets Arrow
      interpret them; we materialize real timestamps).
    - boolean targets from strings: intent parse ('true'/'yes') by
      default; under strict_compat, the reference's dead branch makes
      every string cast to False (schema.py:128-133).
    """
    spark_target = arrow_to_spark(target)

    if isinstance(spark_target, T.TimestampType) and pat.is_timestamp(target):
        if isinstance(src, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                            T.FloatType, T.DoubleType)):
            return F.timestamp_seconds(col)
        if isinstance(src, T.StringType):
            return F.coalesce(
                F.timestamp_seconds(col.try_cast(T.DoubleType())),
                col.try_cast(spark_target),
            )
        return col.cast(spark_target)

    if isinstance(spark_target, T.BooleanType) and isinstance(src, T.StringType):
        if strict_compat:
            return F.when(col.isNotNull(), F.lit(False))
        return F.lower(col).isin("true", "yes")

    if src == spark_target:
        return col
    return col.cast(spark_target)
