"""Arrow-alias ↔ Spark type mapping.

The reference's schema files and config rules name types by pyarrow
alias strings (``int32``, ``timestamp[s]``, ...; see
/root/reference/mongo2pq/schema.py:87-108 and config.py:89-90). We keep
pyarrow ``DataType`` objects as the schema-algebra currency (pure
driver-side metadata, zero per-row cost) and translate to Spark types
only when building the Catalyst cast projection. Divergences from the
reference's Arrow-level storage are documented per-type below.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.types as pat
from pyspark.sql import types as T


def arrow_to_spark(dtype: pa.DataType) -> T.DataType:
    """Map an Arrow type to the Spark type used for execution.

    Documented divergences (Spark has no exact analog):
    - ``date64`` → ``TimestampType`` (reference stores millisecond
      datetimes under date64; Spark's DateType would truncate).
    - unsigned ints → next-wider signed type (``uint64`` → LongType,
      may overflow for values > 2^63; the reference's inference never
      produces unsigned types, they are config-reachable only).
    - ``float16`` → FloatType.
    """
    if pat.is_string(dtype) or pat.is_large_string(dtype):
        return T.StringType()
    if pat.is_boolean(dtype):
        return T.BooleanType()
    if pat.is_int8(dtype):
        return T.ByteType()
    if pat.is_int16(dtype) or pat.is_uint8(dtype):
        return T.ShortType()
    if pat.is_int32(dtype) or pat.is_uint16(dtype):
        return T.IntegerType()
    if pat.is_int64(dtype) or pat.is_uint32(dtype) or pat.is_uint64(dtype):
        return T.LongType()
    if pat.is_float16(dtype) or pat.is_float32(dtype):
        return T.FloatType()
    if pat.is_float64(dtype):
        return T.DoubleType()
    if pat.is_date32(dtype):
        return T.DateType()
    if pat.is_date64(dtype):
        return T.TimestampType()
    if pat.is_timestamp(dtype):
        return T.TimestampType()
    if pat.is_binary(dtype) or pat.is_large_binary(dtype):
        return T.BinaryType()
    if pat.is_decimal(dtype):
        return T.DecimalType(dtype.precision, dtype.scale)
    raise NotImplementedError(f"No Spark mapping for Arrow type {dtype}")


def spark_to_arrow(dtype: T.DataType) -> pa.DataType:
    """Inverse mapping for round-tripping schemas sampled from a
    DataFrame back into the Arrow-alias world of YAML files."""
    mapping: dict[type, pa.DataType] = {
        T.StringType: pa.string(),
        T.BooleanType: pa.bool_(),
        T.ByteType: pa.int8(),
        T.ShortType: pa.int16(),
        T.IntegerType: pa.int32(),
        T.LongType: pa.int64(),
        T.FloatType: pa.float32(),
        T.DoubleType: pa.float64(),
        T.DateType: pa.date32(),
        T.TimestampType: pa.timestamp("us"),
        # NTZ appears when parquet µs timestamps carry
        # isAdjustedToUTC=false (Spark 4 default inference); the naive
        # Arrow timestamp is the faithful round-trip.
        T.TimestampNTZType: pa.timestamp("us"),
        T.BinaryType: pa.binary(),
    }
    try:
        return mapping[type(dtype)]
    except KeyError:
        raise NotImplementedError(f"No Arrow mapping for Spark type {dtype}")


def type_for_alias(alias: str) -> pa.DataType:
    """Resolve a YAML type-alias string (raises ValueError on unknown,
    matching pa.type_for_alias used at reference config.py:90)."""
    return pa.type_for_alias(alias)


def alias_for_type(dtype: pa.DataType) -> str:
    """Stable string alias for YAML dumps (reference schema.py:94)."""
    return str(dtype)
