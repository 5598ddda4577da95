"""Inference ruleset tests — every branch of the reference's
infer_type/cast_from_string/is_timestamp (schema.py:306-389), with the
epoch anchor pinned for determinism."""

from datetime import datetime

import pyarrow as pa
import pytest

from mongo2pq_spark.schema.inference import (
    cast_from_string,
    infer_fields_from_rows,
    infer_type,
    is_epoch_timestamp,
)

NOW = datetime(2026, 1, 1, 12, 0, 0)


# -- cast_from_string -------------------------------------------------------

@pytest.mark.parametrize(
    "raw, expected",
    [
        ("true", True), ("YES", True), ("False", False), ("no", False),
        ("42", 42), ("-7", -7),
        ("3.5", 3.5), ("1e3", 1000.0),
        ("2020-05-01", datetime(2020, 5, 1)),
        ("2020-05-01T10:30:00", datetime(2020, 5, 1, 10, 30)),
        ("42abc", "42abc"), ("", ""),
    ],
)
def test_cast_from_string(raw, expected):
    assert cast_from_string(raw) == expected


# -- epoch heuristic --------------------------------------------------------

def test_epoch_window():
    anchor = NOW.timestamp()
    year = 31_536_000
    assert is_epoch_timestamp(anchor, now=NOW)
    assert is_epoch_timestamp(anchor - 4 * year, now=NOW)
    assert is_epoch_timestamp(anchor + 5 * year, now=NOW)
    assert not is_epoch_timestamp(anchor - 6 * year, now=NOW)
    assert not is_epoch_timestamp(100_000, now=NOW)


# -- infer_type -------------------------------------------------------------

@pytest.mark.parametrize(
    "value, expected",
    [
        ("free text", pa.string()),
        ("60af1f2e93f8a7c3d4e5f601", pa.string()),  # hexish string stays string
        (True, pa.bool_()), ("yes", pa.bool_()),
        (datetime(2020, 1, 1), pa.date32()),            # midnight → date32
        (datetime(2020, 1, 1, 10, 0), pa.date64()),     # intraday → date64
        ("2020-01-01", pa.date32()),                     # string-speculated date
        (12345, pa.int32()),
        (2**40, pa.int64()),
        (2**80, pa.string()),                            # too wide for int64
        ("12345", pa.int32()),                           # string-speculated int
        (1.5, pa.float32()),
        (1e300, pa.float64()),
        (b"\x00\x01", pa.binary()),
        (None, pa.string()),                             # no info → string
    ],
)
def test_infer_type(value, expected):
    assert infer_type(value, "f", now=NOW).equals(expected)


def test_infer_type_epoch_seconds():
    assert infer_type(NOW.timestamp(), "ts", now=NOW).equals(pa.timestamp("s"))
    assert infer_type(int(NOW.timestamp()), "ts", now=NOW).equals(pa.timestamp("s"))
    # outside the window the plain numeric rules apply
    assert infer_type(100_000, "n", now=NOW).equals(pa.int32())


def test_infer_type_rejects_nested():
    with pytest.raises(NotImplementedError):
        infer_type({"a": 1}, "f")
    with pytest.raises(NotImplementedError):
        infer_type([1, 2], "f")


# -- batch fold -------------------------------------------------------------

def test_infer_fields_from_rows_unifies():
    rows = [
        {"a": 1, "b": 1.5, "c": "x"},
        {"a": 2**40, "b": 2, "d": b"z"},
        {"a": None, "c": 3, "d": "s"},
    ]
    fields = infer_fields_from_rows(rows, now=NOW)
    assert fields["a"].equals(pa.int64())      # int32 ⊔ int64
    assert fields["b"].equals(pa.float32())    # float ⊔ int
    assert fields["c"].equals(pa.string())     # string ⊔ int → string
    assert fields["d"].equals(pa.binary())     # binary contagion


def test_infer_fields_missing_keys_absent():
    fields = infer_fields_from_rows([{"a": 1}, {"b": "x"}], now=NOW)
    assert set(fields) == {"a", "b"}


def test_date64_unifies_and_lands_as_parquet_timestamp(spark, tmp_path):
    """End-to-end reference-lattice date64 path on real data
    (reference schema.py:352-356): ISO datetime STRINGS where some rows
    are midnight-only (infer date32) and some carry time-of-day (infer
    date64) must unify to date64, apply as Spark TimestampType, and
    round-trip through the parquet sink at millisecond precision."""
    from datetime import datetime

    import pyarrow as pa
    from pyspark.sql import types as T

    from mongo2pq_spark.plans.pipeline import extract_load_collection
    from mongo2pq_spark.schema.inference import infer_schema_from_df
    from mongo2pq_spark.schema.model import Schema

    rows = [
        ("a", "2024-03-05T00:00:00"),            # midnight → date32
        ("b", "2024-03-05T13:45:30.123000"),     # time-of-day → date64
        ("c", "2024-03-06T00:00:00"),
        ("d", "2024-03-07T08:00:15.500000"),
    ]
    df = spark.createDataFrame(rows, "row_key string, snapshot string")
    fields = infer_schema_from_df(df)
    assert fields["snapshot"].equals(pa.date64())  # lattice: date32 ⊔ date64

    schema = Schema("snaps", fields)
    applied = schema.apply(df)
    assert isinstance(applied.schema["snapshot"].dataType, T.TimestampType)

    path = extract_load_collection(applied, schema, tmp_path)
    back = {
        r["row_key"]: r["snapshot"] for r in spark.read.parquet(path).collect()
    }
    assert back["b"] == datetime(2024, 3, 5, 13, 45, 30, 123000)  # ms kept
    assert back["a"] == datetime(2024, 3, 5, 0, 0, 0)


def test_read_sf_table_handles_spark_int96_timestamps(spark, tmp_path):
    """Spark's own default parquet output (legacy INT96 timestamps,
    which pyarrow reports as timestamp[ns]) must read back unchanged:
    the nanos-as-long rebuild applies only to INT64 TIMESTAMP(NANOS)
    — div-ing a real TIMESTAMP column fails analysis outright."""
    import datetime as dt

    from mongo2pq_spark.sources.registry import read_sf_table

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 12, 30, 15, 123456))],
        "event_id bigint, ts timestamp",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    back = read_sf_table(spark, str(tmp_path), "events")
    assert back.schema["ts"].dataType.typeName() == "timestamp"
    row = back.collect()[0]
    assert row["ts"] == dt.datetime(2024, 3, 1, 12, 30, 15, 123456)
