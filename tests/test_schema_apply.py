"""Schema.apply compilation tests: prune + falsy-suppression + cast +
rename in one projection, default intent vs strict_compat quirks
(SURVEY §1.4)."""

import pyarrow as pa
import pytest

from mongo2pq_spark.schema.model import Schema


@pytest.fixture(scope="module")
def dirty_df(spark):
    rows = [
        # (id, label, flag_str, count, temp, epoch, blob)
        (1, "alpha", "true", 10, 1.5, 1_700_000_000, b"ab"),
        (2, "", "yes", 0, 0.0, 1_700_000_100, b""),
        (3, None, "no", -3, None, None, None),
        (4, "delta", "whatever", 7, 2.25, 1_700_000_200, b"xy"),
    ]
    return spark.createDataFrame(
        rows,
        "id long, label string, flag_str string, count long, temp double, "
        "epoch long, blob binary",
    )


SCHEMA = Schema(
    "t",
    {
        "id": pa.int64(),
        "label": pa.string(),
        "flag_str": pa.bool_(),
        "count": pa.int32(),
        "temp": pa.float32(),
        "epoch": pa.timestamp("s"),
        "blob": pa.binary(),
    },
)


def test_default_semantics(dirty_df):
    out = {r["id"]: r for r in SCHEMA.apply(dirty_df).collect()}
    # '' → null; other values kept
    assert out[2]["label"] is None and out[1]["label"] == "alpha"
    # intent bool parse: true/yes → True, no → False, junk → False
    assert out[1]["flag_str"] is True and out[2]["flag_str"] is True
    assert out[3]["flag_str"] is False and out[4]["flag_str"] is False
    # zeros SURVIVE by default (documented intent, not the quirk)
    assert out[2]["count"] == 0 and out[2]["temp"] == 0.0
    # numeric epoch → real timestamp
    assert out[1]["epoch"].year >= 2023
    # int64 → int32 narrowing applied
    assert isinstance(out[1]["count"], int)


def test_strict_compat_quirks(dirty_df):
    out = {r["id"]: r for r in SCHEMA.apply(dirty_df, strict_compat=True).collect()}
    # falsy-drop: 0 / 0.0 / empty bytes → null (reference schema.py:115)
    assert out[2]["count"] is None and out[2]["temp"] is None
    assert out[2]["blob"] is None
    # dead-branch cast_boolean: every string → False (schema.py:128-133)
    assert out[1]["flag_str"] is False and out[2]["flag_str"] is False


def test_prune_and_rename(dirty_df):
    schema = Schema("t", {"id": pa.int64(), "label": pa.string()})
    config = {
        "t": [
            {
                "type": "rename",
                "rename_function": lambda n: "doc_id" if n == "id" else n,
            }
        ]
    }
    schema.use_config(config)
    out = schema.apply(dirty_df)
    assert out.columns == ["doc_id", "label"]  # pruned + renamed


def test_schema_fields_missing_from_source_skipped(dirty_df):
    schema = Schema("t", {"id": pa.int64(), "not_in_source": pa.string()})
    out = schema.apply(dirty_df)
    assert out.columns == ["id"]
