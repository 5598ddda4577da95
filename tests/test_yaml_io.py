"""Schema YAML round-trip tests (FIXTURES.md F4; reference format
schema.py:87-108 / :173-202)."""

from pathlib import Path

import pyarrow as pa
import pytest

from mongo2pq_spark.exceptions import SchemaParseError
from mongo2pq_spark.schema.model import Schema
from mongo2pq_spark.schema.yaml_io import dump_schema_to_file, load_schema_from_file

FIELDS = {
    "_id": pa.string(),
    "numeric_id": pa.int32(),
    "recorded_ts": pa.timestamp("s"),
    "event_day": pa.date32(),
    "snapshot": pa.date64(),
    "engine_temp": pa.float32(),
    "payload_blob": pa.binary(),
    "is_active": pa.bool_(),
}


def test_round_trip(tmp_path: Path):
    schema = Schema("telemetry_data", FIELDS)
    path = dump_schema_to_file(schema, destination=tmp_path)
    assert path.name == "telemetry_data.yaml"
    loaded = load_schema_from_file(path)
    assert loaded == schema
    assert list(loaded.fields) == list(FIELDS)  # order preserved


def test_reference_format_loads(tmp_path: Path):
    # Hand-written file in the reference's exact dump format.
    path = tmp_path / "coll.yaml"
    path.write_text(
        "!schema\nname: coll\nfields:\n  a: int64\n  b: timestamp[s]\n  c: string\n"
    )
    loaded = load_schema_from_file(path)
    assert loaded.fields["b"].equals(pa.timestamp("s"))


def test_broken_alias_raises(tmp_path: Path):
    path = tmp_path / "broken_alias.yaml"
    path.write_text("!schema\nname: c\nfields:\n  a: notatype\n")
    with pytest.raises(SchemaParseError):
        load_schema_from_file(path)


def test_not_a_schema_raises(tmp_path: Path):
    path = tmp_path / "not_a_schema.yaml"
    path.write_text("name: c\nfields:\n  a: int64\n")
    with pytest.raises(SchemaParseError):
        load_schema_from_file(path)


def test_missing_file_raises(tmp_path: Path):
    with pytest.raises(SchemaParseError):
        load_schema_from_file(tmp_path / "nope.yaml")


def test_merge_conflict_fixture():
    # FIXTURES.md F5: forced lattice fallback on every field.
    a = Schema("c", {"a": pa.int32(), "b": pa.float32(), "c": pa.date64(), "d": pa.string()})
    b = Schema("c", {"a": pa.int64(), "b": pa.int32(), "c": pa.int64(), "d": pa.binary()})
    a.merge(b)
    assert a.fields["a"].equals(pa.int64())
    assert a.fields["b"].equals(pa.float32())
    assert a.fields["c"].equals(pa.int64())
    assert a.fields["d"].equals(pa.binary())
