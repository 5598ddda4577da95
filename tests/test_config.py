"""Config engine tests — rule parsing, first-match-wins application,
rename collision suffixes (reference config.py + schema.py:55-84;
fixture shapes from FIXTURES.md F3)."""

from pathlib import Path

import pyarrow as pa
import pytest

from mongo2pq_spark.config import parse_config, parse_schema_config
from mongo2pq_spark.exceptions import ConfigParseError
from mongo2pq_spark.schema.model import Schema

F3_YAML = """
schema:
  telemetry_data:
    - type: retype_equals
      fieldname: telemetry_snapshot_time
      fieldtype: timestamp[ms]
    - type: retype_regex
      fieldname: (?<!numeric_)id
      fieldtype: string
    - type: retype_contains
      fieldname: orientation
      fieldtype: float
    - type: rename_regex
      oldname: (\\S+)_(\\S+)
      newname: \\2_\\1
"""


@pytest.fixture
def f3_config(tmp_path: Path):
    path = tmp_path / "config.yaml"
    path.write_text(F3_YAML)
    return parse_config(path)


def test_parse_config_structure(f3_config):
    rules = f3_config["schema"]["telemetry_data"]
    assert [r["type"] for r in rules] == ["retype", "retype", "retype", "rename"]
    assert rules[0]["field_type"].equals(pa.timestamp("ms"))


def test_retype_tests(f3_config):
    rules = f3_config["schema"]["telemetry_data"]
    equals, regex, contains = rules[0], rules[1], rules[2]
    assert equals["field_test"]("telemetry_snapshot_time")
    assert not equals["field_test"]("other")
    assert regex["field_test"]("big_id")
    assert not regex["field_test"]("numeric_id")  # lookbehind honored
    assert contains["field_test"]("flap_orientation")


def test_use_config_first_match_wins(f3_config):
    schema = Schema(
        "telemetry_data",
        {
            "telemetry_snapshot_time": pa.date64(),
            "numeric_id": pa.int32(),
            "big_id": pa.int64(),
            "flap_orientation": pa.int32(),
            "note": pa.string(),
        },
    )
    schema.use_config(f3_config["schema"])
    fields = schema.fields
    # retype_equals fired, and the rename rule also applied to the name
    # (greedy \S+ makes (\S+)_(\S+) split at the LAST underscore)
    assert fields["time_telemetry_snapshot"].equals(pa.timestamp("ms"))
    # regex (?<!numeric_)id skips numeric_id: keeps int32, renamed
    assert fields["id_numeric"].equals(pa.int32())
    # big_id matches the regex retype → string (first matching retype wins)
    assert fields["id_big"].equals(pa.string())
    # contains rule fires for orientation → float32 alias 'float'
    assert fields["orientation_flap"].equals(pa.float32())
    # rename map records original → final
    assert schema.rename_map["numeric_id"] == "id_numeric"


def test_rename_collision_suffix():
    config = parse_schema_config(
        {"c": [{"type": "rename_regex", "oldname": "^(a|b)$", "newname": "x"}]}
    )
    schema = Schema("c", {"a": pa.int32(), "b": pa.int64(), "x": pa.string()})
    schema.use_config(config)
    # 'a' → 'x' collides with existing 'x' → 'x_1'; 'b' → 'x_2'
    assert list(schema.fields) == ["x_1", "x_2", "x"]


def test_rename_regex_upper():
    config = parse_schema_config(
        {
            "c": [
                {
                    "type": "rename_regex_upper",
                    "oldname": r"(\S+)_(\S+)",
                    "newname": r"\2_\1",
                    "upper": [2],
                }
            ]
        }
    )
    schema = Schema("c", {"datapoint_source": pa.string()})
    schema.use_config(config)
    assert list(schema.fields) == ["SOURCE_datapoint"]


def test_malformed_nodes_skipped():
    config = parse_schema_config(
        {
            "c": [
                {"type": "retype_equals", "fieldname": "a"},       # missing fieldtype
                {"type": "retype_equals", "fieldname": "a", "fieldtype": "notatype"},
                {"type": "bogus_rule"},
                {"no_type": True},
                {"type": "retype_equals", "fieldname": "a", "fieldtype": "int64"},
            ]
        }
    )
    assert len(config["c"]) == 1  # only the final valid rule survives


def test_schema_section_must_be_mapping():
    with pytest.raises(ConfigParseError):
        parse_schema_config(["not", "a", "dict"])
    with pytest.raises(ConfigParseError):
        parse_schema_config({"c": {"not": "a list"}})


def test_non_mapping_root_ignored(tmp_path: Path):
    path = tmp_path / "bad.yaml"
    path.write_text("- just\n- a list\n")
    assert parse_config(path) == {}


def test_registry_window_ordering():
    """load_all returns every registered query exactly once, with the
    driver-window priority list fully resolved (a typo there would
    silently drop a query from the correctness window)."""
    from mongo2pq_spark.queries.registry import _DRIVER_WINDOW_FIRST, load_all

    specs = load_all()
    names = list(specs)
    assert len(names) == len(set(names))
    assert len(_DRIVER_WINDOW_FIRST) == 50
    assert names[:50] == _DRIVER_WINDOW_FIRST


def test_no_registered_query_ships_unchecked():
    """Every registered query must either sit inside the driver's
    50-query correctness window or have a row in some recorded
    CORRECTNESS_r*.json — otherwise it ships with zero correctness
    signal (the text_clean/text_decontaminate gap of round 2)."""
    import glob
    import json

    from mongo2pq_spark.queries.registry import (
        load_all,
        unchecked_queries_outside_window,
    )

    repo = Path(__file__).resolve().parents[1]
    checked: set[str] = set()
    for p in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        with open(p) as f:
            rows = json.load(f)
        # a crashed check (err, no row data) is NOT a correctness signal
        checked |= {
            name
            for name, row in rows.items()
            if row.get("rows_match") is not None or row.get("err") == "no_oracle"
        }
    names = list(load_all())
    offenders = unchecked_queries_outside_window(names, checked)
    assert offenders == [], (
        f"queries with no correctness signal outside the driver window: "
        f"{offenders} — rotate them into _DRIVER_WINDOW_FIRST"
    )

    # the queue exemption must be SELF-EXPIRING: once a queued query
    # has a driver correctness row, leaving it in the queue would let
    # the bypass outlive its purpose (and hide a future regression of
    # this guard). load_all() itself rejects queue entries that don't
    # name a registered query.
    from mongo2pq_spark.queries.registry import _NEXT_WINDOW_QUEUE

    expired = sorted(set(_NEXT_WINDOW_QUEUE) & checked)
    assert expired == [], (
        f"_NEXT_WINDOW_QUEUE entries already driver-checked: {expired} "
        f"— remove them from the queue (and keep them in the window "
        f"rotation like any other query)"
    )


def test_window_guard_trips_on_synthetic_violation():
    from mongo2pq_spark.queries.registry import unchecked_queries_outside_window

    names = ["a", "b", "c", "d"]
    # c has a historical row, d has none and is outside the window of 2
    assert unchecked_queries_outside_window(names, {"c"}, window_size=2) == ["d"]
    assert unchecked_queries_outside_window(names, {"c", "d"}, window_size=2) == []


def test_changed_queries_must_enter_driver_window():
    """Machine-enforced window re-entry (verdict r11 #4): every
    registered query's source hash must either match the committed
    manifest (unchanged since its last staging) or the name must sit
    inside the current 50-slot driver window (its next driver row
    will reflect the changed code). The manifest is refreshed ONLY
    via scripts/update_query_manifest.py, which refuses to refresh
    hashes outside the window — so a changed query cannot keep a
    stale green driver row silently."""
    import json

    from mongo2pq_spark.queries.registry import (
        load_all,
        query_source_hashes,
        stale_hashes_outside_window,
    )

    repo = Path(__file__).resolve().parents[1]
    with open(repo / "query_manifest.json") as fh:
        manifest = json.load(fh)
    names = list(load_all())
    window = set(names[:50])
    current = query_source_hashes()

    stale = stale_hashes_outside_window(current, manifest, window)
    assert stale == [], (
        f"queries changed WITHOUT re-entering the driver window: "
        f"{stale} — restage them into _DRIVER_WINDOW_FIRST and run "
        f"scripts/update_query_manifest.py"
    )
    # every registered query must be in the manifest (run the update
    # script after registering), and vice versa (run it after
    # replacing/removing a query)
    assert sorted(set(current) - set(manifest)) == [], "run update_query_manifest.py"
    assert sorted(set(manifest) - set(current)) == [], "run update_query_manifest.py"


def test_oracle_shards_cover_every_query():
    """The sharded oracle run must have IDENTICAL coverage to the
    single-process run: the n round-robin shards partition the sorted
    query list exactly (no name dropped, none duplicated), for every
    shard count the runner script offers."""
    from mongo2pq_spark.queries.registry import load_all
    from tests.test_queries_oracle import shard_names

    names = sorted(load_all())
    for n in (2, 4, 8):
        shards = [shard_names(names, f"{k}/{n}") for k in range(n)]
        assert sorted(nm for s in shards for nm in s) == names
    assert shard_names(names, None) == names
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad shard"):
        shard_names(names, "4/4")


def test_stale_hash_guard_trips_on_synthetic_violation():
    from mongo2pq_spark.queries.registry import stale_hashes_outside_window

    manifest = {"a": "h1", "b": "h2", "c": "h3"}
    # a changed inside the window: fine; b changed outside: trips;
    # d is a new registration: not this guard's concern
    current = {"a": "X1", "b": "X2", "c": "h3", "d": "h4"}
    assert stale_hashes_outside_window(current, manifest, {"a"}) == ["b"]
    assert stale_hashes_outside_window(current, manifest, {"a", "b"}) == []


def test_complex_col_guard_trips_on_synthetic_violation(spark):
    from pyspark.sql import functions as F

    from mongo2pq_spark.queries.registry import complex_top_level_cols

    df = spark.range(1).select(
        F.array(F.lit(1)).alias("arr"),
        F.struct(F.lit(1).alias("x")).alias("st"),
        F.create_map(F.lit("k"), F.lit(1)).alias("mp"),
        F.col("id"),
    )
    assert complex_top_level_cols(df.schema) == ["arr", "st", "mp"]


def test_hugeint_guard_trips_on_uncast_integer_sum(tmp_path: Path):
    """The oracle harness must flag DuckDB HUGEINT result columns: an
    un-cast integer sum() types HUGEINT, which the DRIVER's pandas
    canonicalizer converts to float64 ('2936.0' vs Spark's '2936' —
    the sole red row in CORRECTNESS_r10, q12_delay_priority) while the
    harness's fetchall() path preserves Python int and masks it."""
    import duckdb

    con = duckdb.connect()
    try:
        rel = con.sql("SELECT sum(x) AS s, CAST(sum(x) AS BIGINT) AS ok "
                      "FROM (VALUES (1), (2)) t(x)")
        flagged = [
            c
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")
        ]
        assert flagged == ["s"]
        # and the pandas path really does diverge from fetchall
        assert rel.fetchall() == [(3, 3)]
        assert str(rel.df()["s"].dtype) == "float64"
    finally:
        con.close()
