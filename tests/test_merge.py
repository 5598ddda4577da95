"""MERGE/SCD2 operator tests."""

from pyspark.sql import functions as F

from mongo2pq_spark.operators.merge import merge_upsert, scd2_close_and_append


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k long, v string"
    )
    out = {r.k: r.v for r in merge_upsert(base, updates, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_upsert_empty_updates(spark):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    updates = spark.createDataFrame([], "k long, v string")
    assert merge_upsert(base, updates, "k").count() == 1


def test_scd2_close_and_append(spark):
    current = spark.createDataFrame(
        [(1, "old-a", None), (2, "old-b", None)],
        "k long, v string, valid_to timestamp",
    )
    updates = spark.createDataFrame([(1, "new-a")], "k long, v string")
    stamp = F.lit("2026-01-01 00:00:00").cast("timestamp")
    out = scd2_close_and_append(current, updates, "k", closed_at=stamp).collect()
    rows = {(r.k, r.v): r.valid_to for r in out}
    assert rows[(1, "old-a")] is not None     # closed
    assert rows[(1, "new-a")] is None         # new current row
    assert rows[(2, "old-b")] is None         # untouched
    assert len(rows) == 3


def test_scd2_full_history_input_is_safe(spark):
    """Already-closed rows pass through untouched even when their key
    is updated again — re-stamping closed history corrupts SCD2
    (ADVICE r1)."""
    old_stamp = "2025-06-01 00:00:00"
    current = spark.createDataFrame(
        [(1, "v1", old_stamp), (1, "v2", None), (2, "w1", None)],
        "k long, v string, valid_to string",
    ).withColumn("valid_to", F.col("valid_to").cast("timestamp"))
    updates = spark.createDataFrame([(1, "v3")], "k long, v string")
    stamp = F.lit("2026-01-01 00:00:00").cast("timestamp")
    out = scd2_close_and_append(current, updates, "k", closed_at=stamp).collect()
    rows = {(r.k, r.v): r.valid_to for r in out}
    assert str(rows[(1, "v1")]) == old_stamp  # closed history untouched
    assert str(rows[(1, "v2")]).startswith("2026-01-01")  # open row closed
    assert rows[(1, "v3")] is None  # new current
    assert rows[(2, "w1")] is None  # unrelated open row untouched
    assert len(rows) == 4


def test_snapshot_diff_statuses_and_null_transitions(spark):
    """Per-key diff statuses on a planted pair of snapshots; the
    null-safe digest makes NULL→value and value→NULL transitions
    count as changed, and multi-column keys work."""
    from mongo2pq_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, t string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 3.0), (4, "d", None), (5, "e", 5.0)],
        "k long, t string, v double",
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], ["t", "v"]).collect()
    }
    assert got == {
        1: "removed",
        2: "changed",    # NULL -> 2.0
        3: "unchanged",
        4: "changed",    # 4.0 -> NULL
        5: "added",
    }
