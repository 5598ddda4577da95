"""The project-side mirror of the driver's t2 gate: every registered
query must hash-match its DuckDB oracle at the test scale factor.

Sharding (verdict r11 #5 — the full 240-query pass outgrew one
process): set ``SPARK_GRAFT_QUERY_SHARD=k/n`` (k in 0..n-1) to run
the k-th round-robin slice of the sorted query list. The union of
the n shards is exactly the unsharded suite (pinned by
``test_config.py::test_oracle_shards_cover_every_query``);
``scripts/run_oracle_shards.py`` launches all n as parallel
processes with the 32 cores split between them."""

import os

import pytest

from mongo2pq_spark.queries.registry import load_all
from tests.oracle_harness import compare_query

SPECS = load_all()


def shard_names(names: list[str], shard: str | None) -> list[str]:
    """Round-robin slice ``k/n`` of the sorted name list (round-robin
    rather than contiguous so the heavy query families — dedup_*,
    multimodal_*, text_* are alphabetical neighbors — spread evenly
    across shards)."""
    if not shard:
        return names
    k, n = (int(x) for x in shard.split("/"))
    if not 0 <= k < n:
        raise ValueError(f"bad shard {shard!r}: need k in 0..n-1")
    return [nm for i, nm in enumerate(names) if i % n == k]


@pytest.mark.parametrize(
    "name", shard_names(sorted(SPECS), os.environ.get("SPARK_GRAFT_QUERY_SHARD"))
)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    result = compare_query(spark, spec, sf_dir)
    assert result["complex_cols"] == [], (
        f"{name} returns top-level array/struct/map column(s) "
        f"{result['complex_cols']}: the driver canonicalizer cannot "
        "sort/hash them — scalarize (size + md5 digest) instead"
    )
    if spec.oracle is None:
        assert result["spark_rows"] >= 0  # rows-only check
        return
    assert result["hugeint_cols"] == [], (
        f"{name} oracle returns HUGEINT column(s) "
        f"{result['hugeint_cols']} (DuckDB's type for an un-cast "
        "integer sum()): the DRIVER canonicalizes through pandas, "
        "where HUGEINT becomes float64 and hash-mismatches Spark's "
        "int (CORRECTNESS_r10 q12_delay_priority) — CAST(... AS "
        "BIGINT) in the oracle SQL"
    )
    assert result["match"], (
        f"{name}: cols_match={result.get('cols_match')} "
        f"spark={result['spark_rows']} duck={result.get('duck_rows')} "
        f"spark_cols={result.get('spark_cols')} duck_cols={result.get('duck_cols')} "
        f"only_spark={result.get('sample_only_spark')} "
        f"only_duck={result.get('sample_only_duck')}"
    )
