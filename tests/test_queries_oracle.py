"""The project-side mirror of the driver's t2 gate: every registered
query must hash-match its DuckDB oracle at the test scale factor."""

import pytest

from mongo2pq_spark.queries.registry import load_all
from tests.oracle_harness import compare_query

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
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
