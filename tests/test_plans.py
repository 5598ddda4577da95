"""Plan-hygiene tests: assert the physical plans have the shape the
100 TB design depends on — filters and projections pushed into the
parquet scan, small dimensions broadcast, whole-stage codegen in the
hot paths. A correct-but-badly-planned query fails here."""

from pyspark.sql import functions as F

from mongo2pq_spark.queries.registry import load_all

SPECS = load_all()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _formatted(spark, sf_dir, name) -> str:
    return _plan(SPECS[name].fn(spark, sf_dir))


def test_filter_is_pushed_to_scan(spark, sf_dir):
    plan = _formatted(spark, sf_dir, "filter_equality")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    plan = _formatted(spark, sf_dir, "scan_projection")
    # ReadSchema must not include unprojected columns (props, user_id)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _formatted(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    # the only shuffle joins allowed are on the orders⋈lineitem axis
    assert plan.count("SortMergeJoin") <= 1


def test_q1_uses_whole_stage_codegen_and_partial_agg(spark, sf_dir):
    df = SPECS["q1_pricing_summary"].fn(spark, sf_dir)
    qe = df._jdf.queryExecution()  # noqa: SLF001
    simple = df._sc._jvm.PythonSQLUtils.explainString(qe, "simple")  # noqa: SLF001
    assert "partial_sum" in simple  # map-side combine before the shuffle
    assert simple.count("HashAggregate") >= 2  # partial + final
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in simple
    codegen = df._sc._jvm.PythonSQLUtils.explainString(qe, "codegen")  # noqa: SLF001
    assert "WholeStageCodegen subtrees" in codegen


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _formatted(spark, sf_dir, "top_k")
    assert "TakeOrderedAndProject" in plan


def test_minhash_single_aggregation_pass(spark, sf_dir):
    """The k-permutation signature must be ONE aggregation (k min
    columns), not k passes."""
    from mongo2pq_spark.operators.dedup import minhash_signatures
    from mongo2pq_spark.sources.registry import read_sf_table

    sig = minhash_signatures(read_sf_table(spark, sf_dir, "documents"))
    plan = _plan(sig)
    # one partial + one final aggregate over the exploded shingle stream
    # ("Name (id)" counts tree nodes only, not the details section)
    assert plan.count("HashAggregate (") == 2


def test_exact_dedup_has_partial_aggregation(spark, sf_dir):
    plan = _formatted(spark, sf_dir, "dedup_exact")
    assert plan.count("HashAggregate") >= 2
