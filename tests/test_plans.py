"""Physical-plan assertions (PLANS.md made regression-proof): pushdown,
broadcast choices, partial aggregation, and top-k strategy are properties
of the code, not accidents of one Spark version's defaults."""

from __future__ import annotations

from api_to_parquet_spark.queries import all_queries

QUERIES = all_queries()


def _plan(spark, sf_smoke, name: str) -> str:
    df = QUERIES[name](spark, sf_smoke)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "pricing_summary")
    # only the 7 used columns of 11 reach the scan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_star_join_broadcasts_all_dims(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_partial_aggregation_before_shuffle(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "pricing_summary")
    assert "partial_sum" in plan  # map-side combine
    assert plan.index("partial_sum") > plan.index("Exchange")  # below it


def test_topk_avoids_global_sort(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "sort_topk")
    assert "TakeOrderedAndProject" in plan


def test_disjunction_extracted_and_pushed(spark, sf_smoke):
    plan = _plan(spark, sf_smoke, "disjunctive_filter_join")
    assert "PushedFilters: [IsNotNull(l_partkey), Or(" in plan


def test_scalar_subquery_decorrelated(spark, sf_smoke):
    """The correlated per-part average becomes aggregate + join — no
    per-row subquery execution node survives in the physical plan."""
    plan = _plan(spark, sf_smoke, "scalar_subquery")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "InSubquery" not in plan and "ScalarSubquery" not in plan
