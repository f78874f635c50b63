"""SQL front-end plan shapes: Catalyst must de-correlate the
subqueries into joins (a correlated subquery executed per-row would be
the 100 TB disaster case; certifying values alone wouldn't catch a
semantically-correct-but-quadratic plan)."""

from __future__ import annotations

from rentals_data_pipeline_spark.plans import sql_queries  # noqa: F401
from rentals_data_pipeline_spark.plans.catalog import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_decorrelates_to_semi_and_anti(spark):
    plan = _plan(spark, "sql_correlated_exists_customers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_scalar_subqueries_decorrelate_to_aggregate_join(spark):
    plan = _plan(spark, "sql_above_customer_avg_orders")
    # de-correlated: per-customer aggregate joined back, no per-row
    # subquery execution nodes
    assert "HashAggregate" in plan
    assert "Join" in plan


def test_in_subquery_decorrelates_to_semi(spark):
    plan = _plan(spark, "sql_in_subquery_supplier_nations")
    assert "LeftSemi" in plan
