"""Bucketed-table sink: the co-located (shuffle-free) join path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.sources.sink import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], 4,
        sort_by=["o_orderkey"], path=str(tmp_path / "o"),
    )
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 4,
        sort_by=["o_orderkey"], path=str(tmp_path / "l"),
    )
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # co-located results are still correct
    n = joined.count()
    want = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    )
    assert n == want and n > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
