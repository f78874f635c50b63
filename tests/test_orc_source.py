"""ORC interchange: round-trip fidelity plus the two plan-level
contracts that make a columnar source scale — predicate pushdown into
the stripe indexes and column pruning in the scan schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.sources.orc import read_orc_typed, write_orc
from rentals_data_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_orc_round_trip_exact(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc_typed(spark, path, orders.schema)
    assert back.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_partitioned_write_layout(spark, tmp_path):
    import os

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_part")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    dirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert len(dirs) >= 2
    # partition pruning: reading one partition scans only that dir
    back = read_orc_typed(spark, path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan


def test_orc_pushdown_and_pruning(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_flat")
    write_orc(orders, path)
    q = (
        read_orc_typed(spark, path, orders.schema)
        .where(F.col("o_totalprice") > 100000.0)
        .select("o_orderkey")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan, plan
    # column pruning: only the two referenced columns reach the scan
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan, plan
