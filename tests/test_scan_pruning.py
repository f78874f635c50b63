"""Scan-level efficiency contracts: partition pruning, predicate
pushdown, column pruning.

These are the properties that decide whether a 100 TB query reads
100 TB or 1 TB; pinning them in the plan keeps a refactor from
silently turning a pruned scan into a full scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.sources.sink import write_partitioned_parquet

SF_DIR = "/root/testdata/sf0.001"


def _scan_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hive_partition_dirs_are_pruned(spark, tmp_path):
    """A filter on the sink's partition column must become a
    PartitionFilter (dir-level pruning), not a row-level Filter over a
    full scan."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "by_status")
    write_partitioned_parquet(orders, out, ["o_orderstatus"])

    pruned = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = _scan_plan(pruned)
    assert "PartitionFilters" in plan, plan
    # the predicate landed in the partition filters of the scan node
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "o_orderstatus" in pf, plan
    # and the result is still correct
    assert pruned.count() == orders.where("o_orderstatus = 'F'").count()


def test_predicate_pushdown_reaches_parquet(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_quantity")
    )
    plan = _scan_plan(li)
    assert "PushedFilters" in plan, plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "l_quantity" in pushed, plan


def test_column_pruning_reaches_parquet(spark):
    """A 2-column projection must produce a 2-column ReadSchema — the
    scan never deserializes untouched columns."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    plan = _scan_plan(li)
    schema_part = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in schema_part and "l_quantity" in schema_part
    assert "l_comment" not in schema_part and "l_extendedprice" not in schema_part
