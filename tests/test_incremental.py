"""Incremental aggregate maintenance: the merged aggregate must be
EXACTLY the full recompute over the new snapshot — decimal sums make
this an exact (not approximate) invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators.incremental import (
    aggregate_snapshot,
    incremental_agg_update,
)
from rentals_data_pipeline_spark.operators.relational import snapshot_diff


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _run(spark, old_rows, new_rows):
    cols = ["k", "grp", "x"]
    old = spark.createDataFrame(old_rows, cols)
    new = spark.createDataFrame(new_rows, cols)
    base = old.transform(aggregate_snapshot(["grp"], ["x"]))
    diff = snapshot_diff(old, new, keys=["k"], compare=["grp", "x"])
    removed = old.join(
        diff.where(F.col("change_type").isin("deleted", "changed")).select("k"),
        "k",
        "semi",
    )
    added = new.join(
        diff.where(F.col("change_type").isin("inserted", "changed")).select("k"),
        "k",
        "semi",
    )
    merged = incremental_agg_update(base, removed, added, ["grp"], ["x"])
    full = new.transform(aggregate_snapshot(["grp"], ["x"]))
    return _rows(merged.select("grp", "cnt", "sum_x")), _rows(
        full.select("grp", "cnt", "sum_x")
    )


def test_incremental_equals_full_recompute(spark):
    old = [(1, "a", 10.5), (2, "a", 1.25), (3, "b", 7.0), (4, "c", 2.0)]
    # 2 deleted; 5 inserted into a; 3 changed measure; 4 migrates c -> a
    # (group c disappears entirely — must drop, not show cnt=0).
    new = [(1, "a", 10.5), (5, "a", 3.75), (3, "b", 8.0), (4, "a", 2.0)]
    merged, full = _run(spark, old, new)
    assert merged == full
    groups = {r[0] for r in merged}
    assert "c" not in groups


def test_incremental_null_group_key(spark):
    # NULL group keys aggregate as their own group on both paths.
    old = [(1, None, 1.0), (2, "a", 2.0)]
    new = [(1, None, 4.0), (2, None, 2.0), (3, "a", 9.0)]
    merged, full = _run(spark, old, new)
    assert merged == full


def test_incremental_empty_delta_is_identity(spark):
    rows = [(1, "a", 1.5), (2, "b", 2.5)]
    merged, full = _run(spark, rows, rows)
    assert merged == full
