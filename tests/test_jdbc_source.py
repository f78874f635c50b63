"""JDBC source/sink against the embedded Derby engine Spark ships.

Real round trips — no mocks: Spark writes through JDBC into an
in-memory Derby table, reads it back in parallel range partitions,
and the plan shows the pushed filter on the JDBC relation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.sources.jdbc import (
    discover_bounds,
    read_jdbc,
    write_jdbc,
)

URL = "jdbc:derby:memory:graft_test;create=true"


@pytest.fixture(scope="module")
def seeded(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 3).cast("double").alias("val"),
    )
    write_jdbc(df, URL, "items", mode="overwrite")
    return df


def test_roundtrip_values(spark, seeded):
    got = read_jdbc(spark, URL, "items")
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in seeded.collect()
    )


def test_partitioned_read_splits_and_agrees(spark, seeded):
    got = read_jdbc(
        spark, URL, "items", partition_column="k", num_partitions=4
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in seeded.collect()
    )


def test_bounds_probe(spark, seeded):
    assert discover_bounds(spark, URL, "items", "k") == (0, 999)


def test_filter_pushdown_reaches_jdbc(spark, seeded):
    got = read_jdbc(spark, URL, "items").where(F.col("grp") == 3).select(
        "k", "val"
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "GRP" in plan.upper()
    assert got.count() == len([i for i in range(1000) if i % 7 == 3])


def test_overwrite_truncate_reload(spark, seeded):
    df2 = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.lit(0).alias("grp"),
        F.lit(1.5).alias("val"),
    )
    write_jdbc(df2, URL, "items_reload", mode="overwrite")
    write_jdbc(df2, URL, "items_reload", mode="overwrite", truncate=True)
    assert read_jdbc(spark, URL, "items_reload").count() == 10


def test_timestamp_partitioned_read(spark):
    """Temporal partition columns are advertised — the bounds probe
    must hand Spark datetime bounds (int() on a datetime crashed it)."""
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*60)"
        ).alias("ts"),
    )
    write_jdbc(df, URL, "events_ts", mode="overwrite")
    lo, hi = discover_bounds(spark, URL, "events_ts", "ts")
    assert lo.year == 2024 and hi > lo
    got = read_jdbc(
        spark, URL, "events_ts", partition_column="ts", num_partitions=4
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 200
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_single_value_partition_column_falls_back(spark):
    """lo == hi (one distinct value) reads through a single cursor
    instead of a degenerate range split."""
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit(7).alias("c")
    )
    write_jdbc(df, URL, "items_const", mode="overwrite")
    got = read_jdbc(spark, URL, "items_const", partition_column="c")
    assert got.count() == 5


def test_hash_mod_partitioning(spark, seeded):
    """Sign-safe MOD(MOD(k,N)+N,N) predicate partitioning: N parallel
    cursors that together return exactly the table, each shipping only
    its bucket (engine-side MOD, verified by per-partition counts)."""
    got = read_jdbc(
        spark, URL, "items", num_partitions=4, hash_column='"k"'
    )
    assert got.rdd.getNumPartitions() == 4
    sizes = got.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert sorted(sizes) == [250, 250, 250, 250]
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in seeded.collect()
    )


def test_hash_mod_survives_bigint_min(spark):
    """The old MOD(ABS(k),N) form raised in Derby on the minimum BIGINT
    value (ABS overflows); the sign-safe double-MOD form must scan a
    table containing it — negatives fold into [0, N) and the union is
    exactly the table (round-8 ADVICE fix)."""
    df = spark.createDataFrame(
        [(-(2**63),), (-5,), (-1,), (0,), (3,), (2**63 - 1,)],
        "k bigint",
    )
    write_jdbc(df, URL, "items_extreme", mode="overwrite")
    got = read_jdbc(
        spark, URL, "items_extreme", num_partitions=4, hash_column='"k"'
    )
    assert got.rdd.getNumPartitions() == 4
    assert sorted(r.k for r in got.collect()) == sorted(
        [-(2**63), -5, -1, 0, 3, 2**63 - 1]
    )


def test_constant_bounds_fall_back_to_hash_partitions(spark):
    """A constant-valued range column with a hash_column supplied keeps
    parallelism: the degenerate-bounds branch reroutes to N>1 hash-mod
    cursors instead of one, and NULL hash keys still arrive (bucket 0)."""
    df = spark.range(0, 40).select(
        F.when(F.col("id") < 38, F.col("id")).alias("k"),
        F.lit(7).alias("c"),
    )
    write_jdbc(df, URL, "items_const_hash", mode="overwrite")
    got = read_jdbc(
        spark,
        URL,
        "items_const_hash",
        partition_column="c",
        num_partitions=3,
        hash_column='"k"',
    )
    assert got.rdd.getNumPartitions() == 3
    assert got.count() == 40
    assert got.where(F.col("k").isNull()).count() == 2
