"""Test-table loading (driver parquet at /root/testdata/sf*/)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rentals_data_pipeline_spark import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table.

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark's
    reader rejects; we read nanos as long (legacy conf, set in the test
    session / check harness) and convert to a microsecond timestamp the
    same way DuckDB does (truncation), so both engines see identical
    values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC whatever session the driver hands us: time-window starts /
    # date_trunc must align with the (tz-naive) DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    ts_like = [
        f.name
        for f in df.schema.fields
        if f.name in ("ts",) and f.dataType.simpleString() == "bigint"
    ]
    for c in ts_like:
        # integer `div`, NOT `/`: float division of epoch-nanos (~1.7e18)
        # exceeds double's 53-bit mantissa and drifts by hundreds of ns
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view for spark.sql access."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
