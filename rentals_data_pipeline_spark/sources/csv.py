"""Typed CSV ingest: header probe + explicit-schema read.

Capability parity with the reference's ``read_raw_csv`` (reference:
jobs/io_utils.py:69-85): pass 1 reads only the header to discover the
dynamic column set; pass 2 re-reads with an explicit schema and
``inferSchema`` disabled. Works for local, ``file://`` and object-store
(``s3a://``) paths alike — the path scheme is the only difference on a
cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from rentals_data_pipeline_spark.sources.schema import DATE_COL_PATTERN, build_schema


def probe_csv_columns(spark: SparkSession, path: str) -> list[str]:
    """Pass 1: schema-less, header-only read to list column names."""
    return spark.read.option("header", "true").csv(path).columns


def read_csv_typed(
    spark: SparkSession,
    path: str,
    fixed_fields: dict[str, T.DataType] | None = None,
    pattern: re.Pattern[str] = DATE_COL_PATTERN,
    pattern_type: T.DataType = T.DoubleType(),
) -> DataFrame:
    """Two-pass typed CSV read with a dynamically built explicit schema."""
    columns = probe_csv_columns(spark, path)
    schema = build_schema(
        columns, fixed_fields=fixed_fields, pattern=pattern, pattern_type=pattern_type
    )
    return (
        spark.read.option("header", "true")
        .schema(schema)  # explicit — never inferSchema (full-scan at scale)
        .csv(path)
    )
