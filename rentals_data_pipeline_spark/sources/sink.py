"""Partitioned parquet sink.

Capability parity with the reference's ``write_processed`` (reference:
jobs/io_utils.py:88-107) — derived partition column, overwrite, snappy,
hive-style partition dirs for downstream partition pruning — with the
one deliberate divergence SURVEY §4.3 mandates: **no ``coalesce(1)``**.
A single output task serializes the write; at 100 TB it is the job. We
instead repartition by the partition columns so each partition dir is
written by tasks that own all its rows (no small-file explosion), and
let AQE size the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    derived: dict[str, Column] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write hive-partitioned snappy parquet, scale-safe.

    ``derived`` adds computed partition columns first (the reference
    derives ``year`` from ``month`` — jobs/io_utils.py:101).
    """
    for name, expr in (derived or {}).items():
        df = df.withColumn(name, expr)
    if partition_by:
        # One shuffle keyed on the partition columns → each dir written
        # by the tasks owning its rows; AQE coalesces small partitions.
        df = df.repartition(*partition_by)
        writer = df.write.mode(mode).option("compression", compression)
        writer.partitionBy(*partition_by).parquet(path)
    else:
        df.write.mode(mode).option("compression", compression).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 64,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (optionally sort-ordered) parquet table.

    The co-located join path for 100 TB fact tables: two tables bucketed
    on the same keys with the same bucket count join WITHOUT a shuffle —
    each task reads matching bucket files from both sides (plus
    bucket-local sort when ``sort_by`` matches the join key, removing
    the sort too). Pay one shuffle at write time, amortized over every
    downstream join/aggregation on those keys. Bucket metadata lives in
    the session catalog (``saveAsTable`` — plain ``.parquet(path)``
    cannot record it); pass ``path`` to make it an external table.
    """
    writer = (
        df.repartition(num_buckets, *bucket_by)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
