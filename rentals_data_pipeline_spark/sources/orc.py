"""ORC interchange: the second columnar format a lakehouse engine must
speak (Hive-era warehouses and Trino/Presto deployments hand data over
as ORC). Parquet stays the native format (sources/sink.py); these
helpers are the ingest/egress boundary with the same scale discipline:
typed reads (no schema inference jobs), predicate pushdown + column
pruning verified at the plan level (ORC carries stripe-level min/max
indexes exactly like parquet row groups), partitioned writes with no
driver-side funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc_typed(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan; pass ``schema`` to pin types without a footer-listing
    job (the CSV-source discipline applied to columnar ingest). ORC
    pushes filters to stripe/row-group indexes the same way parquet
    does — `tests/test_orc_source.py` asserts PushedFilters + pruned
    ReadSchema on the physical scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned ORC write mirroring write_partitioned_parquet's
    contract: executor-parallel (never coalesce(1)), optional hive
    partition dirs, zstd by default, ``maxRecordsPerFile`` for
    file-size control."""
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
