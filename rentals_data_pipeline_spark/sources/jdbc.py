"""JDBC ingest/egress — the operational-database side door.

A 100 TB lakehouse still ingests dimension and operational tables from
RDBMSes. The scale rules for JDBC are different from file sources and
are baked in here:

- **One connection reads nothing at scale.** ``read_jdbc`` splits the
  table into ``num_partitions`` range predicates on a numeric/temporal
  ``partition_column`` (Spark's partitionColumn/lowerBound/upperBound
  machinery), so the scan is N parallel cursors, not one. Bounds are
  discovered with a single MIN/MAX probe query when not supplied —
  the one driver-side round trip, returning exactly one row.
- **Pushdown still applies.** Catalyst compiles ``.where``/``select``
  into the generated SQL (WHERE + column list), so the database ships
  only matching rows/columns; the plan shows the pushed filters on
  the JDBCRelation node.
- **Streamed cursors.** ``fetchsize`` keeps the JDBC driver from
  buffering whole result sets per partition.
- **Batched writes.** ``write_jdbc`` uses ``batchsize`` inserts; for
  idempotent reloads use mode="overwrite" with ``truncate`` so the
  table is truncated, not dropped (keeps grants/indexes).

No driver jars are assumed beyond what the Spark distribution carries;
tests exercise the embedded Derby engine that ships with Spark.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession


def discover_bounds(
    spark: SparkSession, url: str, table: str, partition_column: str,
    properties: dict | None = None,
) -> tuple:
    """One-row MIN/MAX probe for partition bounds — the only
    non-parallel query in a partitioned JDBC ingest. Numeric columns
    return ints; temporal columns return the datetime/date objects
    as-is (Spark's lowerBound/upperBound options parse their str()
    forms directly — coercing them through int() crashed the
    advertised timestamp-partitioned ingest).

    ``table`` is interpolated into the probe's FROM exactly as Spark
    interpolates the ``dbtable`` option into its generated SQL — i.e.
    it may be any SQL relation expression the target engine accepts
    (a bare name, a quoted mixed-case name, schema.table, or a
    parenthesized subquery with alias). Pass quoted/mixed-case names
    pre-quoted, the same string you would hand to ``dbtable``."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option(
            # ANSI-quote the column: unquoted identifiers case-fold in
            # most engines (Derby/Postgres fold differently than the
            # quoted names Spark's JDBC writer creates)
            "query",
            f'SELECT MIN("{partition_column}") AS "lo", '
            f'MAX("{partition_column}") AS "hi" FROM {table}',
        )
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    row = reader.load().collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return None, None
    if isinstance(lo, (int, float, Decimal)):
        # floor/ceil, not int(): truncating fractional bounds inward
        # skews the stride (coverage survives either way — Spark's
        # extreme partitions are open-ended — but strides should span
        # the true range)
        return math.floor(lo), math.ceil(hi)
    return lo, hi


def hash_mod_predicates(
    partition_column: str, num_partitions: int
) -> list[str]:
    """N disjoint, covering WHERE predicates that bucket rows by
    ``MOD(MOD(column, N) + N, N)`` — predicate partitioning for keys
    range bounds cannot split: constant-bounded columns elsewhere in
    the ingest, or high-cardinality surrogate keys with pathological
    ranges. ``partition_column`` is interpolated VERBATIM — it may be
    any numeric SQL expression the target engine accepts; pre-quote
    identifiers exactly as you would for ``dbtable`` (quoting here
    would break both expressions and already-quoted names).
    NULL keys route to bucket 0 so the union stays exactly the table.
    The double-MOD form folds negative keys into [0, N) without ABS:
    ``ABS(BIGINT MIN)`` overflows and raises in most engines
    (Derby/Postgres), so one extreme surrogate key would fail that
    bucket's whole scan at runtime. MOD is ANSI and evaluates
    engine-side, so each of the N cursors ships only its bucket."""
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    col = f"({partition_column})"
    preds = [
        f"MOD(MOD({col}, {num_partitions}) + {num_partitions},"
        f" {num_partitions}) = {i}"
        for i in range(num_partitions)
    ]
    preds[0] = f"({preds[0]} OR {col} IS NULL)"
    return preds


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    bounds: tuple[int, int] | None = None,
    fetch_size: int = 10_000,
    properties: dict | None = None,
    hash_column: str | None = None,
) -> DataFrame:
    """Parallel JDBC table scan. Without ``partition_column`` the read
    is a single cursor (fine for dimension tables); with one, the scan
    becomes ``num_partitions`` range queries with bounds auto-probed
    unless given. ``hash_column`` names a numeric column (or SQL
    expression, interpolated verbatim — pre-quote identifiers as for
    ``dbtable``) to bucket by ``MOD(ABS(col), N)`` predicate
    partitioning instead — for keys range bounds cannot split — and
    also serves as the fallback when a requested range partitioning
    degenerates (single distinct value), so parallelism survives
    degenerate bounds."""
    props = {"fetchsize": str(fetch_size), **(properties or {})}

    def _predicated(col: str) -> DataFrame:
        return spark.read.jdbc(
            url,
            table,
            predicates=hash_mod_predicates(col, num_partitions),
            properties=props,
        )

    if hash_column is not None and partition_column is None:
        return _predicated(hash_column)
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    for k, v in props.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        lo, hi = bounds if bounds is not None else discover_bounds(
            spark, url, table, partition_column, properties
        )
        if lo is None or lo == hi:
            # empty table or a single distinct value: nothing to range
            # over — fall back to hash-mod predicates when a hash
            # column was supplied, else a plain single-cursor read
            # returns the same rows (and sidesteps the type-specific
            # +1 bound bump)
            if hash_column is not None and lo is not None:
                return _predicated(hash_column)
            return reader.load()
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lo))
            .option("upperBound", str(hi))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    truncate: bool = False,
    properties: dict | None = None,
) -> None:
    """Batched JDBC write; ``truncate=True`` with mode="overwrite"
    empties the table instead of dropping it (preserves DDL)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if truncate:
        writer = writer.option("truncate", "true")
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
