"""Relational core: project/cast, filters, dedup, joins, set ops, sort.

Parity targets: enforce_schema's select+cast+drop (reference:
jobs/transform.py:37-56), not-null cleaning (jobs/transform.py:91-104),
key-based dedup (jobs/transform.py:107-119). The reference has **no
joins by design** (window-over-join rule, CLAUDE.md:20) — joins enter
here as first-class engine capability for the star-schema surface.

Scale notes:
- ``dedup_keep_first`` replaces ``dropDuplicates`` (shuffle-order
  nondeterministic, SURVEY §7.4) with row_number over an explicit
  tiebreaker — deterministic, oracle-comparable, same single shuffle.
- ``join_dims`` broadcasts small dimensions explicitly; big-big joins
  stay sort-merge and AQE handles skew.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

Op = Callable[[DataFrame], DataFrame]


def project_cast(columns: dict[str, T.DataType]) -> Op:
    """Select exactly ``columns`` with casts; drops everything else
    (defensive second cast — reference jobs/transform.py:50-56)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.select(*[F.col(f"`{c}`").cast(t).alias(c) for c, t in columns.items()])

    return _apply


def drop_null_rows(columns: list[str]) -> Op:
    """Remove rows with NULL in any of ``columns`` — run *before*
    window ops so lag/rank never see null measure rows (semantic
    ordering, reference jobs/transform.py:95-97)."""

    def _apply(df: DataFrame) -> DataFrame:
        cond = F.lit(True)
        for c in columns:
            cond = cond & F.col(c).isNotNull()
        return df.filter(cond)

    return _apply


def dedup_keep_first(keys: list[str], order_by: list[Column]) -> Op:
    """Deterministic keep-first dedup: row_number over keys ordered by
    explicit tiebreakers, keep row 1. One shuffle, same as
    dropDuplicates, but reproducible under any partitioning."""

    def _apply(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy(*order_by)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    return _apply


def join_dims(
    dims: list[tuple[DataFrame, list[str] | Column]],
    how: str = "inner",
    broadcast_dims: bool = True,
) -> Op:
    """Chain joins against dimension tables, broadcasting each dim.

    At 100 TB the fact side never moves for broadcast joins — each
    executor streams its fact partitions against the replicated dim.
    """

    def _apply(df: DataFrame) -> DataFrame:
        out = df
        for dim, on in dims:
            side = F.broadcast(dim) if broadcast_dims else dim
            out = out.join(side, on=on, how=how)
        return out

    return _apply


def semi_join(other: DataFrame, on: list[str] | Column) -> Op:
    def _apply(df: DataFrame) -> DataFrame:
        return df.join(other, on=on, how="left_semi")

    return _apply


def anti_join(other: DataFrame, on: list[str] | Column) -> Op:
    def _apply(df: DataFrame) -> DataFrame:
        return df.join(other, on=on, how="left_anti")

    return _apply
