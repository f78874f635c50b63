"""Window analytics: the reference's analytical core, generalized.

Parity targets:
- ``lag``-based period-over-period % change (reference:
  jobs/transform.py:122-140 — null for the first period per partition,
  ``round(((x - prev)/prev)*100, 2)``).
- ``rank`` per group with ties sharing rank and gaps (reference:
  jobs/transform.py:143-158 — highest value = rank 1).

Extensions (zero-cost under the same Window API): lead, dense_rank,
row_number, rolling-frame means, cumulative sums, top-k per group.

Scale notes: each distinct ``(partitionBy, orderBy)`` spec is one
shuffle + sort. Chaining specs that share a partitioning reuses the
exchange (Catalyst's EnsureRequirements), so prefer grouping window
computations by spec. A window over a hot key (one giant partition)
does not parallelize — pre-aggregate first (as the flagship query does:
window over the *aggregated* series, not raw events).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.functions.rounding import round_half_up

Op = Callable[[DataFrame], DataFrame]


def pct_change(
    value_col: str,
    partition_by: list[str],
    order_by: str,
    out_col: str = "pct_change",
    periods: int = 1,
    scale: int = 2,
) -> Op:
    """Period-over-period % change via ``lag``; NULL for the first row
    of each partition and for a zero/NULL previous value (``nullif``
    guard — divide-by-zero must agree with the ANSI-SQL oracle)."""

    def _apply(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*partition_by).orderBy(order_by)
        prev = F.lag(F.col(value_col), periods).over(w)
        prev = F.nullif(prev, F.lit(0))
        change = round_half_up((F.col(value_col) - prev) / prev * 100.0, scale)
        return df.withColumn(out_col, change)

    return _apply


def rank_in_group(
    value_col: str,
    partition_by: list[str],
    out_col: str = "rank",
    ascending: bool = False,
    method: str = "rank",
) -> Op:
    """Rank rows within a group. ``method`` ∈ {rank, dense_rank,
    row_number}. Default highest-value-first (reference tie semantics:
    ties share rank, next rank has gaps — jobs/transform.py:146-147)."""
    fns = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}
    fn = fns[method]

    def _apply(df: DataFrame) -> DataFrame:
        key = F.col(value_col).asc() if ascending else F.col(value_col).desc()
        w = Window.partitionBy(*partition_by).orderBy(key)
        return df.withColumn(out_col, fn().over(w))

    return _apply


def rolling(
    value_col: str,
    partition_by: list[str],
    order_by: str,
    agg: Callable[[Column], Column] = F.avg,
    preceding: int = 2,
    following: int = 0,
    out_col: str = "rolling",
    scale: int | None = 2,
) -> Op:
    """Rolling-frame aggregate (e.g. 3-period moving average)."""

    def _apply(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(order_by)
            .rowsBetween(-preceding, following)
        )
        col = agg(F.col(value_col)).over(w)
        if scale is not None:
            col = round_half_up(col, scale)
        return df.withColumn(out_col, col)

    return _apply


def cumulative(
    value_col: str,
    partition_by: list[str],
    order_by: str,
    agg: Callable[[Column], Column] = F.sum,
    out_col: str = "cumulative",
    scale: int | None = 2,
) -> Op:
    """Running aggregate from partition start to current row."""

    def _apply(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*partition_by)
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        col = agg(F.col(value_col)).over(w)
        if scale is not None:
            col = round_half_up(col, scale)
        return df.withColumn(out_col, col)

    return _apply


def top_k_per_group(
    value_col: str,
    partition_by: list[str],
    k: int,
    ascending: bool = False,
    tiebreakers: list[str] | None = None,
) -> Op:
    """Deterministic top-k rows per group: row_number over (value,
    tiebreakers) then filter ≤ k. One shuffle; no global sort."""

    def _apply(df: DataFrame) -> DataFrame:
        key = F.col(value_col).asc() if ascending else F.col(value_col).desc()
        order = [key] + [F.col(c).asc() for c in (tiebreakers or [])]
        w = Window.partitionBy(*partition_by).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    return _apply
