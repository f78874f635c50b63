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


def lttb_downsample(
    series_keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    n_out: int = 100,
) -> Callable[[DataFrame], DataFrame]:
    """Largest-Triangle-Three-Buckets downsampling per series — the
    dashboard/visualization reduction (Steinarsson 2013) that keeps the
    points carrying the most visual information (peaks, troughs,
    inflections) where uniform sampling flattens them. Input rows are
    (series_keys..., ts, value); output keeps the SAME columns, at most
    ``n_out`` rows per series, every row an ACTUAL input point (LTTB
    never interpolates), endpoints always retained.

    Execution: one ``applyInPandas`` per series group — numpy
    vectorized per bucket, Arrow batch transfer, series sorted inside
    the kernel. At 100 TB the per-series point cardinality is what must fit
    one executor's memory (a series = one group); pre-aggregate to a
    coarser grain first if a single series exceeds that, exactly like
    the flagship's windows-over-daily discipline. Deterministic for a
    given series (ties in triangle area resolve to the first maximal
    index via argmax).
    """
    from pyspark.sql import types as T

    def _lttb(pdf):
        import numpy as np

        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf
        x = pdf[ts_col].astype("int64").to_numpy().astype(np.float64)
        y = pdf[value_col].to_numpy().astype(np.float64)
        # bucket boundaries over the interior points (endpoints fixed)
        bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        keep = [0]
        a = 0
        for i in range(n_out - 2):
            lo, hi = bounds[i], bounds[i + 1]
            nxt_lo, nxt_hi = bounds[i + 1], (
                bounds[i + 2] if i + 2 < len(bounds) else n
            )
            avg_x = x[nxt_lo:nxt_hi].mean()
            avg_y = y[nxt_lo:nxt_hi].mean()
            ax, ay = x[a], y[a]
            area = np.abs(
                (ax - avg_x) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (avg_y - ay)
            )
            a = lo + int(area.argmax())
            keep.append(a)
        keep.append(n - 1)
        return pdf.iloc[keep]

    def _apply(df: DataFrame) -> DataFrame:
        schema = T.StructType(
            [df.schema[k] for k in series_keys]
            + [df.schema[ts_col], df.schema[value_col]]
        )
        proj = df.select(*series_keys, ts_col, value_col)
        return proj.groupBy(*series_keys).applyInPandas(_lttb, schema)

    return _apply
