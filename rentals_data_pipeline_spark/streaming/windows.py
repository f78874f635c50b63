"""Time-window operators: tumbling / sliding / session.

Batch-first (SURVEY §2.10): ``F.window`` / ``F.session_window`` work
identically over a static DataFrame and a stream, so these operators
serve both; the streaming entry points in ``streaming/jobs.py`` reuse
them verbatim with a watermark in front. Batch-mode results are
DuckDB-oracle-checkable (epoch arithmetic), which is where their
correctness is certified.

The reference has no streaming (weekly full-snapshot batch,
dags/rental_pipeline_dag.py:52); this is the engine's extension of the
reference's period-over-period analytics to event-time processing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Op = Callable[[DataFrame], DataFrame]


def _flatten_window(
    grouped: DataFrame, group_by: list[str], out_start: str, out_end: str
) -> DataFrame:
    agg_cols = [c for c in grouped.columns if c != "w" and c not in group_by]
    return grouped.select(
        F.col("w.start").alias(out_start),
        F.col("w.end").alias(out_end),
        *group_by,
        *agg_cols,
    )


def tumbling(
    ts_col: str,
    duration: str,
    group_by: list[str],
    aggs: list[Column],
    out_start: str = "window_start",
    out_end: str = "window_end",
) -> Op:
    """Non-overlapping event-time windows: one row per (group, window).
    Epoch-aligned (Spark aligns windows to the unix epoch in session
    tz; the engine pins UTC)."""

    def _apply(df: DataFrame) -> DataFrame:
        w = F.window(F.col(ts_col), duration)
        grouped = df.groupBy(w.alias("w"), *group_by).agg(*aggs)
        return _flatten_window(grouped, group_by, out_start, out_end)

    return _apply


def sliding(
    ts_col: str,
    duration: str,
    slide: str,
    group_by: list[str],
    aggs: list[Column],
    out_start: str = "window_start",
    out_end: str = "window_end",
) -> Op:
    """Overlapping windows: each event lands in duration/slide windows
    (Spark expands rows before the aggregation — the shuffle carries the
    duplication factor, so keep duration/slide small at scale)."""

    def _apply(df: DataFrame) -> DataFrame:
        w = F.window(F.col(ts_col), duration, slide)
        grouped = df.groupBy(w.alias("w"), *group_by).agg(*aggs)
        return _flatten_window(grouped, group_by, out_start, out_end)

    return _apply


def session(
    ts_col: str,
    gap: str,
    group_by: list[str],
    aggs: list[Column],
    out_start: str = "session_start",
    out_end: str = "session_end",
) -> Op:
    """Session windows: events within ``gap`` of each other merge; the
    window end is last-event + gap (Spark semantics — the oracle must
    mirror max(ts) + gap)."""

    def _apply(df: DataFrame) -> DataFrame:
        w = F.session_window(F.col(ts_col), gap)
        grouped = df.groupBy(w.alias("w"), *group_by).agg(*aggs)
        return _flatten_window(grouped, group_by, out_start, out_end)

    return _apply


def session_dynamic(
    ts_col: str,
    gap_col: Column,
    group_by: list[str],
    aggs: list[Column],
    out_start: str = "session_start",
    out_end: str = "session_end",
) -> Op:
    """Session windows with a PER-EVENT gap expression (Spark's dynamic
    gap duration): each event extends its session to ``ts + gap(event)``,
    and the next event merges if it starts before that running end —
    so a purchase can hold a session open longer than a click.  Same
    batch/stream duality as the static form; the oracle replays the
    merge rule as gaps-and-islands over a running ``MAX(ts + gap)``."""

    def _apply(df: DataFrame) -> DataFrame:
        w = F.session_window(F.col(ts_col), gap_col)
        grouped = df.groupBy(w.alias("w"), *group_by).agg(*aggs)
        return _flatten_window(grouped, group_by, out_start, out_end)

    return _apply
