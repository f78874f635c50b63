"""Incremental aggregate maintenance: update a stored per-group
aggregate from a CDC delta instead of recomputing over the full fact
table.

This is the downstream half of the CDC story started by
``operators/relational.py::snapshot_diff`` (reference parity: the
reference recomputes its analytics tables from scratch on every weekly
run — ``jobs/transform.py`` / ``dags/rental_pipeline_dag.py:103-140``;
at 100 TB a full recompute is exactly what you cannot afford, so the
engine extension maintains SUM/COUNT-class aggregates from the delta).

Scale shape: the merge unions the stored aggregate (|groups| rows) with
signed delta contributions (|delta| rows) and re-aggregates — one
shuffle sized |groups| + |delta|, never |fact|.  All measures are summed
as ``decimal(38,6)`` so the incremental path is bit-identical to a full
recompute regardless of summation order (fp addition is not
associative; decimal addition is), which is what makes "incremental ==
full recompute" a testable exact invariant rather than an approximate
one.

Only distributive/algebraic aggregates (COUNT, SUM, and anything
derivable from them: AVG = SUM/COUNT) can be maintained this way;
holistic aggregates (MEDIAN, exact DISTINCT) need their own sketch
(see operators/sketches.py for the mergeable HLL/histogram path).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def aggregate_snapshot(
    keys: list[str], measures: list[str], count_col: str = "cnt"
) -> Callable[[DataFrame], DataFrame]:
    """Build the maintainable base aggregate for a fact snapshot:
    ``keys..., cnt, sum_<m>...`` with decimal-exact sums (order
    invariant, so a stored aggregate and any incremental update of it
    can be compared for exact equality)."""

    def _apply(df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(count_col)] + [
            F.sum(F.col(m).cast(_DEC)).alias(f"sum_{m}") for m in measures
        ]
        return df.groupBy(*keys).agg(*aggs)

    return _apply


def incremental_agg_update(
    base_agg: DataFrame,
    removed: DataFrame,
    added: DataFrame,
    keys: list[str],
    measures: list[str],
    count_col: str = "cnt",
) -> DataFrame:
    """Merge a stored aggregate with a CDC delta.

    ``removed`` carries the OLD version of rows leaving the snapshot
    (``deleted`` keys plus the pre-image of ``changed`` keys);
    ``added`` carries the NEW version of rows entering it (``inserted``
    keys plus the post-image of ``changed`` keys).  Each delta row
    contributes a signed (count, sums...) record; one re-aggregation
    folds them into the base.  Groups whose count reaches zero are
    dropped (the group no longer exists in the new snapshot).

    Decimal sums make the result exactly equal to
    ``aggregate_snapshot`` over the new snapshot — the invariant the
    ``cdc_incremental_agg_orders`` oracle certifies.
    """

    def signed(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            *keys,
            F.lit(sign).cast("long").alias(count_col),
            *[
                (F.lit(sign) * F.col(m).cast(_DEC)).alias(f"sum_{m}")
                for m in measures
            ],
        )

    sum_cols = [f"sum_{m}" for m in measures]
    base = base_agg.select(*keys, count_col, *sum_cols)
    merged = (
        base.unionByName(signed(added, 1))
        .unionByName(signed(removed, -1))
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(c).cast(_DEC).alias(c) for c in sum_cols],
        )
        .where(F.col(count_col) > 0)
    )
    return merged
