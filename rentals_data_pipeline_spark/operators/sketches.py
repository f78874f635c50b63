"""Mergeable distinct-count sketches (DataSketches HLL built-ins).

The 100 TB pattern for COUNT(DISTINCT): exact distinct counting at a
coarser grain cannot reuse finer-grain results (distincts don't add),
so every rollup re-scans the fact table. HLL sketches merge losslessly
— build per-fine-bucket sketches ONCE (one scan, map-side partial
aggregation), persist them, and answer any coarser-grain distinct
question by unioning register arrays (bytes-sized, never a re-scan).
Union-of-sketches equals the sketch-of-union exactly (registers merge
by max), so rolled-up estimates are identical to what a direct sketch
over the raw data would produce — pinned by test.

All JVM built-ins (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``); no Python in the plan. Estimates are
deterministic for given input but engine-specific, so the catalog
query is rows-only checked (no ANSI oracle can reproduce DataSketches
register values); correctness is golden-tested instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 4 KiB registers, ~1.6% relative error


def distinct_sketches(
    df: DataFrame, keys: list[str], col: str, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """One HLL sketch of ``col`` per ``keys`` group — the persistable
    fine-grain aggregate. Map-side partial sketches combine before the
    shuffle, so wire volume is one ~2^lgk-register sketch per
    (task, group), independent of row count."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch")
    )


def rollup_estimates(
    sketches: DataFrame, keys: list[str], out_col: str = "n_distinct_est"
) -> DataFrame:
    """Estimate distinct counts at a coarser grain by unioning the
    stored sketches — no re-scan of the fact data. ``keys`` may be a
    subset of (or derived from) the sketch frame's group columns;
    ``[]`` gives the global rollup."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(out_col)
    if keys:
        return sketches.groupBy(*keys).agg(agg)
    return sketches.agg(agg)
