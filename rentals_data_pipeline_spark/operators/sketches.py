"""Mergeable sketches: HLL distinct counts + fixed-width histograms.

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

The same mergeability pattern for QUANTILES: fixed-width histogram
sketches. Per-fine-bucket (group, bin, cnt) rows are built once
(one scan, map-side combine), merge by summing counts (merge of parts
== histogram of the whole, exactly), and any quantile at any coarser
grain is answered from the merged bins with error bounded by one bin
width — never a re-scan, never a full sort. Unlike KLL/t-digest the
sketch is deterministic, engine-independent integer counting, so the
whole pipeline (binning, merge, quantile selection) is hash-certified
against an ANSI-SQL oracle, not just golden-tested. Bin width should
be a power of two (or otherwise exactly representable) so the
``floor((v - lo) / width)`` arithmetic is IEEE-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def histogram_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` per ``keys`` group as
    sparse (keys..., bin, cnt) rows — the persistable fine-grain
    quantile sketch. Values clamp into the edge bins, NULLs are
    excluded; one groupBy with map-side combine, all codegen."""
    width = (hi - lo) / nbins
    b = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(hists: DataFrame, keys: list[str]) -> DataFrame:
    """Roll histogram sketches up to a coarser grain by summing counts
    per bin — merge of parts equals the histogram of the whole,
    exactly. ``keys`` may be a subset of (or derived from) the sketch
    frame's group columns."""
    agg = F.sum("cnt").alias("cnt")
    if keys:
        return hists.groupBy(*keys, "bin").agg(agg)
    return hists.groupBy("bin").agg(agg)


def histogram_quantiles(
    hists: DataFrame,
    keys: list[str],
    quantiles: dict[str, float],
    lo: float,
    hi: float,
    nbins: int,
    total_col: str = "n_rows",
) -> DataFrame:
    """Per-group quantile estimates from (merged) histogram rows: for
    each named quantile q, the upper edge of the first bin whose
    cumulative count reaches q × total — within one bin width above
    the true quantile, deterministically. A window cumsum over ≤nbins
    rows per group plus one conditional-min agg; no sort of the raw
    data ever happens."""
    width = (hi - lo) / nbins
    wg = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    cum = F.sum("cnt").over(wg.orderBy("bin"))
    total = F.sum("cnt").over(wg)
    staged = hists.select(*keys, "bin", cum.alias("_cum"), total.alias("_total"))
    aggs = [F.max("_total").cast("bigint").alias(total_col)] + [
        (
            F.lit(lo)
            + F.lit(width)
            * (
                F.min(F.when(F.col("_cum") >= F.lit(q) * F.col("_total"), F.col("bin")))
                + F.lit(1)
            )
        ).alias(name)
        for name, q in quantiles.items()
    ]
    if keys:
        return staged.groupBy(*keys).agg(*aggs)
    return staged.agg(*aggs)


def heavy_hitters(
    df: DataFrame, col: str, k: int = 8, candidate_cap: int = 100_000
) -> DataFrame:
    """EXACT φ = 1/k heavy hitters (items with count > n/k) in two
    scans with bounded state — never a full-cardinality groupBy
    shuffle.

    Pass 1 runs Misra-Gries(k) per partition inside one Arrow
    ``mapInPandas`` stage: at most k-1 candidate rows and one row
    count leave each partition. The union of per-partition candidates
    is a guaranteed SUPERSET of the global heavy hitters — if
    count(x) > n/k globally then count_p(x) > n_p/k in at least one
    partition (otherwise summing the per-partition bounds contradicts
    the global count), and Misra-Gries always retains such items.
    Pass 2 exact-counts ONLY the candidates (an ``isin`` filter the
    scan pushes down, then a groupBy whose key space is ≤ (k-1) ×
    partitions, not the column's cardinality) and applies the
    threshold to exact counts — so the result is identical to the
    brute-force GROUP BY ... HAVING count > n/k, which is what the
    oracle replays.

    The candidate list rides the driver (like the IVF centroids):
    bounded by (k-1) × partitions, enforced by ``candidate_cap`` —
    at 1000 executors × k=100 that is ~10⁵ strings, broadcast-sized.
    NULLs never qualify (they are no "item"); they are filtered before
    the sketch.
    """
    import pandas as pd

    if k < 2:
        raise ValueError("k must be >= 2 (phi = 1/k heavy hitters)")
    src = df.where(F.col(col).isNotNull()).select(F.col(col).cast("string"))

    def _mg(batches):
        counts: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            for v, c in pdf.iloc[:, 0].value_counts().items():
                c = int(c)
                n_rows += c
                if v in counts:
                    counts[v] += c
                elif len(counts) < k - 1:
                    counts[v] = c
                else:
                    # decrement-all by the new item's full batch count
                    # (batched Misra-Gries: equivalent to c unit steps)
                    dec = min(c, min(counts.values()))
                    counts = {
                        key: rem for key, cc in counts.items()
                        if (rem := cc - dec) > 0
                    }
                    if c > dec:
                        counts[v] = c - dec
        yield pd.DataFrame(
            {"item": list(counts) + [None], "n_part": [0] * len(counts) + [n_rows]}
        )

    summary = src.mapInPandas(_mg, "item string, n_part long").collect()
    n_total = sum(r["n_part"] for r in summary)
    candidates = list({r["item"] for r in summary if r["item"] is not None})
    if len(candidates) > candidate_cap:
        raise ValueError(
            f"{len(candidates)} candidates exceed candidate_cap="
            f"{candidate_cap}; raise the cap or lower k"
        )
    if not candidates or n_total == 0:
        return (
            df.select(F.col(col).cast("string").alias("item"))
            .limit(0)
            .withColumn("n_occurrences", F.lit(0).cast("bigint"))
        )
    return (
        df.where(F.col(col).cast("string").isin(candidates))
        .groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") > F.lit(n_total) / F.lit(k))
    )


def sliding_estimates(
    sketches: DataFrame,
    order_key: str,
    frame_days: int,
    part_keys: list[str] | None = None,
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Trailing-``frame_days``-CALENDAR-day distinct estimates from
    stored per-day sketches — the rolling COUNT(DISTINCT) that exact
    counting cannot express without re-scanning the fact once PER
    WINDOW POSITION (a trailing-7-day exact distinct over 365 days is
    365 fact scans; this is one scan at sketch-build time plus a pass
    over |days| sketch rows).

    Shape (round 10): contribution fanout, not a window — each day's
    sketch is EXPLODED to the <= ``frame_days`` window-end days it
    contributes to, semi-joined to the observed days (tiny,
    broadcast), then ``hll_union_agg`` per window day. That is an
    equi-shuffle on (part_keys, day), fully parallel — the previous
    ``Window.orderBy`` with no partition moved every sketch row to ONE
    task (Spark's WindowExec single-partition warning), and its
    rows-based frame covered the ``frame_days`` most recent PRESENT
    days, diverging from the calendar-window exact twin on gap days.
    This form matches ``sketch_sliding_distinct_users_exact``'s window
    definition exactly. ``order_key`` must be a day grain (DATE, or a
    ``date_trunc``'d midnight TIMESTAMP — the internal date roundtrip
    is lossless and the output keeps the input type).
    Register-max union == sketch of the union exactly, so the sliding
    estimate equals a direct sketch of each window's raw data.

    NULL ``order_key`` rows carry no window mass and are DROPPED
    (explicit filter below — matching the exact twin, whose fanout
    likewise excludes NULL days; the pre-r10 rows-frame form emitted a
    row for them, an accident of Window null ordering, not a
    contract). ``frame_days`` must be >= 1: Spark's ``sequence()``
    defaults to a DESCENDING step when stop < start, which would
    silently turn a zero/negative frame into future leakage. The
    day-grain precondition is ENFORCED per row (``raise_error`` when
    the date roundtrip is lossy) — an hourly-grain caller migrating
    from the old rows-frame API must fail loudly, not have 24 rows/day
    silently collapsed into wrong windows. NULL ``part_keys`` values
    are real groups (the semi-join matches them null-safely), same as
    the old Window.partitionBy semantics."""
    if frame_days < 1:
        raise ValueError(f"frame_days must be >= 1, got {frame_days}")
    parts = list(part_keys or [])
    key_type = dict(sketches.dtypes)[order_key]
    raw_day = F.col(order_key).cast("date")
    day = F.when(
        raw_day.cast(key_type) == F.col(order_key), raw_day
    ).otherwise(
        F.raise_error(
            F.lit(
                "sliding_estimates: order_key must be day-grain "
                "(DATE or midnight TIMESTAMP)"
            )
        ).cast("date")
    )
    sketches = sketches.where(F.col(order_key).isNotNull())
    fan = sketches.select(
        *parts,
        F.explode(
            F.sequence(day, F.date_add(day, frame_days - 1))
        ).alias("_win_day"),
        "sketch",
    )
    days = sketches.select(*parts, day.alias("_win_day")).distinct()
    cond = F.lit(True)
    for c in [*parts, "_win_day"]:
        # eqNullSafe so NULL-valued part_keys stay real groups
        cond = cond & fan[c].eqNullSafe(days[c])
    return (
        fan.join(F.broadcast(days), cond, "left_semi")
        .groupBy(*parts, "_win_day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(out_col)
        )
        .select(
            *parts,
            F.col("_win_day").cast(key_type).alias(order_key),
            out_col,
        )
    )


def overlap_estimate(
    sketches: DataFrame,
    key_col: str,
    key_a: str,
    key_b: str,
    out_col: str = "n_overlap_est",
) -> DataFrame:
    """Distinct-set INTERSECTION estimate from two stored sketches by
    inclusion-exclusion: |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B).
    HLL unions are exact over registers but cannot intersect directly;
    inclusion-exclusion answers audience-overlap questions (users who
    did BOTH X and Y) from the same persisted per-key sketches, no
    fact re-scan. Error grows as the overlap shrinks relative to the
    union (the standard caveat) — golden-tested against exact overlap.
    Returns one row: (est_a, est_b, est_union, n_overlap_est)."""
    ab = sketches.where(F.col(key_col).isin(key_a, key_b))
    est = ab.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(F.col(key_col) == key_a, F.col("sketch")))
        ).alias("est_a"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(F.col(key_col) == key_b, F.col("sketch")))
        ).alias("est_b"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_union"),
    )
    return est.withColumn(
        out_col,
        F.greatest(
            F.lit(0).cast("long"),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ),
    )
