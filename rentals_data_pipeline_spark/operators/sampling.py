"""Deterministic sampling and dataset splitting.

Training-data pipelines need *repeatable* sampling: the same document
must land in the same split on every run, every engine, and every
partitioning — otherwise train/val contamination silently shifts
between runs. ``F.rand(seed)`` cannot give that guarantee (it is seeded
per-partition, so a repartition reshuffles every assignment); a content
hash can.

The bucket function is the first 8 hex digits of ``md5(seed || key)``
parsed as an integer — md5 because it is the one hash both Spark and
ANSI-SQL engines share (the same reasoning as the fingerprint family,
operators/text.py::fingerprints), which keeps every operator here fully
oracle-pairable. All expressions are JVM built-ins in whole-stage
codegen; the per-row cost is one md5 over a short key, and sampling
predicates sit directly on the scan so pushdown prunes before any
shuffle.

Extension surface (no reference counterpart).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators.topn import global_top_n

Op = Callable[[DataFrame], DataFrame]

N_SPLIT_BUCKETS = 10_000

#: weighted_sample_topk switches from TakeOrdered (driver merges
#: n x n_partitions candidates) to the distributed global_top_n above
#: this sample size — 100k x 1000 partitions already means 100M driver
#: rows, well past any sane driver heap.
LARGE_SAMPLE_N = 100_000


def hash_bucket(key: Column, n_buckets: int, seed: str = "") -> Column:
    """Deterministic uniform bucket in [0, n_buckets): parse the first
    8 hex digits (32 bits) of md5(seed || key) and take them mod
    ``n_buckets``. Independent of partitioning, task retries, and
    engine — DuckDB reproduces it as ('0x' || substr(md5(..), 1, 8))::BIGINT.

    A NULL key yields a NULL bucket (md5 NULL-propagates, identically
    in DuckDB, so oracle parity holds) — callers inherit their own
    NULL semantics: filter predicates DROP the row, when-chains fall
    through to the otherwise branch, and inner equi-joins on the
    bucket lose it (the two-level packing bug class — COALESCE the key
    first, on both engine and oracle sides, when rows must survive)."""
    h = F.md5(F.concat(F.lit(seed), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def deterministic_sample(
    key_col: str, fraction: float, seed: str = ""
) -> Op:
    """Keep rows whose hash bucket (out of ``N_SPLIT_BUCKETS``) falls
    below ``fraction`` — a repeatable Bernoulli-style sample. The
    predicate is a pure row-local expression, so Catalyst pushes it to
    the scan side and the dropped rows never reach a shuffle."""
    cut = int(round(fraction * N_SPLIT_BUCKETS))

    def _apply(df: DataFrame) -> DataFrame:
        return df.where(
            hash_bucket(F.col(key_col), N_SPLIT_BUCKETS, seed) < cut
        )

    return _apply


def train_val_test_split(
    key_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "val", "test"),
    seed: str = "split",
    out_col: str = "split",
) -> Op:
    """Assign each row a split label by hash-bucket thresholds: the
    deterministic, leakage-free version of randomSplit. A given key
    gets the same label on every run and in every engine; growing the
    corpus never moves an existing key between splits."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must have equal length")
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    cuts = []
    acc = 0.0
    for w in weights:
        acc += w
        cuts.append(int(round(acc * N_SPLIT_BUCKETS)))

    def _apply(df: DataFrame) -> DataFrame:
        b = hash_bucket(F.col(key_col), N_SPLIT_BUCKETS, seed)
        # build outward-in so earlier labels win their bucket range
        assign = F.lit(labels[-1])
        for cut, label in zip(cuts[:-1][::-1], labels[:-1][::-1]):
            assign = F.when(b < cut, F.lit(label)).otherwise(assign)
        return df.withColumn(out_col, assign)

    return _apply


def stratified_take(
    strata: list[str], key_col: str, n_per_stratum: int, seed: str = ""
) -> Op:
    """Deterministic reservoir: the ``n_per_stratum`` rows of each
    stratum with the smallest (hash, key) — a stable, engine-independent
    'random' subset per group. Executes as a keyed window with
    WindowGroupLimit (map-side partial top-k before the shuffle), so
    the full stratum never crosses the wire — the scale-safe shape for
    per-class downsampling at 100 TB."""

    def _apply(df: DataFrame) -> DataFrame:
        b = hash_bucket(F.col(key_col), N_SPLIT_BUCKETS, seed)
        w = Window.partitionBy(*strata).orderBy(b.asc(), F.col(key_col).asc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n_per_stratum)
            .drop("__rn")
        )

    return _apply


def weighted_sample_topk(
    key_col: str, weight_col: str, n: int, seed: str = ""
) -> Op:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each row draws u = (hash32+1)/2^32 from its content
    hash and is ranked by ln(u)/weight — the log of the classic
    u^(1/w) key, same order, better conditioning — and the global
    top-``n`` priorities win. Inclusion probability is exactly the
    sequential weighted draw's; determinism comes from the md5-derived
    u (same row → same u on any partitioning, run, or cluster).

    The scale shape is n-dependent: small samples ride TakeOrdered
    (per-partition heap, driver merges n·n_partitions candidates — no
    sort exchange); above ``LARGE_SAMPLE_N`` the driver merge itself
    becomes the hazard (n=1M × 1000 partitions = a billion candidate
    rows on the driver), so the selection routes through
    ``topn.global_top_n`` (distributed range sort + offset filter,
    driver sees only per-partition counts). Same row SET either way —
    the priority order is total ((_pri DESC, key ASC), key unique) —
    but the large-n route returns rows in partition order (sort the
    survivors if ordered output matters) and runs EAGERLY at call
    time (global_top_n checkpoints + counts), where the TakeOrdered
    path stays lazy. Rows with NULL or non-positive weight carry no
    sampling mass and are dropped.

    Oracle-paired in the catalog since round 10: ln() appears only in
    the RANKING key (output columns are hash-exact integers), and the
    selected set can only diverge across engines on ~1-ulp-close
    priorities at the cutoff rank — properties (determinism, weight
    bias, n ≥ rows) are pinned by tests besides.
    """

    def _apply(df: DataFrame) -> DataFrame:
        # full 32-bit parse (not hash_bucket — its int cast can't hold
        # 2^32 bucket values); +1 keeps u in (0, 1] so ln(u) is finite
        h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
        h32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        u = (h32.cast("double") + F.lit(1.0)) / F.lit(float(1 << 32))
        priority = F.log(u) / F.col(weight_col)
        ranked = df.where(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        ).withColumn("_pri", priority)
        order = [F.col("_pri").desc(), F.col(key_col).asc()]
        if n > LARGE_SAMPLE_N:
            return global_top_n(ranked, order, n).drop("_pri")
        return ranked.orderBy(*order).limit(n).drop("_pri")

    return _apply


def temperature_mixture_sample(
    key_col: str,
    group_col: str,
    target_frac: float = 0.3,
    seed: str = "mix",
) -> Op:
    """Temperature-based corpus mixing (the multilingual-training
    rebalancing move, cf. the mT5/XLM-R alpha-sampling recipe, alpha =
    0.5): per-group sampling rates proportional to ``sqrt(n_g) / n_g``
    so over-represented groups are down-sampled and rare groups keep
    (capped at 1.0) nearly all their rows, with the overall expected
    volume pinned at ``target_frac`` of the corpus.

    Determinism discipline: sqrt is correctly rounded IEEE (identical
    in every engine); the per-group weight is rounded to 6 dp via the
    floor formula before the cross-group total, and the total folds
    DECIMAL(28,6) casts of those 6-dp anchors, so the sum is exact and
    order-invariant (the chi-square/PSI precedent). The final rate is
    one chain of IEEE double ops on identical operands, floored into an
    integer bucket cut, and membership is the md5 hash-bucket predicate
    — every engine replays the identical sample.

    Scale shape: the rate table is |groups| rows (a one-shuffle count
    agg), broadcast back onto the corpus; the sampling predicate is
    row-local, so non-sampled rows are dropped at the scan-adjacent
    filter and never reach downstream shuffles.

    Rows whose ``group_col`` is NULL have no defined mixing weight and
    are dropped by the equi-join — filter or impute the group upstream
    if they must be kept.
    """

    def _apply(df: DataFrame) -> DataFrame:
        from rentals_data_pipeline_spark.functions.rounding import (
            round_half_up,
        )

        g = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
        g = g.withColumn(
            "_w6", round_half_up(F.sqrt(F.col("_n").cast("double")), 6)
        )
        tot = g.agg(
            F.sum(F.col("_w6").cast("decimal(28,6)")).alias("_tw"),
            F.sum("_n").alias("_ntot"),
        )
        rates = g.crossJoin(F.broadcast(tot)).select(
            group_col,
            F.floor(
                F.least(
                    F.lit(1.0),
                    F.lit(target_frac)
                    * F.col("_ntot").cast("double")
                    * F.col("_w6")
                    / F.col("_tw").cast("double")
                    / F.col("_n").cast("double"),
                )
                * F.lit(float(N_SPLIT_BUCKETS))
            )
            .cast("int")
            .alias("_cut"),
        )
        return (
            df.join(F.broadcast(rates), group_col)
            .where(
                hash_bucket(F.col(key_col), N_SPLIT_BUCKETS, seed)
                < F.col("_cut")
            )
            .drop("_cut")
        )

    return _apply


def stratified_split(
    key_col: str,
    stratum_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: str = "strat",
    out_col: str = "split",
):
    """EXACT-proportion train/val/test split per stratum: within each
    stratum rows rank by ``md5(seed || key)`` (deterministic,
    engine-reproducible, layout-invariant) and the split boundaries
    are integer thresholds of the stratum size — every stratum lands
    within one row of its target fractions, where the plain hash
    split (`train_val_test_split`) only hits fractions in expectation
    (a 40-row minority class can easily draw 35/2/3). The balanced
    split a classifier's eval set needs. One window shuffle keyed on
    the stratum; thresholds use integer arithmetic ((n*w) div 10), so
    no float boundary exists. Weights must be multiples of 0.1."""
    from pyspark.sql import Window

    w_train = int(round(weights[0] * 10))
    w_val = int(round((weights[0] + weights[1]) * 10))
    if w_train < 1 or w_val > 10:
        raise ValueError("weights must be tenths summing to at most 1")

    def _apply(df: DataFrame) -> DataFrame:
        h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
        rn = F.row_number().over(
            Window.partitionBy(stratum_col).orderBy(h)
        )
        cnt = F.count(F.lit(1)).over(Window.partitionBy(stratum_col))
        ranked = df.select("*", rn.alias("_rn"), cnt.alias("_n"))
        return ranked.select(
            *df.columns,
            F.when(
                F.col("_rn") <= F.expr(f"(_n * {w_train}) div 10"), "train"
            )
            .when(F.col("_rn") <= F.expr(f"(_n * {w_val}) div 10"), "val")
            .otherwise("test")
            .alias(out_col),
        )

    return _apply
