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


def dsir_log_importance(
    target_col: str = "is_target",
    n_buckets: int = 4096,
    ngram: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir",
) -> Op:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169 §3): score every RAW
    document by how much more likely its text is under a hashed-n-gram
    LM of the TARGET slice than under the raw pool's own LM —
    log w(x) = Σ_grams [ln p_target(bucket) - ln p_raw(bucket)] with
    add-1 smoothing over ``n_buckets`` hash buckets. High scores mark
    raw documents that look like the target distribution; feed the
    weights to ``weighted_sample_topk`` for the paper's resampling
    step.

    Input: (id, text, ``target_col`` boolean). Output: one row per RAW
    document with ≥ ``ngram`` tokens — (id, n_grams, log_importance).
    Target rows train the numerator LM and are never scored; rows with
    a NULL flag train neither LM and are not scored (NULL-key rules as
    in ``hash_bucket``). Shorter documents have no n-grams, hence no
    score — the same degenerate-doc absence contract as MinHash.

    Scale shape: n-grams assemble INSIDE the token array (codegen
    transform — ``operators/text.py::ngram_array_expr``, no window);
    bucket
    counts map-side combine to ≤ ``n_buckets`` rows; the per-bucket
    log-ratio table is ≤ ``n_buckets`` rows and BROADCASTS into the
    gram stream, so the only data-sized shuffles are the count
    aggregate and the per-doc rollup. Hashing is ``hash_bucket`` (md5,
    engine-portable); the hash collisions ARE the method — DSIR's
    hashed n-grams trade vocabulary fidelity for a fixed-width model.

    Oracle parity: each bucket's log-ratio is rounded half-up at 8 dp
    and anchored as DECIMAL(28,8) before the per-doc sum — the exact
    ``text_unigram_logprob`` anchor, so the sum is order-invariant and
    engine-exact; the final per-doc score rounds at 4 dp.
    """
    from rentals_data_pipeline_spark.functions.rounding import round_half_up
    from rentals_data_pipeline_spark.operators.text import ngram_array_expr

    gram_expr = ngram_array_expr(ngram, arr="toks")

    def _apply(df: DataFrame) -> DataFrame:
        grams = (
            df.select(
                F.col(id_col),
                F.col(target_col).alias("_tgt"),
                F.split(F.col(text_col), r"\s+").alias("toks"),
            )
            .select(
                id_col,
                "_tgt",
                F.explode(F.expr(gram_expr)).alias("_gram"),
            )
            .select(
                id_col,
                "_tgt",
                hash_bucket(F.col("_gram"), n_buckets, seed).alias("_b"),
            )
        )
        cnt = grams.groupBy("_b").agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_ct"),
            F.sum(F.when(~F.col("_tgt"), 1).otherwise(0)).alias("_cr"),
        )
        tot = cnt.agg(
            F.sum("_ct").alias("_nt"), F.sum("_cr").alias("_nr")
        )
        lr = cnt.crossJoin(F.broadcast(tot)).select(
            "_b",
            round_half_up(
                F.log(
                    (F.col("_ct") + F.lit(1.0))
                    / (F.col("_nt") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("_cr") + F.lit(1.0))
                    / (F.col("_nr") + F.lit(float(n_buckets)))
                ),
                8,
            )
            .cast("decimal(28,8)")
            .alias("_lr8"),
        )
        return (
            grams.where(~F.col("_tgt"))
            .join(F.broadcast(lr), "_b")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_grams"),
                F.sum("_lr8").alias("_s"),
            )
            .select(
                id_col,
                "n_grams",
                round_half_up(
                    F.col("_s").cast("double"), 4
                ).alias("log_importance"),
            )
        )

    return _apply
