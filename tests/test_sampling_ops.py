"""Deterministic sampling: stability, proportions, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import sampling as SP
from rentals_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_split_stable_under_repartitioning(spark):
    """The property rand(seed) lacks: assignments must not move when
    the data is partitioned differently."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    split = SP.train_val_test_split("doc_id")
    a = {r["doc_id"]: r["split"] for r in docs.transform(split).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in docs.repartition(13).transform(split).collect()
    }
    assert a == b


def test_split_proportions_and_exclusivity(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    counts = dict(
        docs.transform(SP.train_val_test_split("doc_id"))
        .groupBy("split")
        .count()
        .collect()
    )
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / n > 0.7
    assert counts["val"] / n < 0.2 and counts["test"] / n < 0.2


def test_sample_is_subset_and_stable(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    s1 = {r["doc_id"] for r in docs.transform(SP.deterministic_sample("doc_id", 0.2)).collect()}
    s2 = {r["doc_id"] for r in docs.repartition(7).transform(SP.deterministic_sample("doc_id", 0.2)).collect()}
    assert s1 == s2
    # nested fractions: a 10% sample is a subset of the 20% sample
    s_small = {r["doc_id"] for r in docs.transform(SP.deterministic_sample("doc_id", 0.1)).collect()}
    assert s_small <= s1


def test_stratified_take_exact_counts_and_plan(spark):
    events = load_table(spark, SF_DIR, "events").select("event_id", "event_type")
    taken = events.transform(SP.stratified_take(["event_type"], "event_id", 10))
    per = dict(taken.groupBy("event_type").count().collect())
    full = dict(events.groupBy("event_type").count().collect())
    for k, tot in full.items():
        assert per[k] == min(10, tot)
    # map-side partial top-k: WindowGroupLimit appears below the exchange
    plan = taken._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_weighted_sample_properties(spark):
    from rentals_data_pipeline_spark.operators import sampling as SP

    # 200 light rows (w=1) + 200 heavy rows (w=25)
    rows = [(i, 1.0) for i in range(200)] + [(i, 25.0) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "k long, w double")
    pick = lambda d: sorted(  # noqa: E731
        r["k"] for r in d.transform(SP.weighted_sample_topk("k", "w", 60)).collect()
    )
    got = pick(df)
    assert len(got) == 60
    # deterministic under repartitioning
    assert pick(df.repartition(13)) == got
    # heavy rows (25x weight) dominate the sample
    heavy = sum(1 for k in got if k >= 200)
    assert heavy > 45, heavy
    # n >= rows -> everything with positive weight survives
    small = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, None), (4, 2.0)], "k long, w double"
    )
    all_rows = small.transform(SP.weighted_sample_topk("k", "w", 10)).collect()
    assert sorted(r["k"] for r in all_rows) == [1, 4]  # zero/null weight dropped


def test_weighted_sample_large_n_route_identical(spark, monkeypatch):
    """Above LARGE_SAMPLE_N the selection routes through global_top_n
    instead of TakeOrdered — the rows must be IDENTICAL (the priority
    order is total), only the plan shape changes."""
    from rentals_data_pipeline_spark.operators import sampling as SP

    rows = [(i, 1.0 + (i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, w double").repartition(9)
    want = sorted(
        r["k"] for r in df.transform(SP.weighted_sample_topk("k", "w", 80)).collect()
    )
    monkeypatch.setattr(SP, "LARGE_SAMPLE_N", 50)
    large = df.transform(SP.weighted_sample_topk("k", "w", 80))
    assert sorted(r["k"] for r in large.collect()) == want
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan


def test_stratified_split_exact_proportions(spark):
    # Every stratum lands within one row of 80/10/10 — including a
    # tiny 7-row stratum where the expectation-only hash split could
    # draw anything.
    from collections import Counter

    from rentals_data_pipeline_spark.operators.sampling import (
        stratified_split,
    )

    rows = [(i, i % 3) for i in range(100)] + [(1000 + i, 9) for i in range(7)]
    df = spark.createDataFrame(rows, ["vec_id", "label"])
    out = df.transform(stratified_split("vec_id", "label")).collect()
    by_label: dict = {}
    for r in out:
        by_label.setdefault(r["label"], Counter())[r["split"]] += 1
    for label, c in by_label.items():
        n = sum(c.values())
        assert c["train"] == (n * 8) // 10, (label, c)
        assert c["train"] + c["val"] == (n * 9) // 10, (label, c)
    # 7-row stratum: exact integer cuts -> 5 train, 1 val, 1 test
    assert by_label[9] == Counter({"train": 5, "val": 1, "test": 1})


def test_stratified_split_layout_invariant(spark):
    from rentals_data_pipeline_spark.operators.sampling import (
        stratified_split,
    )

    df = spark.createDataFrame(
        [(i, i % 4) for i in range(200)], ["vec_id", "label"]
    )
    a = sorted(map(tuple, df.transform(stratified_split("vec_id", "label")).collect()))
    b = sorted(
        map(
            tuple,
            df.repartition(13)
            .transform(stratified_split("vec_id", "label"))
            .collect(),
        )
    )
    assert a == b


def test_temperature_mixture_downsamples_dominant_group(spark):
    """alpha=0.5 mixing: the dominant group's keep-rate must be LOWER
    than every minority group's, expected volume ~= target_frac, and
    the sample must be layout-invariant (same rows after repartition)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    op = SP.temperature_mixture_sample("doc_id", "lang", 0.3, "mix")
    sample = docs.transform(op)
    n_all = docs.groupBy("lang").count().collect()
    n_kept = dict(
        (r["lang"], r["count"]) for r in sample.groupBy("lang").count().collect()
    )
    rates = {
        r["lang"]: n_kept.get(r["lang"], 0) / r["count"] for r in n_all
    }
    counts = {r["lang"]: r["count"] for r in n_all}
    dominant = max(counts, key=counts.get)
    for lang, rate in rates.items():
        if lang != dominant:
            assert rates[dominant] < rate + 1e-9, (dominant, rates)
    total = docs.count()
    assert abs(sample.count() / total - 0.3) < 0.12  # small-corpus noise
    again = docs.repartition(7, "lang").transform(op)
    a = {r["doc_id"] for r in sample.select("doc_id").collect()}
    b = {r["doc_id"] for r in again.select("doc_id").collect()}
    assert a == b


def test_balanced_labels_exact_counts(spark):
    """Every surviving class has exactly the min class size; survivors
    are stable under repartitioning."""
    from rentals_data_pipeline_spark.plans import sampling_queries  # noqa: F401
    from rentals_data_pipeline_spark.plans.catalog import QUERIES

    out = QUERIES["sample_balanced_labels"](spark, SF_DIR)
    emb = load_table(spark, SF_DIR, "embeddings")
    min_n = min(
        r["count"] for r in emb.groupBy("label").count().collect()
    )
    counts = {r["label"]: r["count"] for r in out.groupBy("label").count().collect()}
    assert set(counts.values()) == {min_n}
    assert len(counts) == emb.select("label").distinct().count()


# ---------------------------------------------------------------------------
# DSIR importance weights (dsir_log_importance)
# ---------------------------------------------------------------------------


def _dsir_corpus(spark):
    # target slice speaks "alpha beta"; raw doc 10 mimics it, raw doc
    # 11 speaks a different language, doc 12 is too short to score,
    # doc 13 has a NULL flag (trains neither LM, never scored)
    return spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta", True),
            (2, "alpha beta gamma alpha beta", True),
            (10, "alpha beta alpha beta", False),
            (11, "zeta eta theta iota kappa", False),
            (12, "alpha", False),
            (13, "alpha beta alpha beta", None),
        ],
        "doc_id long, text string, is_target boolean",
    )


def test_dsir_target_lookalike_scores_higher(spark):
    rows = {
        r.doc_id: r
        for r in _dsir_corpus(spark)
        .transform(SP.dsir_log_importance())
        .collect()
    }
    # only the two scorable raw docs appear: target rows are never
    # scored, the 1-token doc has no bigrams, the NULL-flag row is out
    assert set(rows) == {10, 11}
    assert rows[10].log_importance > rows[11].log_importance
    # the lookalike's buckets are target-heavy -> positive log ratio;
    # the unseen-language doc only hits smoothing mass -> negative
    assert rows[10].log_importance > 0 > rows[11].log_importance
    assert rows[10].n_grams == 3 and rows[11].n_grams == 4


def test_dsir_weights_are_layout_invariant(spark):
    df = _dsir_corpus(spark)
    a = sorted(
        tuple(r)
        for r in df.transform(SP.dsir_log_importance()).collect()
    )
    b = sorted(
        tuple(r)
        for r in df.repartition(7, "doc_id")
        .transform(SP.dsir_log_importance())
        .collect()
    )
    assert a == b


def test_dsir_empty_and_all_target_inputs(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, is_target boolean"
    )
    assert empty.transform(SP.dsir_log_importance()).count() == 0
    all_tgt = spark.createDataFrame(
        [(1, "a b c", True)], "doc_id long, text string, is_target boolean"
    )
    assert all_tgt.transform(SP.dsir_log_importance()).count() == 0
