"""Unit tests for the round-5 second-batch operators (the catalog
queries themselves are oracle-certified; these pin the operator-level
semantics the oracles can't see: n!=2 n-grams, degenerate winsorize
groups)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators.text import corpus_ngram_topk


def test_corpus_trigrams(spark):
    df = spark.createDataFrame(
        [("a b c a b c",), ("a b c d",)], ["text"]
    )
    out = {
        (r["ngram"], r["n_occurrences"])
        for r in df.transform(corpus_ngram_topk(n=3, k=10)).collect()
    }
    assert ("a b c", 3) in out
    assert ("b c a", 1) in out
    assert ("b c d", 1) in out


def test_corpus_ngrams_short_docs_skipped(spark):
    # Docs shorter than n contribute nothing (slice length clamps to 0).
    df = spark.createDataFrame([("solo",), ("x y",)], ["text"])
    rows = df.transform(corpus_ngram_topk(n=2, k=10)).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [("x y", 1)]


def test_winsorize_bounds_sane(spark):
    # Real query at the smallest SF: clipping must never clip a whole
    # group, and every group must produce a finite winsorized sum.
    from rentals_data_pipeline_spark.plans import relational_queries  # noqa: F401
    from rentals_data_pipeline_spark.plans.catalog import QUERIES
    from tests.conftest import SF_DIR

    out = QUERIES["stats_winsorized_events"](spark, SF_DIR).collect()
    assert all(r["n_clipped"] < r["cnt"] for r in out)
    assert all(r["wins_sum"] is not None for r in out)
