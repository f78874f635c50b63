"""Runtime shuffle-metrics capture + the scale-free shuffle budgets.

``rentals_data_pipeline_spark.metrics`` reads the driver status store
after a query runs; ``tools/shuffle_audit.py`` turns that into a gate.
These tests pin (a) the capture primitive itself against a workload
whose shuffle volume is analytically known, and (b) the budget gate on
the real catalog queries at sf0.001 — bytes/record and fanout are
scale-free ratios, so certifying them here certifies the discipline at
every larger scale factor (the absolute bytes change; the ratios and
the pass/fail verdicts do not).
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import shuffle_audit  # noqa: E402
from rentals_data_pipeline_spark import metrics as M  # noqa: E402
from rentals_data_pipeline_spark.plans import catalog  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_run_measured_counts_a_known_shuffle(spark):
    """groupBy(id % k).count on range(n): the map side partially
    aggregates, so shuffle records <= partitions * k, and read == write
    (single exchange, fully consumed)."""
    rows, stats = M.run_measured(
        spark,
        lambda: spark.range(100_000).groupBy((F.col("id") % 10).alias("k")).count(),
    )
    assert len(rows) == 10
    assert stats["input_records"] == 100_000  # the range scan's rows
    assert 0 < stats["shuffle_write_records"] <= 4 * 10  # 4 test partitions
    assert stats["shuffle_read_bytes"] == stats["shuffle_write_bytes"]
    assert stats["disk_spill_bytes"] == 0


def test_snapshot_watermark_excludes_prior_work(spark):
    """Work done BEFORE the snapshot must not leak into the diff."""
    spark.range(50_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    mark = M.snapshot(spark)
    assert mark >= 0
    stats = M.since(spark, mark)
    assert stats["stages"] == 0
    assert stats["shuffle_write_bytes"] == 0


def test_shuffle_bytes_per_record_none_when_no_shuffle(spark):
    rows, stats = M.run_measured(spark, lambda: spark.range(100).select("id"))
    assert len(rows) == 100
    assert M.shuffle_bytes_per_record(stats) is None


def test_ngram_dedup_shuffles_digests_not_text(spark):
    """The span-dedup plan's shuffle must carry 16-byte gram digests:
    measured ~25 B/record (post-compression). A regression to hex
    strings doubles it; to raw gram text, ~an order of magnitude."""
    row = shuffle_audit.audit_query(
        spark,
        "text_duplicated_ngram_fraction",
        catalog.QUERIES["text_duplicated_ngram_fraction"],
        SF_DIR,
    )
    assert row["rows"] > 0
    assert row["shuffle_bytes_per_record"] is not None
    assert shuffle_audit.check_budgets(row) == []


def test_minhash_shuffles_one_signature_per_doc(spark):
    """The MinHash plan shuffles exactly one signature record per doc
    (the explode feeds a map-side partial agg): fanout ~1.0. A
    regression to per-gram shuffle records jumps fanout ~50x."""
    row = shuffle_audit.audit_query(
        spark,
        "dedup_minhash_lsh_pairs",
        catalog.QUERIES["dedup_minhash_lsh_pairs"],
        SF_DIR,
    )
    fanout = row["shuffle_fanout"]
    assert fanout is not None and fanout <= 4.0
    assert shuffle_audit.check_budgets(row) == []


def test_star_join_shuffles_only_post_agg_rows(spark):
    """Dims broadcast: the fact side reaches the aggregate without a
    pre-join exchange, so the only shuffled rows are group results."""
    row = shuffle_audit.audit_query(
        spark, "join_star_revenue", catalog.QUERIES["join_star_revenue"], SF_DIR
    )
    assert row["shuffle_write_records"] <= 100  # |nation x priority| groups
    assert shuffle_audit.check_budgets(row) == []


def test_budget_gate_fails_on_violations():
    """check_budgets flags bytes/record, fanout, and spill breaches."""
    bad = {
        "query": "text_duplicated_ngram_fraction",
        "shuffle_bytes_per_record": 500.0,
        # the gate reads the shuffle_fanout audit_query computed, so
        # the printed JSON and the gated value can never disagree
        "shuffle_fanout": 1000.0,
        "disk_spill_bytes": 1,
    }
    failures = shuffle_audit.check_budgets(bad)
    assert len(failures) == 3
    assert any("B/record" in f for f in failures)
    assert any("fanout" in f for f in failures)
    assert any("spilled" in f for f in failures)


def test_budget_gate_ignores_ungated_queries():
    row = {
        "query": "some_future_query",
        "shuffle_bytes_per_record": 10_000.0,
        "shuffle_write_records": 10_000_000,
        "input_records": 1,
        "disk_spill_bytes": 0,
    }
    assert shuffle_audit.check_budgets(row) == []
