"""Scan-level efficiency contracts: partition pruning, predicate
pushdown, column pruning.

These are the properties that decide whether a 100 TB query reads
100 TB or 1 TB; pinning them in the plan keeps a refactor from
silently turning a pruned scan into a full scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.sources.sink import write_partitioned_parquet

SF_DIR = "/root/testdata/sf0.001"


def _scan_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hive_partition_dirs_are_pruned(spark, tmp_path):
    """A filter on the sink's partition column must become a
    PartitionFilter (dir-level pruning), not a row-level Filter over a
    full scan."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "by_status")
    write_partitioned_parquet(orders, out, ["o_orderstatus"])

    pruned = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = _scan_plan(pruned)
    assert "PartitionFilters" in plan, plan
    # the predicate landed in the partition filters of the scan node
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "o_orderstatus" in pf, plan
    # and the result is still correct
    assert pruned.count() == orders.where("o_orderstatus = 'F'").count()


def test_predicate_pushdown_reaches_parquet(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_quantity") < 5)
        .select("l_orderkey", "l_quantity")
    )
    plan = _scan_plan(li)
    assert "PushedFilters" in plan, plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "l_quantity" in pushed, plan


def test_column_pruning_reaches_parquet(spark):
    """A 2-column projection must produce a 2-column ReadSchema — the
    scan never deserializes untouched columns."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    plan = _scan_plan(li)
    schema_part = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in schema_part and "l_quantity" in schema_part
    assert "l_comment" not in schema_part and "l_extendedprice" not in schema_part


def test_semdedup_persisted_index_probe_is_cluster_pruned(spark, tmp_path):
    """r11: the batch-mode production read path for an incremental
    SemDeDup index — persisted partitioned by cluster_id — must prune
    to the probe batch's hit clusters at the scan, the same contract
    the streaming gate's read_pruned_semdedup_index pins. Probing the
    pruned read returns verdicts identical to the full index."""
    from rentals_data_pipeline_spark.operators.similarity import (
        semdedup_against_index,
        semdedup_assign,
        semdedup_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents, idx = semdedup_index(emb, n_clusters=4, threshold=0.35)
    out = str(tmp_path / "semidx")
    idx.write.partitionBy("cluster_id").parquet(out)

    batch = emb.limit(40)
    assigned = semdedup_assign(batch, cents)
    hits = sorted(
        r["cluster_id"]
        for r in assigned.select("cluster_id").distinct().collect()
    )
    stored = spark.read.parquet(out)
    pruned = stored.where(F.col("cluster_id").isin(hits)).select(
        "vec_id", "vec", "cluster_id", "centroid_sim"
    )
    plan = _scan_plan(pruned)
    assert "PartitionFilters" in plan, plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cluster_id" in pf, plan

    key = lambda df: sorted(  # noqa: E731
        (r.vec_id, r.cluster_id, r.centroid_sim, r.kept)
        for r in df.collect()
    )
    full = stored.select("vec_id", "vec", "cluster_id", "centroid_sim")
    assert key(
        semdedup_against_index(batch, cents, pruned, threshold=0.35)
    ) == key(semdedup_against_index(batch, cents, full, threshold=0.35))


def test_single_scan_queries_read_input_once(spark):
    """Runtime pin of the single-scan claims (r12): the Spearman trend
    cube's exchange must be REUSED by every downstream branch, and the
    drift monitor's conditional aggregation must not re-expand into
    per-half branches — in both cases the table's rows enter a scan
    exactly once (plan-string FileScan counts overcount under reuse,
    so assert on the driver's real input_records)."""
    from rentals_data_pipeline_spark import metrics as M
    from rentals_data_pipeline_spark.plans import catalog
    from rentals_data_pipeline_spark.plans import similarity_queries  # noqa: F401 — registers sim_* in catalog.QUERIES

    from rentals_data_pipeline_spark.plans import dedup_queries  # noqa: F401 — registers dedup_* in catalog.QUERIES

    for name, table in [
        ("stats_spearman_value_trend", "events"),
        ("sim_centroid_drift", "embeddings"),
        ("dedup_cross_source_overlap", "documents"),
        ("quality_mad_anomaly_events", "events"),
    ]:
        from rentals_data_pipeline_spark.sources.tables import load_table

        n_rows = load_table(spark, SF_DIR, table).count()
        _, stats = M.run_measured(
            spark, lambda: catalog.QUERIES[name](spark, SF_DIR)
        )
        assert stats["input_records"] == n_rows, (name, stats)


def test_ccf_scans_events_at_most_once(spark):
    """r13: ts_ccf_click_purchase derives BOTH hourly series from one
    conditional aggregation and localCheckpoints the pivot before the
    lag self-pairing — so the fact scan runs at most once. The
    checkpoint's RDD reads also report input_records (measured), so
    the bound is table rows + the two checkpoint-side reads of the
    <= |hours| pivot; a second FACT scan would add a full table count
    on top and blow through it."""
    from rentals_data_pipeline_spark import metrics as M
    from rentals_data_pipeline_spark.plans import catalog
    from rentals_data_pipeline_spark.plans import timeseries_queries  # noqa: F401
    from rentals_data_pipeline_spark.sources.tables import load_table

    events = load_table(spark, SF_DIR, "events")
    n_rows = events.count()
    p_rows = (
        events.where(
            F.col("value").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .select(F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600"))
        .distinct()
        .count()
    )
    _, stats = M.run_measured(
        spark,
        lambda: catalog.QUERIES["ts_ccf_click_purchase"](spark, SF_DIR),
    )
    assert 0 < stats["input_records"] <= n_rows + 2 * p_rows, (
        stats,
        n_rows,
        p_rows,
    )
