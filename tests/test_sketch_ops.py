"""HLL sketch operators: mergeability (the whole point) + accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import sketches as SK
from rentals_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events_with_day(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )


def test_union_of_sketches_equals_sketch_of_union(spark):
    """Rolling up stored per-day sketches must give EXACTLY the same
    estimate as sketching the raw data directly — registers merge by
    max, losing nothing. This is what makes the sketches persistable."""
    ev = _events_with_day(spark)
    daily = SK.distinct_sketches(ev, ["day"], "user_id")
    rolled = SK.rollup_estimates(daily, []).collect()[0]["n_distinct_est"]
    direct = SK.rollup_estimates(
        SK.distinct_sketches(ev, [], "user_id"), []
    ).collect()[0]["n_distinct_est"]
    assert rolled == direct


def test_estimate_accuracy_vs_exact(spark):
    """lgk=12 → ~1.6% standard error; assert within 5%."""
    ev = _events_with_day(spark)
    exact = ev.select("user_id").distinct().count()
    est = SK.rollup_estimates(
        SK.distinct_sketches(ev, [], "user_id"), []
    ).collect()[0]["n_distinct_est"]
    assert abs(est - exact) / exact < 0.05


def test_per_group_estimates_accurate(spark):
    ev = _events_with_day(spark)
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy("day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["day"]: r["n_distinct_est"]
        for r in SK.rollup_estimates(
            SK.distinct_sketches(ev, ["day"], "user_id"), ["day"]
        ).collect()
    }
    assert set(est) == set(exact)
    for day, n in exact.items():
        assert abs(est[day] - n) / max(n, 1) < 0.05, (day, n, est[day])
