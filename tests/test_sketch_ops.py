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


LO, HI, NBINS = 0.0, 512000.0, 64


def _orders_binned(spark):
    orders = load_table(spark, SF_DIR, "orders")
    return orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
        "o_totalprice",
    )


def test_histogram_merge_of_parts_equals_whole(spark):
    """Summing per-day histogram bins to month must give EXACTLY the
    direct per-month histogram — the property that makes the bins a
    persistable quantile sketch."""
    keyed = _orders_binned(spark)
    daily = SK.histogram_sketch(keyed, ["month", "day"], "o_totalprice", LO, HI, NBINS)
    merged = sorted(
        map(tuple, SK.merge_histograms(daily, ["month"]).collect())
    )
    direct = sorted(
        map(
            tuple,
            SK.histogram_sketch(keyed, ["month"], "o_totalprice", LO, HI, NBINS).collect(),
        )
    )
    assert merged == direct


def test_histogram_quantile_within_one_bin_of_exact(spark):
    """The upper-bin-edge estimate must sit within one bin width above
    the exact percentile (and never below it)."""
    keyed = _orders_binned(spark)
    hist = SK.histogram_sketch(keyed, [], "o_totalprice", LO, HI, NBINS)
    est = SK.histogram_quantiles(
        hist, [], {"p50_est": 0.5, "p99_est": 0.99}, LO, HI, NBINS
    ).collect()[0]
    exact = keyed.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    ).collect()[0]
    width = (HI - LO) / NBINS
    for e, x in ((est["p50_est"], exact["p50"]), (est["p99_est"], exact["p99"])):
        assert x <= e <= x + width, (e, x)


def test_heavy_hitters_exact_vs_brute_force(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from rentals_data_pipeline_spark.operators.sketches import heavy_hitters

    # skewed: two dominant values over a long tail of 30 light ones
    rows = (
        [(0,)] * 300
        + [(1,)] * 120
        + [(v,) for v in range(2, 32) for _ in range(10)]
    )
    df = spark.createDataFrame(rows, "v long").repartition(8)
    k = 10
    got = sorted(
        (r["item"], r["n_occurrences"])
        for r in heavy_hitters(df, "v", k=k).collect()
    )
    n = len(rows)
    brute = sorted(
        (r["item"], r["n"])
        for r in df.groupBy(F.col("v").cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > n / k)
        .collect()
    )
    assert got == brute and len(got) > 0
    # NULLs are not items; empty frame yields empty result
    nulls = spark.createDataFrame([(None,), (None,)], "v string")
    assert heavy_hitters(nulls, "v", k=4).count() == 0
    with _pytest.raises(ValueError):
        heavy_hitters(df, "v", k=1)


def test_sliding_estimates_guards(spark):
    # round-10 review findings: frame_days < 1 must fail loudly
    # (Spark sequence() would silently build a DESCENDING window =
    # future leakage), and NULL order-key rows carry no window mass
    # (matching the exact twin's fanout, which drops them too).
    import pytest as _pytest
    from pyspark.sql import functions as F
    from rentals_data_pipeline_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2), (None, 3)],
        "day string, user_id int",
    ).select(F.col("day").cast("date").alias("day"), "user_id")
    daily = SK.distinct_sketches(df, ["day"], "user_id")
    with _pytest.raises(ValueError, match="frame_days"):
        SK.sliding_estimates(daily, "day", frame_days=0)
    rows = SK.sliding_estimates(daily, "day", frame_days=7).collect()
    days = {r["day"] for r in rows}
    assert None not in days and len(rows) == 2
    est = {str(r["day"]): r["n_distinct_est"] for r in rows}
    assert est["2024-01-01"] == 1 and est["2024-01-02"] == 2
    # NULL part_keys are real groups (null-safe semi join), matching
    # the old Window.partitionBy semantics (second r10 review pass)
    gdf = spark.createDataFrame(
        [("a", "2024-01-01", 1), (None, "2024-01-01", 2),
         (None, "2024-01-02", 3)],
        "grp string, day string, user_id int",
    ).select("grp", F.col("day").cast("date").alias("day"), "user_id")
    gd = SK.distinct_sketches(gdf, ["grp", "day"], "user_id")
    grows = SK.sliding_estimates(
        gd, "day", frame_days=7, part_keys=["grp"]
    ).collect()
    got = {(r["grp"], str(r["day"])): r["n_distinct_est"] for r in grows}
    assert got == {("a", "2024-01-01"): 1, (None, "2024-01-01"): 1,
                   (None, "2024-01-02"): 2}
    # sub-day grain must fail loudly, never silently collapse to dates
    hourly = spark.createDataFrame(
        [("2024-01-01 05:00:00", 1)], "ts string, user_id int"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    hd = SK.distinct_sketches(hourly, ["ts"], "user_id")
    with _pytest.raises(Exception, match="day-grain"):
        SK.sliding_estimates(hd, "ts", frame_days=7).collect()


def test_sliding_estimates_accuracy(spark):
    # Trailing-7-day HLL union vs exact per-window distincts at
    # sf0.001: every day's estimate within the lgk=12 error band.
    from rentals_data_pipeline_spark.operators import sketches as SK
    from rentals_data_pipeline_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    daily = SK.distinct_sketches(events, ["day"], "user_id")
    est = {
        r["day"]: r["n_distinct_est"]
        for r in SK.sliding_estimates(daily, "day", frame_days=7).collect()
    }
    days = sorted(est)
    rows = events.select("day", "user_id").distinct().collect()
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    for d in days:
        # trailing 7 CALENDAR days (the round-10 window definition,
        # matching the exact oracle twin), not 7 most recent rows
        window = [x for x in days if 0 <= (d - x).days <= 6]
        exact = len(set().union(*(by_day[x] for x in window)))
        assert abs(est[d] - exact) <= max(3, 0.05 * exact), (d, est[d], exact)


def test_overlap_estimate_accuracy(spark):
    # Inclusion-exclusion overlap vs exact |view ∩ purchase| users at
    # sf0.001 — overlap here is a large fraction of the union, the
    # regime where inclusion-exclusion is reliable.
    from rentals_data_pipeline_spark.operators import sketches as SK
    from rentals_data_pipeline_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    events = load_table(spark, SF_DIR, "events")
    per_type = SK.distinct_sketches(events, ["event_type"], "user_id")
    row = SK.overlap_estimate(
        per_type, "event_type", "view", "purchase"
    ).collect()[0]
    users = lambda t: {  # noqa: E731
        r["user_id"]
        for r in events.where(F.col("event_type") == t)
        .select("user_id")
        .distinct()
        .collect()
    }
    exact = len(users("view") & users("purchase"))
    assert abs(row["n_overlap_est"] - exact) <= max(5, 0.1 * exact), (
        row,
        exact,
    )


def test_exact_twins_agree_with_direct_computation(spark):
    """Round-9 graduation queries: the exact rollup/sliding twins must
    equal a direct (unoptimized) computation on a small corpus, the
    'total' row must count the union of all days, and the sliding
    plan must contain NO nested-loop join (the fanout shape exists
    precisely to avoid the non-equi BNLJ)."""
    import datetime as dt

    import __spark_entry__ as E

    rows = []
    base = dt.datetime(2024, 1, 1)
    # users 0..9 on day d iff (u + d) % 3 == 0, 10 days
    for d in range(10):
        for u in range(10):
            if (u + d) % 3 == 0:
                rows.append((d * 100 + u, u, "view", 1.0,
                             base + dt.timedelta(days=d, hours=u)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "value double, ts timestamp"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        got_roll = {
            r["day_key"]: r["n_distinct"]
            for r in E.queries()["sketch_distinct_users_rollup_exact"](
                spark, tmp
            ).collect()
        }
        sliding_df = E.queries()["sketch_sliding_distinct_users_exact"](
            spark, tmp
        )
        assert "BroadcastNestedLoopJoin" not in sliding_df._jdf \
            .queryExecution().executedPlan().toString()
        got_slide = {
            r["day"].isoformat(): r["n_distinct_7d"]
            for r in sliding_df.collect()
        }
    by_day: dict = {}
    for d in range(10):
        day = (base + dt.timedelta(days=d)).date()
        by_day[day] = {u for u in range(10) if (u + d) % 3 == 0}
    for day, users in by_day.items():
        assert got_roll[day.isoformat()] == len(users)
    assert got_roll["total"] == len(set().union(*by_day.values()))
    assert len(got_roll) == 11
    for d in range(10):
        day = (base + dt.timedelta(days=d)).date()
        want = set()
        for back in range(7):
            prev = day - dt.timedelta(days=back)
            want |= by_day.get(prev, set())
        assert got_slide[day.isoformat()] == len(want), (day, want)
    assert len(got_slide) == 10
