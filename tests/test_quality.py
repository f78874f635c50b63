"""DQ framework tests: reference boundary semantics
(tests/test_data_quality.py:39-153) on the generic (id, region, rent)
fixture, executed via the single-pass agg runner."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import quality as Q


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "region", "rent"])


def _base_rows(n=20):
    return [(i, f"r{i % 4}", 1000.0 + i) for i in range(n)]


def test_null_percentage_boundaries(spark):
    rows = _base_rows(19) + [(99, "rx", None)]  # 1/20 = 5% nulls
    ok = Q.run_quality_checks(_df(spark, rows), [Q.null_percentage_check("rent", 0.10)])
    assert ok["passed"] == 1

    rows = _base_rows(17) + [(97, "a", None), (98, "b", None), (99, "c", None)]  # 15%
    with pytest.raises(Q.DataQualityError, match="null_percentage_rent"):
        Q.run_quality_checks(_df(spark, rows), [Q.null_percentage_check("rent", 0.10)])


def test_null_check_empty_df_passes(spark):
    df = _df(spark, _base_rows(1)).filter("id < 0")
    ok = Q.run_quality_checks(df, [Q.null_percentage_check("rent", 0.10)])
    assert ok["passed"] == 1


def test_row_count(spark):
    assert (
        Q.run_quality_checks(_df(spark, _base_rows(20)), [Q.row_count_check(10)])[
            "passed"
        ]
        == 1
    )
    with pytest.raises(Q.DataQualityError):
        Q.run_quality_checks(_df(spark, _base_rows(5)), [Q.row_count_check(10)])


def test_range_inclusive_bounds_and_nulls_pass(spark):
    rows = [(1, "a", 0.0), (2, "b", 50000.0), (3, "c", None)]
    ok = Q.run_quality_checks(_df(spark, rows), [Q.range_check("rent", 0, 50000)])
    assert ok["passed"] == 1
    for bad in (-100.0, 50001.0):
        with pytest.raises(Q.DataQualityError, match="range_rent"):
            Q.run_quality_checks(
                _df(spark, [(1, "a", bad)]), [Q.range_check("rent", 0, 50000)]
            )


def test_uniqueness_warns_without_raising(spark):
    rows = [(1, "a", 1.0), (1, "b", 2.0), (2, "c", 3.0)]
    res = Q.run_quality_checks(_df(spark, rows), [Q.uniqueness_check(["id"])])
    assert res["warnings"] == 1 and res["failed"] == 0


def test_runner_no_short_circuit_and_tally(spark):
    df = _df(spark, _base_rows(5))
    checks = [
        Q.row_count_check(10),  # fails
        Q.range_check("rent", 0, 50000),  # passes — must still run
        Q.uniqueness_check(["id"]),  # passes
    ]
    with pytest.raises(Q.DataQualityError, match="1 DQ check"):
        Q.run_quality_checks(df, checks)


def test_custom_check_fn_escape_hatch(spark):
    df = _df(spark, _base_rows(5))
    custom = Q.DataQualityCheck(
        name="has_region_r0",
        check_fn=lambda d: d.filter("region = 'r0'").count() > 0,
    )
    assert Q.run_quality_checks(df, [custom])["passed"] == 1


def test_profile_table_single_pass_stats(spark):
    from rentals_data_pipeline_spark.operators.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (2, None, 30.0)],
        "k long, s string, v double",
    )
    prof = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "v"}
    k = prof["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (3, 0, 2)
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    assert abs(k["mean_num"] - 1.6667) < 1e-9
    s = prof["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    v = prof["v"]
    assert (v["n_nulls"], v["min_num"], v["max_num"]) == (1, 10.0, 30.0)
    # approx path keeps the same shape (estimates, not certified values)
    approx = {
        r["col_name"]: r
        for r in profile_table(df, exact_distinct=False).collect()
    }
    assert approx["k"]["n_distinct"] > 0


def test_profile_approx_twin_agrees_with_exact(spark):
    """r12: the 100 TB profile mode (profile_orders_columns_approx,
    exact_distinct=False) must agree with the oracle-certified exact
    twin on EVERY statistic except n_distinct, and its HLL n_distinct
    must land within the default-rsd error band of the exact count —
    the twin-certification contract the rows-only rationale cites."""
    from rentals_data_pipeline_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {
        r["col_name"]: r
        for r in QUERIES["profile_orders_columns"](spark, sf).collect()
    }
    approx = {
        r["col_name"]: r
        for r in QUERIES["profile_orders_columns_approx"](
            spark, sf
        ).collect()
    }
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c].asDict(), approx[c].asDict()
        nd_e, nd_a = e.pop("n_distinct"), a.pop("n_distinct")
        assert e == a, c  # every non-sketch statistic identical
        # default approx_count_distinct rsd is 0.05; allow 4 sigma
        assert abs(nd_a - nd_e) <= max(4, 0.2 * nd_e), (c, nd_e, nd_a)


def test_profile_table_skips_probe_on_derived_input(spark):
    """r12 (ADVICE): the partition-count probe must not run on a plan
    with upstream exchanges — under AQE, toRdd() would EXECUTE those
    shuffle stages just to read a partition count — and must not touch
    a streaming frame at all (plan construction used to fail)."""
    from pyspark.sql.functions import broadcast

    from rentals_data_pipeline_spark.functions.widen import (
        plan_has_shuffle,
        widen_if_narrow,
    )
    from rentals_data_pipeline_spark.operators.quality import profile_table

    base = spark.createDataFrame(
        [(i % 5, float(i)) for i in range(50)], "k long, v double"
    )
    derived = base.groupBy("k").agg(F.sum("v").alias("v"))
    # the guard must actually SEE the shuffle (r12 review: checked on
    # sparkPlan it never fired — EnsureRequirements only inserts
    # exchanges into executedPlan) and leave the derived plan alone
    assert plan_has_shuffle(derived)
    assert not plan_has_shuffle(base)
    assert widen_if_narrow(derived) is derived
    # a broadcast-only join is NOT a shuffle: it sets no downstream
    # partitioning, so the widen must still be allowed to fire there
    dim = spark.createDataFrame([(0, "a"), (1, "b")], "k long, tag string")
    joined = base.join(broadcast(dim), "k")
    assert not plan_has_shuffle(joined)
    # r13 (r12 ADVICE): a round-robin exchange (repartition()/REBALANCE)
    # is a real shuffle for the probe-cost purpose — toRdd() would
    # execute it — and it already sets the input's parallelism
    rp = base.repartition(8)
    assert plan_has_shuffle(rp)
    assert widen_if_narrow(rp) is rp
    # exchange-bearing input: profiles correctly, no widen repartition
    prof = {r["col_name"]: r for r in profile_table(derived).collect()}
    assert prof["k"]["n_distinct"] == 5
    # streaming frame: plan must CONSTRUCT (the old unconditional
    # toRdd() probe raised at construction time)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    agg = profile_table(stream.select(F.col("value").alias("k")))
    assert agg.isStreaming


def test_ks_drift_single_period_group_is_null_not_inf(spark):
    """Round-6 ADVICE: a group whose rows all fall in ONE period has a
    zero denominator on the other side — the nullif guard must yield
    NULL (no two-sample statistic), never Inf/NaN, and must match the
    DuckDB oracle's NULLIF behavior."""
    import math

    from rentals_data_pipeline_spark.operators.quality import ks_drift

    rows = [("only_ref", 0, v) for v in [1.0, 2.0, 3.0]] + [
        ("both", 0, 1.0),
        ("both", 1, 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, period int, value double")
    out = {r["g"]: r for r in ks_drift(df, "g", "period", "value").collect()}
    assert out["only_ref"]["ks_d"] is None
    assert out["only_ref"]["n_cur"] == 0
    d = out["both"]["ks_d"]
    assert d is not None and math.isfinite(d) and d == 1.0


def test_mann_whitney_hand_computed(spark):
    """Textbook example computed by hand: ref = [1, 2, 3], cur = [2, 4].
    Pooled avg ranks: 1 -> 1, the tied 2s -> 2.5 each, 3 -> 4, 4 -> 5;
    R_ref = 1 + 2.5 + 4 = 7.5, U_ref = 7.5 - 3*4/2 = 1.5.  Tie term
    T = 2^3 - 2 = 6, sigma = sqrt((3*2/12) * (6 - 6/20)), z = (1.5 - 3)
    / sigma.  Also pins the degenerate guards: an all-tied group and a
    one-period group yield NULL z (never Inf or an ANSI error)."""
    import math

    from rentals_data_pipeline_spark.operators.quality import (
        mann_whitney_drift,
    )

    rows = (
        [("g", 0, v) for v in [1.0, 2.0, 3.0]]
        + [("g", 1, v) for v in [2.0, 4.0]]
        + [("tied", 0, 7.0), ("tied", 0, 7.0), ("tied", 1, 7.0)]
        + [("only_ref", 0, 1.0), ("only_ref", 0, 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, period int, value double")
    out = {
        r["g"]: r
        for r in mann_whitney_drift(df, "g", "period", "value").collect()
    }
    g = out["g"]
    assert (g["n_ref"], g["n_cur"]) == (3, 2)
    assert g["u_stat"] == 1.5
    sigma = math.sqrt((3 * 2 / 12.0) * (6.0 - 6.0 / 20.0))
    expect_z = math.floor((1.5 - 3.0) / sigma * 1e6 + 0.5) / 1e6
    assert g["z_score"] == expect_z
    # all values tied: sigma = 0 -> NULL z, but U is still defined
    t = out["tied"]
    assert t["z_score"] is None
    assert t["u_stat"] == 2 * 2.0 - 2 * 3 / 2.0  # both ref ranks avg 2.0
    # one-period group: n1*n2 = 0 -> sigma 0 -> NULL z
    assert out["only_ref"]["z_score"] is None
    assert out["only_ref"]["n_cur"] == 0


def test_gini_concentration_hand_computed(spark):
    """Hand examples: values [1, 1, 2] give G = (2*(1+2+6) - 4*4)
    / (3*4) = 1/6; a perfectly equal group gives exactly 0; an all-zero
    group has no defined concentration -> NULL (nullif, not an ANSI
    divide-by-zero)."""
    from decimal import Decimal

    from rentals_data_pipeline_spark.operators.quality import (
        gini_concentration,
    )

    rows = (
        [("s", "a", Decimal("1.00")), ("s", "b", Decimal("1.00")),
         ("s", "c", Decimal("2.00"))]
        + [("eq", "a", Decimal("5.00")), ("eq", "b", Decimal("5.00"))]
        + [("zero", "a", Decimal("0.00")), ("zero", "b", Decimal("0.00"))]
    )
    df = spark.createDataFrame(
        rows, "g string, id string, x decimal(20,2)"
    )
    out = {
        r["g"]: r for r in gini_concentration(df, "g", "x", "id").collect()
    }
    import math

    assert out["s"]["n_entities"] == 3
    assert out["s"]["total_value"] == 4.0
    assert out["s"]["gini"] == math.floor(1 / 6 * 1e6 + 0.5) / 1e6
    assert out["eq"]["gini"] == 0.0
    assert out["zero"]["gini"] is None


def test_spearman_hand_computed(spark):
    """Hand example: x = [1, 2, 3, 4], y = [1, 3, 2, 4] -> rank
    displacement d = (0, 1, -1, 0), no ties, rho = 1 - 6*sum(d^2)
    / (n(n^2-1)) = 1 - 12/60 = 0.8.  A perfectly monotone group is
    exactly 1.0; a constant-y group has zero variance -> NULL (nullif,
    not an ANSI divide error); tie handling pinned by the catalog
    oracle against pandas' average-rank Spearman."""
    from rentals_data_pipeline_spark.operators.quality import (
        spearman_rank_correlation,
    )

    rows = (
        [("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 3.0, 2.0), ("g", 4.0, 4.0)]
        + [("mono", float(i), float(10 + i)) for i in range(1, 4)]
        + [("const", 1.0, 5.0), ("const", 2.0, 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r["g"]: r
        for r in spearman_rank_correlation(df, "g", "x", "y").collect()
    }
    assert out["g"]["n_events"] == 4
    assert out["g"]["spearman_rho"] == 0.8
    assert out["mono"]["spearman_rho"] == 1.0
    assert out["const"]["spearman_rho"] is None


def test_mad_outliers_hand_computed(spark):
    """Hand example: values [1..7, 100] -> lower median 4 (n=8, half
    mass at rank 4), deviations [3,2,1,0,1,2,3,96] -> sorted
    [0,1,1,2,2,3,3,96], lower MAD = 2; only 100 has modified z
    0.6745*96/2 = 32.4 > 3.5.  A constant group has MAD 0 and zero
    outliers (multiplicative test: 0.6745*0 > 0 is false)."""
    from rentals_data_pipeline_spark.operators.quality import mad_outliers

    rows = [("g", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 100]] + [
        ("const", 5.0) for _ in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {r["g"]: r for r in mad_outliers(df, "g", "value").collect()}
    g = out["g"]
    assert (g["n_events"], g["med_value"], g["mad_value"]) == (8, 4.0, 2.0)
    assert g["n_outliers"] == 1
    c = out["const"]
    assert (c["mad_value"], c["n_outliers"]) == (0.0, 0)
