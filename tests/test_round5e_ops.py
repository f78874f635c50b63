"""Round-5 sixth-batch operators: linear gap interpolation, corpus
mixture sampling edge shapes, Gopher rule conjunction (golden data)."""

from __future__ import annotations

import datetime as dt

import pandas as pd  # module level: pandas_udf hint strings resolve here
import pytest
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.plans import relational_queries  # noqa: F401
from rentals_data_pipeline_spark.plans import similarity_queries  # noqa: F401
from rentals_data_pipeline_spark.plans import timeseries_queries  # noqa: F401
from rentals_data_pipeline_spark.plans.catalog import QUERIES


def test_interpolate_linear_golden(spark, tmp_path):
    """A planted 5-hour series with a 3-hour hole: interior hours take
    the exact linear ramp, and the locf/nocb edge rules hold."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (ts, value): anchors at hour 0 (sum 10.0) and hour 4 (sum 30.0)
        (t0, 10.0, "a"),
        (t0 + dt.timedelta(hours=4), 30.0, "a"),
        # second type: single anchor at hour 2 -> every gap carries it
        (t0 + dt.timedelta(hours=2), 7.0, "b"),
    ]
    df = spark.createDataFrame(
        [(i, ts, 1, ty, v, None) for i, (ts, v, ty) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    # point load_table at the golden dir by writing the expected layout
    got = {
        (r["event_type"], r["hour"].hour): (
            r["value_filled"],
            r["was_gap"],
        )
        for r in QUERIES["ts_interpolate_linear"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[("a", 0)] == (10.0, False)
    assert got[("a", 1)] == (pytest.approx(15.0), True)
    assert got[("a", 2)] == (pytest.approx(20.0), True)
    assert got[("a", 3)] == (pytest.approx(25.0), True)
    assert got[("a", 4)] == (30.0, False)
    # type b: hours 0-1 take nocb, hours 3-4 take locf of the lone anchor
    for h in (0, 1, 3, 4):
        assert got[("b", h)] == (7.0, True)
    assert got[("b", 2)] == (7.0, False)


def test_ks_drift_golden(spark):
    """KS D on a hand-computed pair of samples: ref {1,2,3,4}, cur
    {3,4,5,6} -> ECDF gap peaks at value 2 with D = 0.5; identical
    samples -> D = 0."""
    from rentals_data_pipeline_spark.operators.quality import ks_drift

    rows = [("g", 0, v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("g", 1, v) for v in [3.0, 4.0, 5.0, 6.0]
    ]
    rows += [("h", p, v) for p in (0, 1) for v in [1.0, 2.0, 3.0]]
    df = spark.createDataFrame(rows, ["grp", "period", "value"])
    got = {
        r["grp"]: (r["ks_d"], r["n_ref"], r["n_cur"])
        for r in ks_drift(df, "grp", "period", "value").collect()
    }
    assert got["g"] == (0.5, 4, 4)
    assert got["h"] == (0.0, 3, 3)


def test_rolling_autocorr_bounds_and_perfect_line(spark, tmp_path):
    """A strictly increasing series has lag-1 autocorrelation ~1 over
    any frame; catalog output stays within [-1, 1]."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "lin", float(i + 1), None)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["window_rolling_autocorr"](spark, str(tmp_path)).collect()
    assert out, "expected rows once n_pairs >= 12"
    for r in out:
        assert -1.0 <= r["autocorr"] <= 1.0
        assert r["autocorr"] > 0.99  # a perfect line correlates ~1


def test_duplicated_ngram_fraction_golden(spark):
    """Two docs sharing an exact 12-word passage, one unique doc: the
    sharers' duplicated fraction covers the shared grams, the unique
    doc scores 0, and a short doc (<10 words) yields zero grams."""
    from rentals_data_pipeline_spark.operators.text import (
        duplicated_ngram_fraction,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (1, shared + " tail1 one two"),
        (2, "head2 " + shared),
        (3, "solo " + " ".join(f"u{i}" for i in range(15))),
        (4, "tiny doc under ten words here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in df.transform(duplicated_ngram_fraction()).collect()
    }
    # doc1: 15 words -> 6 grams; grams fully inside the shared 12 words
    # are its first 3 (positions 1-3). doc2: 13 words -> 4 grams, the
    # last 3 sit inside the shared passage.
    assert got[1]["n_grams"] == 6 and got[1]["n_dup_grams"] == 3
    assert got[2]["n_grams"] == 4 and got[2]["n_dup_grams"] == 3
    assert got[3]["n_dup_grams"] == 0 and got[3]["dup_span_frac"] == 0.0
    assert got[4]["n_grams"] == 0 and got[4]["dup_span_frac"] is None
    assert got[1]["dup_span_frac"] == 0.5


def test_equal_frequency_binning_properties(spark):
    """Deciles partition the table: counts sum to the non-null rows,
    bins are within one row-group of equal size given money ties, and
    bin ranges are disjoint and ordered."""
    from rentals_data_pipeline_spark.plans import relational_queries  # noqa: F401

    out = sorted(
        QUERIES["stats_equal_frequency_binning"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in out] == list(range(1, 11))
    total = sum(r["n_orders"] for r in out)
    n = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .where("o_totalprice is not null")
        .count()
    )
    assert total == n
    for a, b in zip(out, out[1:]):
        assert a["hi_price"] < b["lo_price"]  # disjoint, ordered ranges
    # equal-frequency up to tie granularity: each bin within 20% of n/10
    for r in out:
        assert abs(r["n_orders"] - n / 10) <= max(2, 0.2 * n / 10)


def test_activity_streaks_golden(spark, tmp_path):
    """Planted calendar: user 1 active days 1-3 and 5 (streaks 3+1),
    user 2 active one day only."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12)
    days = [0, 1, 2, 4]
    rows = [
        (i, t0 + dt.timedelta(days=d), 1, "a", 1.0, None)
        for i, d in enumerate(days)
    ] + [(99, t0, 2, "a", 1.0, None)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: r.asDict()
        for r in QUERIES["analytics_activity_streaks"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1]["longest_streak"] == 3 and got[1]["n_streaks"] == 2
    assert got[1]["first_active_day"] == dt.date(2024, 1, 1)
    assert got[1]["last_active_day"] == dt.date(2024, 1, 5)
    assert got[2]["longest_streak"] == 1 and got[2]["n_streaks"] == 1


def test_asof_tolerance_golden(spark):
    """Tolerance nulls stale matches but keeps the as-of choice: the
    latest prior right row is matched-then-dropped, NOT replaced by an
    older in-tolerance row (merge_asof semantics)."""
    import datetime as dt

    from rentals_data_pipeline_spark.operators.relational import (
        asof_join_backward_tolerance,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(100)), (3, 2, ts(5))],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(1, ts(8), 80.0), (1, ts(9), 90.0)], ["k", "rts", "v"]
    )
    got = {
        r["id"]: (r["quote"], r["qts"])
        for r in left.transform(
            asof_join_backward_tolerance(
                right,
                on=["k"],
                left_ts="ts",
                right_ts="rts",
                payload={"v": "quote", "rts": "qts"},
                tolerance_sec=600,
            )
        ).collect()
    }
    assert got[1] == (90.0, ts(9))     # 1 min old: within tolerance
    assert got[2] == (None, None)      # latest prior is 91 min old: stale
    assert got[3] == (None, None)      # no prior row at all


def test_audio_dominant_lag_detects_planted_period(spark):
    """A byte pattern with exact period 8 must maximize autocorrelation
    at lag 8; short and NULL payloads yield NULLs."""
    from rentals_data_pipeline_spark.operators.multimodal import (
        audio_dominant_lag,
    )

    period8 = bytes([40, 200, 60, 50, 45, 55, 42, 48] * 40)  # 320 bytes
    rows = [(1, bytearray(period8)), (2, bytearray(b"xy")), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["best_lag"], r["best_score"])
        for r in df.transform(audio_dominant_lag()).collect()
    }
    assert got[1][0] == 8, got
    assert got[2] == (None, None)
    assert got[3] == (None, None)


def test_not_in_null_trap_golden(spark):
    """Three-valued logic: one NULL in the NOT IN list empties the
    result; a NULL outer key never passes NOT IN either."""
    left = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None)], "id long, k int"
    )
    spark.createDataFrame([(10,), (None,)], "k int").createOrReplaceTempView(
        "_trap_list_null"
    )
    spark.createDataFrame([(10,)], "k int").createOrReplaceTempView(
        "_trap_list_clean"
    )
    left.createOrReplaceTempView("_trap_left")
    with_null = spark.sql(
        "SELECT id FROM _trap_left WHERE k NOT IN (SELECT k FROM _trap_list_null)"
    ).collect()
    assert with_null == []  # NULL in list -> nothing qualifies
    clean = sorted(
        r["id"]
        for r in spark.sql(
            "SELECT id FROM _trap_left WHERE k NOT IN (SELECT k FROM _trap_list_clean)"
        ).collect()
    )
    assert clean == [2]  # 1 matches, 3 has NULL key -> unknown -> dropped


def test_table_checksum_layout_invariant_and_sensitive(spark):
    """Checksum is identical across layouts and changes when one cell
    changes."""
    from rentals_data_pipeline_spark.plans.catalog import QUERIES as Q

    a = Q["quality_table_checksum_orders"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # recompute over an adversarial repartition by hand-driving the
    # same plan on a shuffled copy
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    import pyspark.sql.functions as F

    canon = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), F.lit("<null>")),
        F.coalesce(F.col("o_custkey").cast("string"), F.lit("<null>")),
        F.coalesce(F.col("o_orderstatus"), F.lit("<null>")),
        F.coalesce(F.col("o_orderpriority"), F.lit("<null>")),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    b = (
        orders.repartition(13)
        .orderBy(F.rand(seed=7))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(h).cast("decimal(38,0)").alias("content_checksum"),
        )
        .collect()[0]
    )
    assert (a["n_rows"], str(a["content_checksum"])) == (
        b["n_rows"],
        str(b["content_checksum"]),
    )
    mutated = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == orders.head()["o_orderkey"], "Z")
        .otherwise(F.col("o_orderstatus")),
    )
    c = mutated.agg(F.sum(h).cast("decimal(38,0)").alias("cs")).collect()[0]
    assert str(c["cs"]) != str(a["content_checksum"])


def test_weighted_median_golden(spark):
    """Hand-computed: values 1,2,3 with weights 1,1,4 -> half mass at
    ceil(6/2)=3 lands on value 3; equal weights give the lower median."""
    from rentals_data_pipeline_spark.plans import relational_queries as RQ5

    from pyspark.sql.functions import pandas_udf

    def _wm(v: pd.Series, w: pd.Series) -> float:
        order = v.sort_values().index
        wv = w.reindex(order).astype("int64")
        cum = wv.cumsum()
        half = (int(wv.sum()) + 1) // 2
        return float(v.reindex(order)[cum >= half].iloc[0])

    wm = pandas_udf(_wm, "double")

    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 4),
         ("b", 10.0, 1), ("b", 20.0, 1)],
        ["g", "v", "w"],
    )
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(wm("v", "w").alias("m")).collect()
    }
    assert got["a"] == 3.0
    assert got["b"] == 10.0  # lower median on even total weight


def test_knn_label_vote_planted_clusters(spark, tmp_path):
    """Three tight clusters with distinct labels: every probe's 10-NN
    majority vote must return its own cluster's label."""
    import random

    from pyspark.sql import types as T5

    rng = random.Random(9)
    rows = []
    centers = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0], 2: [0.0, 0.0, 1.0]}
    for c, (lab, ctr) in enumerate(centers.items()):
        base = c * 50  # ids 0/50/100 are probes (vec_id % 50 == 0)
        for j in range(12):
            vec = [x + rng.uniform(-0.01, 0.01) for x in ctr]
            rows.append((base + j, vec, lab))
    schema = T5.StructType(
        [
            T5.StructField("vec_id", T5.LongType()),
            T5.StructField("embedding", T5.ArrayType(T5.FloatType())),
            T5.StructField("label", T5.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    got = {
        r["probe_id"]: r.asDict()
        for r in QUERIES["sim_knn_label_vote"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 50, 100}
    for pid, r in got.items():
        assert r["correct"], r
        assert r["n_votes"] == 10  # all 10 neighbors in-cluster


def test_salted_agg_auto_matches_plain_and_routes(spark):
    """Auto-salted aggregation equals the plain aggregation on skewed
    data, and the derived salt follows the skew profile's integer
    recommendation (hot key mass / target task size, ceiling)."""
    from pyspark.sql import functions as F5

    from rentals_data_pipeline_spark.operators.relational import (
        salted_agg_auto,
    )

    rows = [("hot", float(i % 7)) for i in range(3000)] + [
        (f"k{i}", 1.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    op = salted_agg_auto(
        ["k"],
        [(F5.count(F5.lit(1)), "n"), (F5.sum("v"), "s")],
        [
            F5.sum("n").cast("long").alias("n"),
            F5.sum("s").alias("s"),
        ],
        target_rows_per_task=1000,  # hot key (3000 rows) -> salt 3
    )
    got = {r["k"]: (r["n"], r["s"]) for r in df.transform(op).collect()}
    want = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F5.count(F5.lit(1)).cast("long").alias("n"),
             F5.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    # unskewed input routes to the plain path (salt 1) and still matches
    flat = spark.createDataFrame(
        [(f"k{i}", 1.0) for i in range(200)], ["k", "v"]
    )
    got2 = {r["k"]: r["n"] for r in flat.transform(op).collect()}
    assert all(v == 1 for v in got2.values()) and len(got2) == 200


def test_scd2_apply_changes_golden(spark):
    """Hand case: user 1 has history [v1 @ t0, current]; batch adds
    v2 @ t2. After apply: t0 row closes at t2, v2 is current. User 2
    (untouched) passes through byte-identical."""
    import datetime as dt

    from rentals_data_pipeline_spark.operators.relational import (
        scd2_apply_changes,
    )

    t0 = dt.datetime(2024, 1, 1)
    t2 = dt.datetime(2024, 1, 3)
    history = spark.createDataFrame(
        [
            (1, t0, None, 100, 10.0, 1),
            (2, t0, None, 101, 20.0, 1),
        ],
        "user_id long, valid_from timestamp, valid_to timestamp,"
        " event_id long, value double, is_current int",
    )
    batch = spark.createDataFrame(
        [(1, t2, 102, 11.0)],
        "user_id long, valid_from timestamp, event_id long, value double",
    )
    out = scd2_apply_changes(
        history,
        batch,
        ["user_id"],
        ts_col="valid_from",
        order_cols=["event_id"],
        value_cols=["value"],
    )
    rows = {
        (r["user_id"], r["valid_from"]): (
            r["valid_to"],
            r["value"],
            r["is_current"],
        )
        for r in out.collect()
    }
    assert rows[(1, t0)] == (t2, 10.0, 0)      # closed by the change
    assert rows[(1, t2)] == (None, 11.0, 1)    # new current version
    assert rows[(2, t0)] == (None, 20.0, 1)    # untouched passthrough
    assert len(rows) == 3


def test_rfm_scores_are_quintiles(spark):
    """Every score is in [1,5]; each score dimension's bins are within
    tie tolerance of n/5; high spenders outrank low spenders on M."""
    out = QUERIES["analytics_rfm_segmentation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(out)
    for dim in ("r_score", "f_score", "m_score"):
        vals = [r[dim] for r in out]
        assert all(1 <= v <= 5 for v in vals), dim
        assert len(set(vals)) >= 3, f"{dim} degenerate"
    top_m = [r for r in out if r["m_score"] == 5]
    bot_m = [r for r in out if r["m_score"] == 1]
    assert min(r["monetary"] for r in top_m) > max(
        r["monetary"] for r in bot_m
    )
    # recency inversion: the most recent buyers carry the HIGHEST r
    freshest = min(r["recency_days"] for r in out)
    assert all(
        r["r_score"] == 5 for r in out if r["recency_days"] == freshest
    )


def test_confidence_interval_golden(spark, tmp_path):
    """Known sample {1..5}: mean 3, sample sd sqrt(2.5), CI = mean ±
    1.96*sd/sqrt(5)."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "g", float(i + 1), None) for i in range(5)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["stats_group_confidence_intervals"](
        spark, str(tmp_path)
    ).collect()[0]
    sd = math.sqrt(2.5)
    half = 1.96 * sd / math.sqrt(5)
    assert r["n"] == 5 and r["mean_value"] == 3.0
    assert r["stddev_value"] == pytest.approx(sd, abs=1e-6)
    assert r["ci_lo"] == pytest.approx(3 - half, abs=1e-6)
    assert r["ci_hi"] == pytest.approx(3 + half, abs=1e-6)


def test_cohort_ltv_golden(spark, tmp_path):
    """Hand cohort: 2 users signing up day 0; purchases of 10 on day 0
    and 6 on day 2 -> cumulative 10 then 16, LTV 5.0 then 8.0."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        (1, t0, 1, "signup", 0.0, None),
        (2, t0, 2, "signup", 0.0, None),
        (3, t0 + dt.timedelta(hours=1), 1, "purchase", 10.0, None),
        (4, t0 + dt.timedelta(days=2), 2, "purchase", 6.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["age_days"]: (r["cum_revenue"], r["cohort_size"], r["ltv_per_user"])
        for r in QUERIES["analytics_cohort_ltv"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0] == (10.0, 2, 5.0)
    assert got[2] == (16.0, 2, 8.0)


def test_user_lifecycle_golden(spark, tmp_path):
    """Planted calendar across four Mondays: user A weeks 1,2,4 (new,
    retained, churn@3, resurrected@4); user B week 1 only (new,
    churn@2)."""
    import datetime as dt

    w1 = dt.datetime(2024, 1, 1, 10)  # a Monday
    def wk(n, user, eid):
        return (eid, w1 + dt.timedelta(weeks=n - 1), user, "click", 1.0, None)

    rows = [wk(1, 1, 1), wk(2, 1, 2), wk(4, 1, 3), wk(1, 2, 4)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["week"].isocalendar()[1]: (
            r["n_new"], r["n_retained"], r["n_resurrected"], r["n_churned"]
        )
        for r in QUERIES["analytics_user_lifecycle"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1] == (2, 0, 0, 0)       # both users new
    assert got[2] == (0, 1, 0, 1)       # A retained, B churned
    assert got[3] == (0, 0, 0, 1)       # A churned (absent week 3)
    assert got[4] == (0, 0, 1, 0)       # A resurrected


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """Series with a clean level shift (10/day for 10 days, then
    30/day for 10 days): CUSUM must peak exactly at the last
    pre-shift day."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = []
    for d in range(20):
        v = 10.0 if d < 10 else 30.0
        rows.append((d, t0 + dt.timedelta(days=d), 1, "s", v, None))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["ts_changepoint_cusum"](spark, str(tmp_path)).collect()[0]
    assert r["changepoint_day"] == dt.date(2024, 1, 10)
    # peak deviation: 10 days * |10 - 20| = 100
    assert r["max_cusum_dev"] == 100.0


def test_matryoshka_rerank_recall_regimes(spark, tmp_path):
    """Recall depends on whether the representation is actually
    nested: on this corpus's RANDOM embeddings the 16-dim prefix is
    uninformative (recall pinned at the observed 0.22 +/- noise — the
    anti-regime, same discipline as the PQ/SRP pinned goldens), while
    on embeddings whose first 16 dims carry the structure (what
    Matryoshka training produces) recall goes to 1.0."""
    import random

    from pyspark.sql import types as T8

    exact = {
        (r["probe_id"], r["match_id"])
        for r in QUERIES["sim_cosine_topk"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    mat = {
        (r["probe_id"], r["match_id"])
        for r in QUERIES["sim_matryoshka_prefix_rerank"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    recall = len(exact & mat) / len(exact)
    assert 0.05 <= recall <= 0.6, recall  # random-embedding anti-regime

    # structured corpus: signal in dims 0-15, tiny noise elsewhere
    rng = random.Random(11)
    rows = []
    for c in range(3):
        head = [1.0 if i % 3 == c else 0.1 for i in range(16)]
        for j in range(20):
            vec = [
                h + rng.uniform(-0.02, 0.02) for h in head
            ] + [rng.uniform(-0.05, 0.05) for _ in range(48)]
            rows.append((c * 50 + j, vec, c))
    schema = T8.StructType(
        [
            T8.StructField("vec_id", T8.LongType()),
            T8.StructField("embedding", T8.ArrayType(T8.FloatType())),
            T8.StructField("label", T8.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    exact_s = {
        (r["probe_id"], r["match_id"])
        for r in QUERIES["sim_cosine_topk"](spark, str(tmp_path)).collect()
    }
    mat_s = {
        (r["probe_id"], r["match_id"])
        for r in QUERIES["sim_matryoshka_prefix_rerank"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(exact_s & mat_s) / len(exact_s) >= 0.95


def test_ks_drift_ignores_null_values(spark):
    """NULL values carry no distribution mass: planting NULLs on one
    side must not change D (and must not flip cross-engine NULL
    ordering in the cumulative walk)."""
    from rentals_data_pipeline_spark.operators.quality import ks_drift

    base = [("g", 0, v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("g", 1, v) for v in [3.0, 4.0, 5.0, 6.0]
    ]
    with_nulls = base + [("g", 0, None), ("g", 1, None), ("g", 1, None)]
    a = ks_drift(
        spark.createDataFrame(base, ["grp", "period", "value"]),
        "grp", "period", "value",
    ).collect()[0]
    b = ks_drift(
        spark.createDataFrame(with_nulls, ["grp", "period", "value"]),
        "grp", "period", "value",
    ).collect()[0]
    assert (a["ks_d"], a["n_ref"], a["n_cur"]) == (0.5, 4, 4)
    assert (b["ks_d"], b["n_ref"], b["n_cur"]) == (0.5, 4, 4)


def test_scd2_apply_changes_null_key_no_duplication(spark):
    """A NULL-keyed change claims the NULL-keyed history slice via the
    null-safe join — the row must be closed, not duplicated."""
    import datetime as dt

    from rentals_data_pipeline_spark.operators.relational import (
        scd2_apply_changes,
    )

    t0, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3)
    history = spark.createDataFrame(
        [(None, t0, None, 100, 1.0, 1), (7, t0, None, 101, 2.0, 1)],
        "user_id long, valid_from timestamp, valid_to timestamp,"
        " event_id long, value double, is_current int",
    )
    batch = spark.createDataFrame(
        [(None, t2, 102, 9.0)],
        "user_id long, valid_from timestamp, event_id long, value double",
    )
    out = scd2_apply_changes(
        history, batch, ["user_id"],
        ts_col="valid_from", order_cols=["event_id"], value_cols=["value"],
    ).collect()
    assert len(out) == 3  # closed NULL-key row + its new version + user 7
    null_rows = sorted(
        (r["valid_from"], r["is_current"], r["value"])
        for r in out if r["user_id"] is None
    )
    assert null_rows == [(t0, 0, 1.0), (t2, 1, 9.0)]


def test_salted_agg_auto_empty_input(spark):
    """Zero-row input routes to the plain path and returns zero rows
    (the skew profile's NULL recommendation must not crash)."""
    from pyspark.sql import functions as F9

    from rentals_data_pipeline_spark.operators.relational import (
        salted_agg_auto,
    )

    empty = spark.createDataFrame([], "k string, v double")
    op = salted_agg_auto(
        ["k"],
        [(F9.count(F9.lit(1)), "n")],
        [F9.sum("n").cast("long").alias("n")],
    )
    assert empty.transform(op).count() == 0


def test_topk_with_ties_keeps_boundary_ties(spark, tmp_path):
    """Two orders tied at rank 3 must BOTH survive (4 rows out), and
    no tiebreaker column is needed for layout invariance."""
    rows = [
        (1, 10, 100.0), (1, 11, 90.0), (1, 12, 80.0), (1, 13, 80.0),
        (1, 14, 10.0),
    ]
    df = spark.createDataFrame(
        rows, ["o_custkey", "o_orderkey", "o_totalprice"]
    ).withColumn("o_orderstatus", F.lit("O")).withColumn(
        "o_orderdate", F.lit("2024-01-01").cast("timestamp")
    ).withColumn("o_orderpriority", F.lit("1-URGENT"))
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = QUERIES["topk_orders_with_ties"](spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert {r["o_orderkey"] for r in out} == {10, 11, 12, 13}


def test_temporal_intersection_golden(spark, tmp_path):
    """Hand-built histories: A-state changes at t0 and t4; B-state
    changes at t2. Intersections: [t0,t2) A1xB-none? B starts at t2 ->
    first overlap is [t2,t4) A1xB1, then [t4,open) A2xB1."""
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        (1, t(0), 1, "purchase", 10.0, None),
        (2, t(4), 1, "purchase", 20.0, None),
        (3, t(2), 1, "error", 7.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        (r["valid_from"], r["valid_to"], r["a_value"], r["b_value"])
        for r in QUERIES["join_temporal_validity_intersection"](
            spark, str(tmp_path)
        ).collect()
    )
    assert got == [
        (t(2), t(4), 10.0, 7.0),   # A1 x B1 overlap clipped to [t2,t4)
        (t(4), None, 20.0, 7.0),   # A2 x B1, both open-ended -> open
    ]


def test_interval_union_coverage_golden(spark, tmp_path):
    """Clicks at 0min, 10min (overlap -> one 40-min burst) and 120min
    (second 30-min burst): 2 bursts, 4200 covered seconds."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0, None),
        (2, t0 + dt.timedelta(minutes=10), 1, "click", 1.0, None),
        (3, t0 + dt.timedelta(minutes=120), 1, "click", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["analytics_interval_union_coverage"](
        spark, str(tmp_path)
    ).collect()[0]
    assert r["n_islands"] == 2
    assert r["covered_seconds"] == 40 * 60 + 30 * 60


def test_unigram_logprob_rare_words_score_higher(spark, tmp_path):
    """A doc of corpus-rare words must carry higher NLL/token than a
    doc of corpus-common words."""
    from rentals_data_pipeline_spark.plans import text_queries  # noqa: F401

    common = "the the the and and of"
    rows = [(i, common) for i in range(10)] + [
        (10, "zyx wvu tsr qpo"),        # words appearing once each
        (11, common),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: r["nll_per_token"]
        for r in QUERIES["text_unigram_logprob"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[10] > got[11]
    assert got[0] == got[11]  # identical docs, identical score


def test_degree_distribution_conserves_edge_mass(spark):
    """sum(degree * n_nodes) must equal 2x the undirected edge count
    (handshake lemma) on the real corpus graph."""
    from rentals_data_pipeline_spark.plans import graph_queries as GQ

    sf = "/root/testdata/sf0.001"
    dist = QUERIES["graph_degree_distribution"](spark, sf).collect()
    n_edges = GQ._pair_graph(spark, sf).count()
    assert sum(r["degree"] * r["n_nodes"] for r in dist) == 2 * n_edges


def test_salted_agg_auto_profiles_composite_key(spark):
    """Round-6 ADVICE: the auto-salt profile must look at the COMPOSITE
    grouping key. A hot first column over an unskewed composite (every
    (k1, k2) pair unique-ish) must recommend salt 1 — the profile of
    the struct shows no hot key — while results stay identical to the
    plain aggregation either way."""
    from pyspark.sql import functions as F5

    from rentals_data_pipeline_spark.operators.quality import (
        key_skew_profile,
    )
    from rentals_data_pipeline_spark.operators.relational import (
        salted_agg_auto,
    )

    # k1 is 'hot' for 3000 rows, but (k1, k2) has max mass 2
    rows = [("hot", i % 1500, 1.0) for i in range(3000)] + [
        (f"k{i}", 0, 1.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["k1", "k2", "v"])
    prof = key_skew_profile(
        df.select(F5.struct("k1", "k2").alias("_composite_key")),
        ["_composite_key"],
        target_rows_per_task=1000,
    ).collect()[0]
    assert prof["recommended_salt"] == 1  # composite is unskewed
    single = key_skew_profile(
        df.select("k1"), ["k1"], target_rows_per_task=1000
    ).collect()[0]
    assert single["recommended_salt"] >= 3  # first column alone IS hot

    op = salted_agg_auto(
        ["k1", "k2"],
        [(F5.count(F5.lit(1)), "n"), (F5.sum("v"), "s")],
        [F5.sum("n").cast("long").alias("n"), F5.sum("s").alias("s")],
        target_rows_per_task=1000,
    )
    got = {(r["k1"], r["k2"]): (r["n"], r["s"]) for r in df.transform(op).collect()}
    want = {
        (r["k1"], r["k2"]): (r["n"], r["s"])
        for r in df.groupBy("k1", "k2")
        .agg(F5.count(F5.lit(1)).cast("long").alias("n"), F5.sum("v").alias("s"))
        .collect()
    }
    assert got == want
