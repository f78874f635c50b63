"""Tests for relational core ops against the golden long fixture
(reference: tests/test_transform.py:62-87)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rentals_data_pipeline_spark.operators import relational as R


def test_drop_null_rows(spark, sample_long_df):
    out = sample_long_df.transform(R.drop_null_rows(["median_rent"]))
    assert out.count() == 17  # 19 - 2 planted nulls
    assert out.filter(F.col("median_rent").isNull()).count() == 0


def test_dedup_keep_first_deterministic(spark, sample_long_df):
    out = sample_long_df.transform(
        R.dedup_keep_first(
            ["RegionID", "month"], [F.col("median_rent").asc_nulls_first()]
        )
    )
    assert out.count() == 18  # 19 - 1 planted duplicate
    keys = out.select("RegionID", "month").distinct().count()
    assert keys == 18


def test_project_cast_drops_unknown(spark):
    df = spark.createDataFrame(
        [("1", "x", "extra", "9.5")], ["RegionID", "RegionName", "SizeRank", "rent"]
    )
    out = df.transform(
        R.project_cast(
            {
                "RegionID": T.IntegerType(),
                "RegionName": T.StringType(),
                "rent": T.DoubleType(),
            }
        )
    )
    assert out.columns == ["RegionID", "RegionName", "rent"]
    row = out.first()
    assert row["RegionID"] == 1 and row["rent"] == 9.5


def test_semi_and_anti_join(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    right = spark.createDataFrame([(1,), (3,)], ["k"])
    semi = left.transform(R.semi_join(right, ["k"]))
    anti = left.transform(R.anti_join(right, ["k"]))
    assert sorted(r["k"] for r in semi.collect()) == [1, 3]
    assert [r["k"] for r in anti.collect()] == [2]


def test_asof_join_backward_golden(spark):
    """Hand-computed backward as-of: equal timestamps match, no prior
    right row yields NULLs, NULL payload fields survive (struct trick)."""
    from rentals_data_pipeline_spark.operators.relational import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3")], ["k", "t", "tag"]
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, None), (2, 7, 300.0)],
        "k long, t long, v double",
    )
    out = {
        r.tag: (r.rt, r.rv)
        for r in left.transform(
            asof_join_backward(
                right, on=["k"], left_ts="t", right_ts="t",
                payload={"t": "rt", "v": "rv"},
            )
        ).collect()
    }
    assert out["l1"] == (10, 100.0)   # equal ts matches
    assert out["l2"] == (15, None)    # latest row wins even with NULL field
    assert out["l3"] == (None, None)  # right row at t=7 is after left t=5


def test_salted_join_matches_plain_join(spark):
    """Salted inner/left joins return exactly the plain join's rows —
    salting only changes the physical key distribution."""
    from rentals_data_pipeline_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ("hot", "cold")[: 1 + (i % 2)]],
        ["k", "i"],
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unmatched", "U")], ["k", "v"]
    )
    for how in ("inner", "left"):
        got = sorted(
            tuple(r) for r in left.transform(salted_join(right, ["k"], how)).collect()
        )
        want = sorted(tuple(r) for r in left.join(right, ["k"], how).collect())
        assert got == want, how


def test_interval_overlap_join_semantics(spark):
    """Half-open overlap semantics, exactly-once emission for pairs
    spanning many buckets, and negative (pre-epoch) starts."""
    from rentals_data_pipeline_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            ("a", 0, 100),     # spans many width-7 buckets
            ("b", 10, 20),
            ("c", -30, -10),   # pre-epoch
            ("d", 5, 6),
        ],
        "lid string, ls long, le long",
    )
    right = spark.createDataFrame(
        [
            ("x", 90, 95),    # overlaps a only — deep inside a's span
            ("y", 20, 30),    # touches b's end: half-open -> NO overlap
            ("z", -15, 40),   # overlaps a, b, c, d
        ],
        "rid string, rs long, re long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=7
        ).collect()
    )
    want = sorted(
        (lr["lid"], rr["rid"])
        for lr in left.collect()
        for rr in right.collect()
        if lr["ls"] < rr["re"] and rr["rs"] < lr["le"]
    )
    assert got == want
    assert ("b", "y") not in got  # adjacency is not overlap
    assert got.count(("a", "z")) == 1  # many shared buckets, one row
    # empty/degenerate intervals carry no extent: never overlap
    empty_l = spark.createDataFrame([("e", 15, 15)], "lid string, ls long, le long")
    assert (
        interval_overlap_join(
            empty_l, right, "ls", "le", "rs", "re", bucket_width=7
        ).count()
        == 0
    )


def test_snapshot_diff_classification(spark):
    from rentals_data_pipeline_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "C", 3.0), (4, "d", 9.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    # 2 unchanged (null-safe: None == None) and filtered out
    assert got == {1: "deleted", 3: "changed", 4: "changed", 5: "inserted"}
    with_unchanged = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(
            old, new, ["k"], ["s", "v"], include_unchanged=True
        ).collect()
    }
    assert with_unchanged[2] == "unchanged"


def test_suggest_bucket_width(spark):
    from rentals_data_pipeline_spark.operators.relational import (
        interval_overlap_join,
        suggest_bucket_width,
    )

    left = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 25), (3, 7, 7)],  # spans 10, 20; empty dropped
        "lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(1, 3, 33), (2, 50, 40)],  # span 30; inverted dropped
        "rid long, rs long, re long",
    )
    w = suggest_bucket_width(left, right, "ls", "le", "rs", "re")
    assert w == 20  # median of {10, 20, 30}
    # derived width drives the join to the same (width-invariant) result
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=w
        ).collect()
    )
    assert got == [(1, 1), (2, 1)]
    # both sides empty: any width is fine; helper must not crash
    empty = spark.createDataFrame([], "lid long, ls long, le long")
    empty_r = spark.createDataFrame([], "rid long, rs long, re long")
    assert (
        suggest_bucket_width(empty, empty_r, "ls", "le", "rs", "re") == 1
    )
