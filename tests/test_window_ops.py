"""Golden tests for window operators (reference goldens:
tests/test_transform.py:90-127)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rentals_data_pipeline_spark.operators import window as W

MOM_SCHEMA = T.StructType(
    [
        T.StructField("RegionID", T.IntegerType(), False),
        T.StructField("month", T.DateType(), False),
        T.StructField("median_rent", T.DoubleType(), True),
    ]
)


def test_pct_change_golden(spark):
    """Reference MoM golden: 2000→2100 = 5.0%, 2100→2079 = -1.0%
    (tests/test_transform.py:90-108)."""
    df = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), 2000.0),
            (1, dt.date(2024, 2, 1), 2100.0),
            (1, dt.date(2024, 3, 1), 2079.0),
        ],
        MOM_SCHEMA,
    )
    out = df.transform(
        W.pct_change("median_rent", ["RegionID"], "month", out_col="mom")
    )
    rows = {r["month"].month: r["mom"] for r in out.collect()}
    assert rows[1] is None
    assert rows[2] == 5.0
    assert rows[3] == -1.0


def test_pct_change_zero_prev_is_null(spark):
    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 0.0), (1, dt.date(2024, 2, 1), 10.0)], MOM_SCHEMA
    )
    out = df.transform(W.pct_change("median_rent", ["RegionID"], "month", out_col="m"))
    rows = {r["month"].month: r["m"] for r in out.collect()}
    assert rows[2] is None  # divide-by-zero guarded to NULL


def test_rank_golden(spark):
    """Reference rank golden: 3500→1, 1800→2, 1500→3, highest first
    (tests/test_transform.py:111-127); ties share rank with gaps."""
    df = spark.createDataFrame(
        [
            ("NY", "New York", 3500.0),
            ("NY", "Albany", 1800.0),
            ("NY", "Buffalo", 1500.0),
            ("NY", "Tie1", 1500.0),
        ],
        ["state", "city", "rent"],
    )
    out = df.transform(W.rank_in_group("rent", ["state"], out_col="rk"))
    got = {r["city"]: r["rk"] for r in out.collect()}
    assert got == {"New York": 1, "Albany": 2, "Buffalo": 3, "Tie1": 3}


def test_top_k_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 3)) for i in range(10)], ["g", "id", "v"]
    )
    out = df.transform(W.top_k_per_group("v", ["g"], k=2, tiebreakers=["id"]))
    rows = sorted((r["v"], r["id"]) for r in out.collect())
    assert rows == [(2.0, 2), (2.0, 5)]


def test_rolling_and_cumulative(spark):
    df = spark.createDataFrame(
        [(1, dt.date(2024, m, 1), float(m)) for m in range(1, 5)], MOM_SCHEMA
    )
    out = df.transform(
        W.rolling("median_rent", ["RegionID"], "month", preceding=2, out_col="r3")
    ).transform(
        W.cumulative("median_rent", ["RegionID"], "month", out_col="cum")
    )
    rows = {r["month"].month: (r["r3"], r["cum"]) for r in out.collect()}
    assert rows[1] == (1.0, 1.0)
    assert rows[3] == (2.0, 6.0)
    assert rows[4] == (3.0, 10.0)
