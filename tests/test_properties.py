"""Property-based invariants (hypothesis) for core operators.

Each property is the contract a distributed engine must hold under ANY
physical layout: results invariant to row order and partitioning, and
two-phase execution equal to one-phase. Strategies stay small (Spark
round-trips per example are the cost); ``max_examples`` is tuned so the
whole file adds seconds, not minutes, to the suite.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators.relational import (
    dedup_keep_first,
    salted_agg,
)
from rentals_data_pipeline_spark.operators.sampling import hash_bucket

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # key (few values → collisions)
        st.integers(min_value=-1000, max_value=1000),  # id / tiebreaker
        st.integers(min_value=-100, max_value=100),    # value (ints: exact sums)
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[1],
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS, nparts=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_salted_agg_equals_plain_agg(spark, rows, nparts):
    """Two-phase salted aggregation == single-phase, for any data and
    any partitioning (counts and integer sums are exact)."""
    df = spark.createDataFrame(rows, ["k", "id", "v"]).repartition(nparts)
    salted = {
        (r["k"]): (r["n"], r["sv"])
        for r in df.transform(
            salted_agg(
                ["k"],
                partial_aggs=[(F.count(F.lit(1)), "pn"), (F.sum("v"), "psv")],
                final_aggs=[
                    F.sum("pn").alias("n"),
                    F.sum("psv").alias("sv"),
                ],
                salt=4,
            )
        ).collect()
    }
    plain = {
        (r["k"]): (r["n"], r["sv"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert salted == plain


@given(rows=ROWS, nparts=st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_dedup_keep_first_is_layout_invariant(spark, rows, nparts):
    """Deterministic keep-first returns exactly the min-id row per key
    regardless of partitioning — the property plain dropDuplicates
    lacks."""
    df = spark.createDataFrame(rows, ["k", "id", "v"]).repartition(nparts)
    got = {
        (r["k"], r["id"])
        for r in df.transform(dedup_keep_first(["k"], [F.col("id")])).collect()
    }
    want = {}
    for k, i, _ in rows:
        if k not in want or i < want[k]:
            want[k] = i
    assert got == {(k, i) for k, i in want.items()}


@given(
    keys=st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=30, unique=True),
    n_buckets=st.sampled_from([2, 10, 100]),
)
@settings(**_SETTINGS)
def test_hash_bucket_range_and_determinism(spark, keys, n_buckets):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    out1 = {
        r["k"]: r["b"]
        for r in df.select("k", hash_bucket(F.col("k"), n_buckets).alias("b")).collect()
    }
    out2 = {
        r["k"]: r["b"]
        for r in df.repartition(3)
        .select("k", hash_bucket(F.col("k"), n_buckets).alias("b"))
        .collect()
    }
    assert out1 == out2
    assert all(0 <= b < n_buckets for b in out1.values())
