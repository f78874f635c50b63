"""global_top_n vs the orderBy().limit() reference it replaces.

The operator exists because TakeOrderedAndProject's driver merge does
not survive large N; semantically the two must be IDENTICAL whenever
the order is total, across partition counts and boundary positions.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators.topn import (
    global_order_stats,
    global_top_n,
)


def _corpus(spark, rows: int, parts: int):
    # deterministic, collision-heavy counts (ties!) + unique tiebreak
    data = [(f"w{i:04d}", (i * 7919) % 13) for i in range(rows)]
    return spark.createDataFrame(data, ["word", "cnt"]).repartition(parts)


def _want(spark, df, n):
    return [
        (r["word"], r["cnt"])
        for r in df.orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(n)
        .collect()
    ]


def _got(df, n, parts=None):
    out = global_top_n(
        df, [F.col("cnt").desc(), F.col("word").asc()], n, num_partitions=parts
    )
    return sorted(
        ((r["word"], r["cnt"]) for r in out.collect()),
        key=lambda t: (-t[1], t[0]),
    )


def test_matches_take_ordered_across_boundaries(spark):
    df = _corpus(spark, 500, 11)
    for n in (1, 7, 137, 499, 500, 501, 10_000):
        assert _got(df, n) == _want(spark, df, n), f"n={n}"


def test_partition_count_invariant(spark):
    df = _corpus(spark, 300, 5)
    want = _want(spark, df, 100)
    for parts in (1, 3, 17, 64):
        assert _got(df, 100, parts=parts) == want, f"parts={parts}"


def test_zero_and_empty(spark):
    df = _corpus(spark, 50, 3)
    assert _got(df, 0) == []
    empty = spark.createDataFrame([], "word STRING, cnt INT")
    assert _got(empty, 10) == []


def test_keeps_original_columns_only(spark):
    df = _corpus(spark, 20, 2)
    out = global_top_n(df, [F.col("cnt").desc(), F.col("word").asc()], 5)
    assert out.columns == ["word", "cnt"]
    assert out.count() == 5


@given(
    rows=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=4),
            st.integers(min_value=0, max_value=9),  # heavy tie collisions
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda r: r[0],  # unique word -> total order holds
    ),
    n=st.integers(min_value=0, max_value=45),
    nparts=st.integers(min_value=1, max_value=6),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_matches_python_sort(spark, rows, n, nparts):
    """For ANY data, n, and partitioning: global_top_n == the Python
    sort's first n under the same total order."""
    df = spark.createDataFrame(rows, "word string, cnt int").repartition(nparts)
    got = sorted(
        ((r["word"], r["cnt"]) for r in global_top_n(
            df, [F.col("cnt").desc(), F.col("word").asc()], n
        ).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    want = sorted(rows, key=lambda t: (-t[1], t[0]))[:n]
    assert got == want


def test_reserved_column_collision_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], ["word", "_seq"])
    with pytest.raises(ValueError, match="_seq"):
        global_top_n(df, [F.col("word").asc()], 1)


def test_no_take_ordered_in_plan(spark):
    """The point of the operator: the executed selection contains no
    TakeOrderedAndProject (driver merge) and no global single-task
    Window sort."""
    df = _corpus(spark, 200, 8)
    out = global_top_n(df, [F.col("cnt").desc(), F.col("word").asc()], 50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    assert "Window" not in plan


def test_global_order_stats_matches_reference_window(spark):
    """Rank and running sum equal the single-task global-window
    reference for any partitioning, including heavy ties."""
    rows = [(f"w{i:03d}", (i * 31) % 5, (i * 7) % 11 + 1) for i in range(120)]
    df = spark.createDataFrame(rows, ["word", "cnt", "val"])
    want = []
    run = 0
    for w, c, v in sorted(rows, key=lambda t: (-t[1], t[0])):
        run += v
        want.append((w, c, v, len(want) + 1, run))
    for parts in (1, 4, 9):
        out = global_order_stats(
            df.repartition(parts),
            [F.col("cnt").desc(), F.col("word").asc()],
            sum_col="val",
        )
        got = sorted(
            ((r["word"], r["cnt"], r["val"], r["global_rank"], r["global_cumsum"])
             for r in out.collect()),
            key=lambda t: t[3],
        )
        assert got == want, f"parts={parts}"


def test_global_order_stats_rank_only_and_empty(spark):
    df = spark.createDataFrame([("a", 2), ("b", 1)], ["word", "cnt"])
    out = global_order_stats(df, [F.col("cnt").desc(), F.col("word").asc()])
    assert {(r["word"], r["global_rank"]) for r in out.collect()} == {
        ("a", 1), ("b", 2)
    }
    assert "global_cumsum" not in out.columns
    empty = spark.createDataFrame([], "word string, cnt int")
    assert global_order_stats(
        empty, [F.col("cnt").asc()], sum_col="cnt"
    ).count() == 0


def test_global_order_stats_no_global_window(spark):
    """The executed plan must not contain a partitionless Window sort —
    the single-task shape this primitive exists to avoid. (A _pid-
    partitioned window for the running sum is fine and expected.)"""
    df = spark.createDataFrame(
        [(f"w{i}", i % 3, 1) for i in range(50)], ["word", "cnt", "val"]
    ).repartition(5)
    out = global_order_stats(
        df, [F.col("cnt").desc(), F.col("word").asc()], sum_col="val"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    # every Window node in the plan is partitioned by _pid
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_pid" in line, line
