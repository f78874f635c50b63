"""Unit + property tests for int8 scalar quantization (operators/quantize)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import quantize as QZ


def _corpus(spark):
    return spark.createDataFrame(
        [
            (0, [0.0, -1.0, 5.0]),
            (1, [1.0, 0.0, 5.0]),
            (2, [0.5, 1.0, 5.0]),
            (3, [0.25, -0.5, 5.0]),
        ],
        ["vec_id", "embedding"],
    )


def test_dimension_minmax_golden(spark):
    rows = {
        r["dim_idx"]: r
        for r in QZ.dimension_minmax(_corpus(spark)).collect()
    }
    assert rows[1]["dmin"] == 0.0 and rows[1]["dmax"] == 1.0
    assert rows[2]["dmin"] == -1.0 and rows[2]["dmax"] == 1.0
    assert rows[1]["scale"] == pytest.approx(1.0 / 255)
    # constant dimension -> zero scale
    assert rows[3]["dmin"] == 5.0 and rows[3]["scale"] == 0.0


def test_codes_in_range_and_extremes_saturate(spark):
    df = _corpus(spark)
    calib = sorted(QZ.dimension_minmax(df).collect(), key=lambda r: r["dim_idx"])
    mins = [r["dmin"] for r in calib]
    scales = [r["scale"] for r in calib]
    out = {r["vec_id"]: r["qvec"] for r in QZ.quantize_vectors(df, mins, scales).collect()}
    for codes in out.values():
        assert all(0 <= c <= 255 for c in codes)
    # min of dim 1 is vec 0 (0.0) -> code 0; max is vec 1 (1.0) -> code 255
    assert out[0][0] == 0 and out[1][0] == 255
    # constant dimension encodes as 0 everywhere
    assert all(codes[2] == 0 for codes in out.values())


def test_roundtrip_error_bounded_by_half_scale(spark):
    df = _corpus(spark)
    calib = sorted(QZ.dimension_minmax(df).collect(), key=lambda r: r["dim_idx"])
    mins = [r["dmin"] for r in calib]
    scales = [r["scale"] for r in calib]
    dq = QZ.dequantize_vectors(QZ.quantize_vectors(df, mins, scales), mins, scales)
    rows = dq.select("embedding", "dqvec").collect()
    for r in rows:
        for x, y, s in zip(r["embedding"], r["dqvec"], scales):
            assert abs(x - y) <= s / 2 + 1e-12


def test_error_stats_match_literal_path(spark):
    """The distributed audit and the literal encode agree on worst error."""
    df = _corpus(spark)
    stats = {
        r["dim_idx"]: r
        for r in QZ.quantization_error_stats(df).collect()
    }
    calib = sorted(QZ.dimension_minmax(df).collect(), key=lambda r: r["dim_idx"])
    mins = [r["dmin"] for r in calib]
    scales = [r["scale"] for r in calib]
    dq = QZ.dequantize_vectors(QZ.quantize_vectors(df, mins, scales), mins, scales)
    worst = [0.0, 0.0, 0.0]
    for r in dq.select("embedding", "dqvec").collect():
        for i, (x, y) in enumerate(zip(r["embedding"], r["dqvec"])):
            worst[i] = max(worst[i], abs(x - y))
    for i in range(3):
        assert stats[i + 1]["max_abs_err"] == pytest.approx(worst[i], abs=1e-12)
    # constant dim: zero error, everything saturates at code 0
    assert stats[3]["max_abs_err"] == 0.0
    assert stats[3]["n_saturated"] == 4


def test_stats_partitioning_invariant(spark):
    """Order-invariant aggregates: same audit at any partitioning."""
    df = _corpus(spark)
    a = sorted(
        map(tuple, QZ.quantization_error_stats(df).collect())
    )
    b = sorted(
        map(tuple, QZ.quantization_error_stats(df.repartition(7)).collect())
    )
    assert a == b


def test_ragged_vector_degrades_not_errors(spark):
    """A vector longer than the calibration frame encodes the overflow
    dims as code 0 (try_element_at), even under ANSI mode."""
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame([(0, [0.5, 1.0, 2.0])], ["vec_id", "embedding"])
        out = QZ.quantize_vectors(df, [0.0], [1.0 / 255]).collect()[0]["qvec"]
        assert out[0] == 128 and out[1] == 0 and out[2] == 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_null_vector_passes_through(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, None)],
        "vec_id int, embedding array<double>",
    )
    out = {r["vec_id"]: r["qvec"] for r in QZ.quantize_vectors(df, [0.0, 0.0], [1.0 / 255] * 2).collect()}
    assert out[1] is None and out[0] is not None
