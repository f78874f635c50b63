"""Int8 scalar quantization for embedding columns.

The standard first rung of embedding compression for ANN at corpus
scale: per-dimension min/max calibration + affine quantization to
uint8 codes cuts vector storage 4x (float32 -> 1 byte/dim) and makes
brute-force / IVF scans memory-bandwidth-bound instead of capacity-
bound. At 100 TB of embeddings the calibration pass is one
posexplode with map-side partial min/max (the shuffle carries
|dims| x |partitions| partial rows, never |vectors| x |dims|), and
the encode pass is pure whole-stage codegen over array transforms —
no Python, no driver-side data motion beyond the |dims|-row
calibration frame (same bounded-collect contract as the IVF centroid
matrix, `operators/similarity.py`).

Reference scope note: the reference pipeline (jairajsaraf/
rentals-data-pipeline) has no vector operators at all — this module
is part of the mandated LLM-data-pipeline extension surface, built on
public quantization practice (FAISS's ScalarQuantizer formulation:
code = round((x - min) / scale), dequant = min + code * scale).

Cross-engine determinism (for the DuckDB oracle pairing): float32
inputs cast exactly to float64; min/max are order-invariant; scale =
(max - min)/255 and the quantize/dequantize affine maps are the same
IEEE double ops on both engines, so codes and reconstruction errors
are bit-identical — only the final projected doubles get the shared
half-up rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CODE_MAX = 255  # uint8 code range [0, 255]


def explode_dimensions(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, vec) -> (id, dim_idx, v) rows, 1-based dim_idx, double v.

    The fan-out happens in the map stage; downstream per-dimension
    aggregates combine map-side, so the explosion never reaches a
    shuffle at full width.
    """
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "pos", "v"
        ),
    ).select(
        id_col, (F.col("pos") + F.lit(1)).alias("dim_idx"), "v"
    )


def dimension_minmax(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-dimension calibration frame: (dim_idx, dmin, dmax, scale).

    One pass over the corpus; min/max are order-invariant so the
    result is deterministic under any partitioning. scale is the
    uint8 affine step (0 for a constant dimension — encode maps those
    to code 0 and dequantizes exactly).
    """
    return (
        explode_dimensions(df, vec_col, id_col)
        .groupBy("dim_idx")
        .agg(F.min("v").alias("dmin"), F.max("v").alias("dmax"))
        .withColumn(
            "scale", (F.col("dmax") - F.col("dmin")) / F.lit(float(CODE_MAX))
        )
    )


def _code(v: Column, dmin: Column, scale: Column) -> Column:
    """uint8 code for value v: clamp(floor((v-dmin)/scale + 0.5), 0, 255).

    Guarded for scale == 0 (constant dimension) so the division never
    executes under ANSI mode; half-up via the explicit floor(+0.5)
    formula shared with the DuckDB oracles.
    """
    raw = F.floor((v - dmin) / F.nullif(scale, F.lit(0.0)) + F.lit(0.5))
    clamped = F.least(
        F.greatest(raw, F.lit(0).cast("long")), F.lit(CODE_MAX).cast("long")
    )
    return F.coalesce(clamped, F.lit(0).cast("long"))


def quantization_error_stats(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-dimension int8 quantization audit, fully distributed.

    Output (one row per dimension): dim_idx, dmin, dmax, scale,
    max_abs_err (worst-case reconstruction error — bounded by
    scale/2), n_saturated (elements landing on code 0 or 255; by
    construction at least the min and max land there — a large count
    signals an outlier-stretched range that wants percentile clipping).

    Shape: ONE corpus scan feeds both the calibration aggregate and
    the error aggregate; the |dims|-row calibration frame broadcasts
    back onto the exploded values, so no vector data is collected and
    the only corpus-sized exchange is the map-side-combined partial
    aggregation. Every statistic is an order-invariant aggregate
    (min/max/count) over bit-deterministic doubles.
    """
    exploded = explode_dimensions(df, vec_col, id_col)
    dims = (
        exploded.groupBy("dim_idx")
        .agg(F.min("v").alias("dmin"), F.max("v").alias("dmax"))
        .withColumn(
            "scale", (F.col("dmax") - F.col("dmin")) / F.lit(float(CODE_MAX))
        )
    )
    code = _code(F.col("v"), F.col("dmin"), F.col("scale"))
    dequant = F.col("dmin") + code.cast("double") * F.col("scale")
    err = F.abs(F.col("v") - dequant)
    return (
        exploded.join(F.broadcast(dims), "dim_idx")
        .withColumn("q", code)
        .groupBy("dim_idx", "dmin", "dmax", "scale")
        .agg(
            F.max(err).alias("max_abs_err"),
            F.sum(
                F.when(
                    (F.col("q") == 0) | (F.col("q") == CODE_MAX), 1
                ).otherwise(0)
            ).alias("n_saturated"),
        )
    )


def quantize_vectors(
    df: DataFrame,
    mins: list[float],
    scales: list[float],
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    """Encode vectors to uint8 code arrays with literal calibration.

    ``mins``/``scales`` come from ``dimension_minmax`` — a |dims|-row
    bounded collect (the IVF-centroid contract: dimension count is a
    model constant, never data-scaled). The encode itself is a pure
    codegen array transform — zero shuffles, zero Python — so it
    composes into any scan-side pipeline (write-time encoding of a
    100 TB corpus is embarrassingly parallel).
    """
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    scales_arr = F.array(*[F.lit(float(s)) for s in scales])
    expr = F.transform(
        F.col(vec_col).cast("array<double>"),
        # try_element_at: a vector longer than the calibration frame
        # (ragged corpus) degrades to code 0 instead of an ANSI error.
        lambda x, i: _code(
            x,
            F.try_element_at(mins_arr, i + 1),
            F.try_element_at(scales_arr, i + 1),
        ).cast("int"),
    )
    return df.withColumn(out_col, expr)


def dequantize_vectors(
    df: DataFrame,
    mins: list[float],
    scales: list[float],
    qvec_col: str = "qvec",
    out_col: str = "dqvec",
) -> DataFrame:
    """Inverse affine map: code -> min + code*scale, codegen only."""
    mins_arr = F.array(*[F.lit(float(m)) for m in mins])
    scales_arr = F.array(*[F.lit(float(s)) for s in scales])
    expr = F.transform(
        F.col(qvec_col),
        lambda q, i: F.try_element_at(mins_arr, i + 1)
        + q.cast("double") * F.try_element_at(scales_arr, i + 1),
    )
    return df.withColumn(out_col, expr)
