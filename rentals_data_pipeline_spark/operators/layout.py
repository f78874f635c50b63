"""Multi-dimensional data layout: Z-order clustering for data skipping.

Partition pruning handles ONE dimension (the partition column); sorted
writes handle one more. When queries filter on several columns at once
(`user_id = X AND value BETWEEN a AND b`), a linear sort concentrates
only its leading column — parquet row-group min/max stats on the other
columns stay full-width and nothing prunes. Z-ordering interleaves the
bits of several quantized columns into one clustering key, so sorting
by it keeps row groups narrow in EVERY participating dimension and
min/max skipping fires on any of them. The same layout operator
Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort orders provide —
here as a plain column expression (pure codegen: shifts and ORs, no
UDF) plus a sorted-write helper, engine-neutral parquet.

At 100 TB: compute/choose quantization bounds once (approx min/max per
column), write with ``write_zordered_parquet`` (range partition by z →
file count scales with data; each file covers a small hyper-rectangle),
and every multi-dimension filter prunes row groups by footer stats —
no index structure to maintain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by fixed bounds: floor
    linear scaling, clamped at the edges (values outside [lo, hi)
    land in the edge cells). Deterministic IEEE arithmetic — the
    oracle replays it exactly."""
    cells = 1 << bits
    scaled = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells))
    return F.least(
        F.lit(cells - 1), F.greatest(F.lit(0), scaled.cast("long"))
    )


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of already-quantized integer
    columns into one Z-value (Morton code): bit i of column c lands at
    position i * n_cols + c. Pure shift/AND/OR expression tree —
    whole-stage codegen, no Python. n_cols * bits must fit a long."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError("n_cols * bits must be <= 63")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + ci))
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Cluster by a Z-value and write: range-partition on z (each of
    the ``n_files`` output tasks owns a contiguous z-range == a small
    hyper-rectangle of the quantized dimensions), sort within
    partitions so row groups inside each file are narrow too. At scale
    ``n_files`` comes from data volume / target file size."""
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )
