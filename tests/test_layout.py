"""Z-order layout: interleave correctness + multi-column clustering.

The clustering assertion reads parquet FOOTER min/max stats per file —
the same stats row-group skipping uses — and checks that a Z-ordered
write keeps files narrow in BOTH dimensions, where a linear sort is
narrow only in its leading column.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import layout as LAY
from rentals_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3)], "a long, b long")  # 0b101, 0b011
    # bit i of col c -> position i*2 + c:
    # a bits (0,2) -> z bits 0,4 ; b bits (0,1) -> z bits 1,3
    got = df.select(
        LAY.zorder_value([F.col("a"), F.col("b")], bits=3).alias("z")
    ).collect()[0]["z"]
    assert got == (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (255.9,), (511.9,), (9999.0,)], "v double"
    )
    got = [
        r[0]
        for r in df.select(LAY.quantize(F.col("v"), 0.0, 512.0, 8)).collect()
    ]
    assert got == [0, 0, 127, 255, 255]


def _file_spans(path: str, cols: tuple[str, str]) -> list[tuple[float, float]]:
    """Per-file (max-min) span of each column from parquet footers."""
    spans = []
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        if all(lo[c] is not None for c in cols):
            spans.append(tuple(hi[c] - lo[c] for c in cols))
    return spans


def test_zordered_write_clusters_both_dimensions(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    # bounds from the data (the documented practice: one approx min/max
    # pass before the layout write) — fixed oversized bounds would leave
    # a dimension's high bits all-zero and starve it of interleave
    # positions
    mx = events.agg(
        F.max("user_id").alias("u"), F.max("value").alias("v")
    ).collect()[0]
    uq = LAY.quantize(F.col("user_id"), 0.0, float(mx["u"]) + 1.0, 8)
    vq = LAY.quantize(F.col("value"), 0.0, float(mx["v"]) + 1.0, 8)
    z = LAY.zorder_value([uq, vq], bits=8)

    zpath = str(tmp_path / "zordered")
    LAY.write_zordered_parquet(events, zpath, z, n_files=8)
    lpath = str(tmp_path / "linear")
    (
        events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lpath)
    )

    g = events.agg(
        (F.max("user_id") - F.min("user_id")).alias("u"),
        (F.max("value") - F.min("value")).alias("v"),
    ).collect()[0]

    def mean_frac(spans, idx, total):
        return sum(s[idx] for s in spans) / len(spans) / total

    zs = _file_spans(zpath, ("user_id", "value"))
    ls = _file_spans(lpath, ("user_id", "value"))
    assert len(zs) >= 4 and len(ls) >= 4
    # z-order: BOTH dimensions substantially narrower than global
    assert mean_frac(zs, 0, g["u"]) < 0.5
    assert mean_frac(zs, 1, g["v"]) < 0.5
    # linear sort: leading column narrow, but value stays wide
    assert mean_frac(ls, 0, g["u"]) < 0.5
    assert mean_frac(ls, 1, g["v"]) > 0.6
    # and z-order's value clustering beats linear's by a wide margin
    assert mean_frac(zs, 1, g["v"]) < 0.6 * mean_frac(ls, 1, g["v"])


def test_suggest_quantize_bounds(spark):
    from rentals_data_pipeline_spark.operators.layout import (
        quantize,
        suggest_quantize_bounds,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0.0, 5, None), (10.0, 5, None), (4.0, 5, None)],
        "a double, b long, c double",
    )
    bounds = suggest_quantize_bounds(df, ["a", "b", "c"])
    assert bounds["a"] == (0.0, 10.0)
    assert bounds["b"] == (5.0, 6.0)   # constant column: one real cell
    assert bounds["c"] == (0.0, 1.0)   # all-NULL column: degenerate cell
    lo, hi = bounds["a"]
    cells = [
        r["q"]
        for r in df.select(
            quantize(F.col("a"), lo, hi, bits=4).alias("q")
        ).collect()
    ]
    # max clamps into the top cell, min into cell 0, interior in range
    assert sorted(cells) == [0, 6, 15]
