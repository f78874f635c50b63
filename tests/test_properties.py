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


ASOF_LEFT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)),  # (key, ts)
    min_size=1, max_size=15,
)
ASOF_RIGHT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 999)),
    min_size=0, max_size=15,
    unique_by=lambda r: (r[0], r[1]),  # one payload per (key, ts): tie-free
)


@given(left=ASOF_LEFT, right=ASOF_RIGHT, nparts=st.integers(1, 3))
@settings(**_SETTINGS)
def test_asof_joins_match_brute_force(spark, left, right, nparts):
    """Both as-of directions equal the per-row brute-force definition
    (backward: latest right_ts <= ts; forward: earliest right_ts >= ts)
    for any data, ties included, under any partitioning."""
    from rentals_data_pipeline_spark.operators.relational import (
        asof_join_backward,
        asof_join_forward,
    )

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], ["k", "ts", "rowid"]
    ).repartition(nparts)
    rdf = spark.createDataFrame(right, "k long, ts long, v long")

    back = {
        r["rowid"]: r["bv"]
        for r in ldf.transform(
            asof_join_backward(rdf, ["k"], "ts", "ts", {"v": "bv"})
        ).collect()
    }
    fwd = {
        r["rowid"]: r["fv"]
        for r in ldf.transform(
            asof_join_forward(rdf, ["k"], "ts", "ts", {"v": "fv"})
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        prior = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        nxt = [(rt, v) for rk, rt, v in right if rk == k and rt >= t]
        assert back[i] == (max(prior)[1] if prior else None), (k, t)
        assert fwd[i] == (min(nxt)[1] if nxt else None), (k, t)


@given(
    n_tokens=st.integers(1, 60),
    chunk=st.integers(2, 16),
    overlap=st.integers(0, 8),
)
@settings(**_SETTINGS)
def test_chunks_reassemble_to_document(spark, n_tokens, chunk, overlap):
    """Dropping each chunk's leading overlap (except the first) and
    concatenating reproduces the original token stream exactly — no
    token lost or duplicated by the windowing."""
    from hypothesis import assume

    from rentals_data_pipeline_spark.operators.text import chunk_documents

    assume(overlap < chunk)
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in df.transform(
            chunk_documents(chunk_tokens=chunk, overlap=overlap)
        ).collect()
    )
    rebuilt = []
    for idx, text in rows:
        part = text.split(" ")
        rebuilt.extend(part if idx == 0 else part[overlap:])
    assert rebuilt == toks


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),   # id
        st.integers(min_value=-50, max_value=50),  # start
        st.integers(min_value=1, max_value=40),    # span (non-empty)
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda r: r[0],
)


@given(
    left=INTERVALS,
    right=INTERVALS,
    width=st.integers(min_value=1, max_value=20),
)
@settings(**_SETTINGS)
def test_interval_overlap_join_equals_brute_force(spark, left, right, width):
    """For ANY interval sets and ANY bucket width, the bucketed join
    equals the brute-force overlap predicate — exactly once per pair."""
    from rentals_data_pipeline_spark.operators.relational import (
        interval_overlap_join,
    )

    ldf = spark.createDataFrame(
        [(i, s, s + n) for i, s, n in left], "lid long, ls long, le long"
    )
    rdf = spark.createDataFrame(
        [(i, s, s + n) for i, s, n in right], "rid long, rs long, re long"
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, rdf, "ls", "le", "rs", "re", bucket_width=width
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, ls, ln in left
        for ri, rs, rn in right
        if ls < rs + rn and rs < ls + ln
    )
    assert got == want


SNAP = st.lists(
    st.tuples(
        # key — None models a NULL key: matched null-safely across sides,
        # never misread as side-absence (presence markers, not key nulls)
        st.one_of(
            st.none(), st.integers(min_value=0, max_value=8)
        ),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # value
    ),
    max_size=10,
    unique_by=lambda r: r[0],
)


@given(old=SNAP, new=SNAP)
@settings(**_SETTINGS)
def test_snapshot_diff_equals_set_arithmetic(spark, old, new):
    """snapshot_diff classification == plain dict/set arithmetic for
    ANY pair of keyed snapshots, including NULL keys and NULL values
    (a NULL key is one ordinary key value under null-safe equality)."""
    from rentals_data_pipeline_spark.operators.relational import snapshot_diff

    odf = spark.createDataFrame(old, "k long, v long")
    ndf = spark.createDataFrame(new, "k long, v long")
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(
            odf, ndf, ["k"], ["v"], include_unchanged=True
        ).collect()
    }
    om, nm = dict(old), dict(new)
    want = {}
    for k in set(om) | set(nm):
        if k not in om:
            want[k] = "inserted"
        elif k not in nm:
            want[k] = "deleted"
        elif om[k] != nm[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


_SNAP = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),        # row key
        st.integers(min_value=0, max_value=2),        # group key (few → churn)
        st.integers(min_value=-100, max_value=100),   # measure (ints: exact)
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda r: r[0],
)


@given(old=_SNAP, new=_SNAP)
@settings(**_SETTINGS)
def test_incremental_agg_equals_full_recompute_property(spark, old, new):
    """For ANY pair of keyed snapshots, folding the snapshot_diff delta
    into the old aggregate == recomputing the aggregate over the new
    snapshot (exactly — decimal sums).  Covers inserts, deletes,
    measure changes, group migration, group disappearance, and both
    empty snapshots."""
    from rentals_data_pipeline_spark.operators.incremental import (
        aggregate_snapshot,
        incremental_agg_update,
    )
    from rentals_data_pipeline_spark.operators.relational import snapshot_diff

    cols = ["k", "grp", "x"]
    schema = "k long, grp long, x long"
    old_df = spark.createDataFrame(old, schema)
    new_df = spark.createDataFrame(new, schema)
    base = old_df.transform(aggregate_snapshot(["grp"], ["x"]))
    diff = snapshot_diff(old_df, new_df, keys=["k"], compare=["grp", "x"])
    removed = old_df.join(
        diff.where(F.col("change_type").isin("deleted", "changed")).select("k"),
        "k",
        "semi",
    )
    added = new_df.join(
        diff.where(F.col("change_type").isin("inserted", "changed")).select("k"),
        "k",
        "semi",
    )
    merged = incremental_agg_update(base, removed, added, ["grp"], ["x"])
    full = new_df.transform(aggregate_snapshot(["grp"], ["x"]))
    got = sorted((tuple(r) for r in merged.collect()), key=repr)
    want = sorted((tuple(r) for r in full.collect()), key=repr)
    assert got == want


VECS = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
            width=32,  # float32-representable, like parquet embeddings
        ),
        min_size=3,
        max_size=3,
    ),
    min_size=1,
    max_size=12,
)


@given(vecs=VECS)
@settings(**_SETTINGS)
def test_int8_quantize_roundtrip_bound_and_code_range(spark, vecs):
    """For ANY float32 corpus: codes stay in [0, 255], every in-range
    value reconstructs within scale/2 (+1 ulp headroom), and the
    calibration is invariant to partitioning."""
    from rentals_data_pipeline_spark.operators import quantize as QZ

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    calib = sorted(
        QZ.dimension_minmax(df).collect(), key=lambda r: r["dim_idx"]
    )
    mins = [r["dmin"] for r in calib]
    scales = [r["scale"] for r in calib]
    dq = QZ.dequantize_vectors(
        QZ.quantize_vectors(df, mins, scales), mins, scales
    )
    for r in dq.collect():
        for x, y, s, q in zip(
            r["embedding"], r["dqvec"], scales, r["qvec"]
        ):
            assert 0 <= q <= 255
            assert abs(x - y) <= s / 2 + 1e-9 * max(1.0, abs(x))
    calib2 = sorted(
        QZ.dimension_minmax(df.repartition(5)).collect(),
        key=lambda r: r["dim_idx"],
    )
    assert [(r["dmin"], r["dmax"]) for r in calib] == [
        (r["dmin"], r["dmax"]) for r in calib2
    ]


VALS = st.lists(
    st.integers(min_value=0, max_value=40),  # many ties
    min_size=5,
    max_size=60,
)


@given(vals=VALS, n_bins=st.integers(min_value=2, max_value=6))
@settings(**_SETTINGS)
def test_equal_frequency_edges_match_brute_force(spark, vals, n_bins):
    """The distributed histogram-edge binning equals the brute-force
    'ties stay together' qcut on arbitrary tie-heavy data: edge d =
    the smallest value whose cumulative count reaches ceil(n*d/k)."""
    from pyspark.sql import Window

    df = spark.createDataFrame([(float(v),) for v in vals], ["v"])
    c = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_tot = c.agg(F.sum("c").alias("n"))
    cum = c.select("v", F.sum("c").over(w_cum).alias("cumc")).crossJoin(
        F.broadcast(n_tot)
    )
    ds = cum.select(
        "v", "cumc", "n",
        F.explode(F.sequence(F.lit(1), F.lit(n_bins - 1))).alias("d"),
    )
    got = sorted(
        r["edge"]
        for r in ds.where(
            F.col("cumc") >= F.expr(f"(n * d + {n_bins - 1}) div {n_bins}")
        )
        .groupBy("d")
        .agg(F.min("v").alias("edge"))
        .collect()
    )
    # brute force on the python side
    s = sorted(vals)
    n = len(s)
    want = []
    for d in range(1, n_bins):
        rank = -(-n * d // n_bins)  # ceil
        want.append(float(s[rank - 1]))
    assert got == sorted(want)


KSROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),       # period
        st.integers(min_value=-20, max_value=20),    # value (ties likely)
    ),
    min_size=4,
    max_size=40,
).filter(lambda rs: {r[0] for r in rs} == {0, 1})


@given(rows=KSROWS)
@settings(**_SETTINGS)
def test_ks_drift_bounds_and_identity(spark, rows):
    """0 <= D <= 1 on arbitrary data; D == 0 when both periods hold
    identical multisets (constructed by mirroring period 0)."""
    from rentals_data_pipeline_spark.operators.quality import ks_drift

    df = spark.createDataFrame(
        [("g", p, float(v)) for p, v in rows], ["grp", "period", "value"]
    )
    d = ks_drift(df, "grp", "period", "value").collect()[0]["ks_d"]
    assert 0.0 <= d <= 1.0
    mirrored = [("g", 0, float(v)) for _, v in rows] + [
        ("g", 1, float(v)) for _, v in rows
    ]
    df2 = spark.createDataFrame(mirrored, ["grp", "period", "value"])
    assert ks_drift(df2, "grp", "period", "value").collect()[0]["ks_d"] == 0.0


DAYSETS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),    # user
        st.integers(min_value=0, max_value=20),   # active day number
    ),
    min_size=1,
    max_size=40,
)


@given(pairs=DAYSETS)
@settings(**_SETTINGS)
def test_activity_streaks_conservation(spark, pairs):
    """Streak lengths per user must partition the distinct active-day
    set: sum(streak lengths) == n distinct days, and the longest
    streak equals the python-computed longest consecutive run."""
    import datetime as dt

    from pyspark.sql import Window

    base = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(days=d)) for u, d in pairs],
        ["user_id", "day"],
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    r = df.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    s = r.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    got = {
        row["user_id"]: (row["total"], row["longest"])
        for row in s.groupBy("user_id")
        .agg(
            F.sum("len").alias("total"), F.max("len").alias("longest")
        )
        .collect()
    }
    bydays: dict = {}
    for u, d in pairs:
        bydays.setdefault(u, set()).add(d)
    for u, days in bydays.items():
        days = sorted(days)
        longest, run = 1, 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            longest = max(longest, run)
        assert got[u] == (len(days), longest), (u, days, got[u])


_VEC_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # vec_id (collisions avoided by unique_by)
        st.tuples(  # 3-dim vectors from a small grid → plenty of near-dups
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
        ),
    ),
    min_size=2,
    max_size=16,
    unique_by=lambda r: r[0],
)


@given(rows=_VEC_ROWS, nparts=st.integers(min_value=1, max_value=3))
@settings(**_SETTINGS)
def test_semdedup_kept_set_is_tau_independent(spark, rows, nparts):
    """The SemDeDup kept set is an independent set under the >tau
    relation within each cluster: if two kept members of one cluster
    exceeded the threshold, the greedy dominator would have dropped
    the later one — for ANY vectors and ANY partitioning."""
    import math

    from rentals_data_pipeline_spark.operators.similarity import (
        semdedup_keep,
    )

    df = spark.createDataFrame(
        [(i, list(v)) for i, v in rows],
        "vec_id long, embedding array<double>",
    ).repartition(nparts)
    out = semdedup_keep(df, n_clusters=2, threshold=0.8).collect()
    assert len(out) == len(rows)  # every non-null vector judged
    vecs = {i: v for i, v in rows}

    def cos4(a, b):
        na, nb = math.hypot(*a), math.hypot(*b)
        if na == 0 or nb == 0:
            return None
        d = sum(x * y for x, y in zip(a, b)) / (na * nb)
        return math.floor(d * 1e4 + 0.5) / 1e4

    kept = [r for r in out if r.kept]
    for i, x in enumerate(kept):
        for y in kept[i + 1:]:
            if x.cluster_id != y.cluster_id:
                continue
            c = cos4(vecs[x.vec_id], vecs[y.vec_id])
            assert c is None or c <= 0.8, (
                f"kept pair {x.vec_id},{y.vec_id} cosine {c} > tau"
            )


_DOC_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # doc_id
        st.lists(  # word-soup from a tiny vocab → cross-doc span dups
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=0,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda r: r[0],
)


@given(docs=_DOC_ROWS, nparts=st.integers(min_value=1, max_value=3))
@settings(**_SETTINGS)
def test_span_rewrite_keeps_exactly_first_instance(spark, docs, nparts):
    """For any corpus and any partitioning: every distinct span content
    survives exactly once, at its minimal (doc_id, span index); every
    document's rewrite is the in-order concatenation of its surviving
    spans."""
    import rentals_data_pipeline_spark.operators.dedup as DD2

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs], "doc_id long, text string"
    ).repartition(nparts)
    out = {r.doc_id: r for r in
           df.transform(DD2.span_dedup_rewrite("doc_id", "text", 3)).collect()}

    # replay the contract in plain python
    spans = []  # (doc_id, g, span)
    for i, ws in sorted(docs):
        ws = [w for w in ws if w]
        for g in range((len(ws) + 2) // 3):
            spans.append((i, g, " ".join(ws[g * 3:g * 3 + 3])))
    first = {}
    for i, g, s in sorted(spans):
        first.setdefault(s, (i, g))
    expect = {}
    for i, g, s in spans:
        e = expect.setdefault(i, {"n": 0, "kept": 0, "texts": []})
        e["n"] += 1
        if first[s] == (i, g):
            e["kept"] += 1
            e["texts"].append((g, s))
    for i, e in expect.items():
        r = out[i]
        assert r.n_spans == e["n"] and r.kept_spans == e["kept"]
        assert r.new_text == " ".join(s for _, s in sorted(e["texts"]))
    assert set(out) == set(expect)  # zero-word docs absent on both sides
