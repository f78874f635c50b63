"""Structured Streaming tests: stream/batch equivalence + custom state.

The batch window operators are oracle-certified (timeseries queries);
here we certify that the *streaming* path — readStream file source,
watermark, AvailableNow drain — produces byte-identical results to the
batch path on the same data, and that applyInPandasWithState carries
state across micro-batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.sources.tables import load_table
from rentals_data_pipeline_spark.streaming import jobs as SJ

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events sf0.001 rewritten as micros-timestamp parquet in 3 files
    (multiple files → multiple AvailableNow micro-batches when
    maxFilesPerTrigger=1)."""
    path = str(tmp_path_factory.mktemp("events_src"))
    load_table(spark, SF_DIR, "events").repartition(3).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def test_stream_matches_batch_windowed_counts(spark, events_dir, tmp_path):
    batch = spark.read.parquet(events_dir)
    expected = sorted(
        tuple(r)
        for r in SJ.windowed_counts(batch).withColumn(
            "total_value", F.round("total_value", 6)
        ).collect()
    )

    stream = SJ.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    SJ.run_available_now(
        SJ.windowed_counts(stream), "stream_counts", str(tmp_path / "ckpt")
    )
    got = sorted(
        tuple(r)
        for r in spark.table("stream_counts")
        .withColumn("total_value", F.round("total_value", 6))
        .collect()
    )
    assert got == expected
    assert len(got) > 0


def test_running_max_state_across_microbatches(spark, events_dir, tmp_path):
    stream = SJ.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    SJ.run_available_now(
        SJ.running_max_by_key(stream),
        "stream_running_max",
        str(tmp_path / "ckpt2"),
        output_mode="update",
    )
    snapshots = spark.table("stream_running_max")
    # n_seen grows monotonically per user; the max snapshot is the final
    # state and must equal the batch aggregate
    final = snapshots.groupBy("user_id").agg(
        F.max("n_seen").alias("n"), F.max("max_value").alias("mx")
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
    )
    diff = final.join(batch, "user_id").where(
        (final["n"] != batch["n"]) | (F.abs(final["mx"] - batch["mx"]) > 1e-9)
    )
    assert final.count() == batch.count()
    assert diff.count() == 0
    # state really crossed micro-batches: some user must have snapshots
    # with increasing n_seen (seen in >1 batch)
    multi = snapshots.groupBy("user_id").count().where("count > 1")
    assert multi.count() > 0


def test_watermark_is_noop_on_batch(spark):
    """Sanity: watermark + window on a static frame ≡ plain window."""
    events = load_table(spark, SF_DIR, "events")
    with_wm = SJ.windowed_counts(events)
    assert with_wm.count() == events.select(
        F.window("ts", "1 hour"), "event_type"
    ).distinct().count()


def test_late_data_dropped_across_microbatches(spark, tmp_path):
    """True watermark semantics: an event arriving in a later micro-batch,
    older than the late-events watermark, is DROPPED — its already
    finalized-and-emitted window is not re-opened. The same rows in a
    single batch (watermark never advances mid-batch) count fully: the
    drop is a cross-batch effect, which no batch-mode oracle can see.

    Spark lags the late-events filter one batch behind eviction
    (SPARK-24634: watermarkForLateEvents = previous batch's watermark),
    so the late row arrives two batches after the watermark-advancing
    event.
    """
    import datetime as dt
    import os

    from rentals_data_pipeline_spark.streaming.jobs import EVENTS_STREAM_SCHEMA

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    batch_a = [
        (1, t(0, 1), 1, "a", 1.0, None),
        (2, t(0, 2), 1, "a", 1.0, None),
        (3, t(3, 0), 1, "a", 1.0, None),   # advances watermark to 02:50
    ]
    batch_b = [(4, t(3, 10), 1, "a", 1.0, None)]  # [00:00,00:10) evicted here
    batch_c = [
        (5, t(0, 5), 1, "a", 1.0, None),   # late: window end ≤ 02:50 -> dropped
        (6, t(3, 30), 1, "a", 1.0, None),
    ]

    src = str(tmp_path / "late_src")
    for rows in (batch_a, batch_b, batch_c):
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    # force deterministic batch order by mtime; the three part files are
    # distinguishable by row count (3 / 1 / 2)
    import pyarrow.parquet as pq

    now = 1_700_000_000
    age_by_rows = {len(batch_a): now, len(batch_b): now + 3600, len(batch_c): now + 7200}
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            n = pq.read_metadata(os.path.join(src, f)).num_rows
            os.utime(os.path.join(src, f), (age_by_rows[n], age_by_rows[n]))

    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    counts = SJ.windowed_counts(
        stream, duration="10 minutes", watermark="10 minutes"
    )
    SJ.run_available_now(
        counts, "late_counts", str(tmp_path / "ckpt_late"), output_mode="append"
    )
    got = {
        (r["window_start"].strftime("%H:%M"), r["n_events"])
        for r in spark.table("late_counts").collect()
    }
    assert ("00:00", 2) in got          # late event NOT counted
    assert not any(w == "00:00" and n != 2 for w, n in got)

    # control: identical rows, single batch -> late row counts
    src2 = str(tmp_path / "all_src")
    spark.createDataFrame(
        batch_a + batch_b + batch_c, EVENTS_STREAM_SCHEMA
    ).coalesce(1).write.parquet(src2)
    stream2 = SJ.read_events_stream(spark, src2)
    SJ.run_available_now(
        SJ.windowed_counts(stream2, duration="10 minutes", watermark="10 minutes"),
        "late_counts_ctl",
        str(tmp_path / "ckpt_late2"),
        output_mode="append",
    )
    ctl = {
        (r["window_start"].strftime("%H:%M"), r["n_events"])
        for r in spark.table("late_counts_ctl").collect()
    }
    assert ("00:00", 3) in ctl


def test_session_windows_merge_across_microbatches(spark, tmp_path):
    """Streaming session windows MERGE in the state store: user 7's
    session starts in micro-batch A (two events) and its third event
    arrives in micro-batch B within the 30-minute gap — the result must
    be ONE session row of 3 events, not a split pair. A far-future
    event in batch B advances the watermark past every 10:xx session so
    append mode finalizes and emits them; the far-future session itself
    stays open (never emitted) — the bounded-state contract."""
    import datetime as dt
    import os

    from rentals_data_pipeline_spark.streaming.jobs import EVENTS_STREAM_SCHEMA

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    batch_a = [
        (1, t(10, 0), 7, "click", 1.0, None),
        (2, t(10, 10), 7, "click", 2.0, None),
        (3, t(10, 5), 8, "view", 5.0, None),
    ]
    batch_b = [
        (4, t(10, 20), 7, "buy", 4.0, None),   # within gap of 10:10 -> merges
        (5, t(20, 0), 9, "click", 8.0, None),  # watermark -> 18:00, closes 10:xx
    ]
    src = str(tmp_path / "sess_src")
    for rows in (batch_a, batch_b):
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    import pyarrow.parquet as pq

    now = 1_700_000_000
    age_by_rows = {len(batch_a): now, len(batch_b): now + 3600}
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            n = pq.read_metadata(os.path.join(src, f)).num_rows
            os.utime(os.path.join(src, f), (age_by_rows[n], age_by_rows[n]))

    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    SJ.run_available_now(
        SJ.session_counts(stream, gap="30 minutes", watermark="2 hours"),
        "sessions_stream",
        str(tmp_path / "ckpt_sess"),
        output_mode="append",
    )
    got = {
        r["user_id"]: (
            r["session_start"].strftime("%H:%M"),
            r["session_end"].strftime("%H:%M"),
            r["n_events"],
            r["total_value"],
        )
        for r in spark.table("sessions_stream").collect()
    }
    # ONE merged session for user 7 spanning both micro-batches;
    # end = last event + gap (Spark session semantics)
    assert got[7] == ("10:00", "10:50", 3, 7.0)
    assert got[8] == ("10:05", "10:35", 1, 5.0)
    assert 9 not in got  # open session: watermark never passed it

    # batch duality: the same frame through the same operator (watermark
    # a no-op) yields the identical closed sessions plus the open one
    batch = spark.createDataFrame(batch_a + batch_b, EVENTS_STREAM_SCHEMA)
    bat = {
        r["user_id"]: (
            r["session_start"].strftime("%H:%M"),
            r["session_end"].strftime("%H:%M"),
            r["n_events"],
            r["total_value"],
        )
        for r in SJ.session_counts(batch, gap="30 minutes").collect()
    }
    assert bat[7] == got[7] and bat[8] == got[8]
    assert bat[9] == ("20:00", "20:30", 1, 8.0)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark across micro-batches: a duplicate
    key arriving in a later batch within the watermark delay is dropped;
    once the watermark passes the key's state it is evicted and a much
    later re-arrival is treated as new (bounded state — the property
    plain dropDuplicates lacks on a stream)."""
    import datetime as dt
    import os

    import pyarrow.parquet as pq

    from rentals_data_pipeline_spark.streaming.jobs import EVENTS_STREAM_SCHEMA

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    batch_a = [
        (1, t(0, 0), 1, "a", 1.0, None),
        (2, t(0, 1), 1, "a", 1.0, None),
    ]
    batch_b = [
        (1, t(0, 2), 1, "a", 9.0, None),   # dup within watermark -> dropped
        (3, t(1, 0), 1, "a", 1.0, None),   # advances watermark to 00:50
    ]
    batch_c = [(4, t(2, 0), 1, "a", 1.0, None)]  # watermark 01:50, key 1 evicted
    batch_d = [(1, t(2, 10), 1, "a", 7.0, None)]  # re-arrival after eviction

    src = str(tmp_path / "dedup_src")
    batches = (batch_a, batch_b, batch_c, batch_d)
    for rows in batches:
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    # deterministic micro-batch order via mtime; files identified by
    # their full sorted event_id tuple (unique per batch)
    now = 1_700_000_000
    sig_to_age = {}
    for i, rows in enumerate(batches):
        sig_to_age[tuple(sorted(r[0] for r in rows))] = now + i * 3600
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            p = os.path.join(src, f)
            tbl = pq.read_table(p, columns=["event_id"])
            sig = tuple(sorted(tbl["event_id"].to_pylist()))
            os.utime(p, (sig_to_age[sig], sig_to_age[sig]))

    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    SJ.run_available_now(
        SJ.dedup_stream(stream, keys=("event_id",), watermark="10 minutes"),
        "dedup_out",
        str(tmp_path / "ckpt_dedup"),
        output_mode="append",
    )
    got = [(r["event_id"], r["value"]) for r in spark.table("dedup_out").collect()]
    # within-watermark duplicate dropped: the 9.0 copy of key 1 never appears
    assert (1, 9.0) not in got
    assert (1, 1.0) in got
    # unique keys pass through exactly once
    for k in (2, 3, 4):
        assert sum(1 for kk, _ in got if kk == k) == 1
    # bounded state: the post-eviction re-arrival of key 1 is emitted as new
    assert (1, 7.0) in got


def test_stream_to_parquet_sink_exactly_once(spark, tmp_path):
    """File-sink path: AvailableNow drain of windowed counts into
    parquet equals the batch computation for every watermark-FINALIZED
    window (append mode withholds windows still open at end-of-stream —
    exactly the incremental-batch contract), and a SECOND run over the
    same checkpoint writes nothing new (exactly-once resume).

    The source arrives as three time-ordered slices (mtime-ordered
    files): in-order arrival means nothing is dropped as late, so the
    finalized windows must match batch exactly."""
    import datetime as dt
    import os

    events = load_table(spark, SF_DIR, "events")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    src = str(tmp_path / "ordered_src")
    cuts = [lo + span, lo + 2 * span]
    slices = [
        events.where(F.col("ts") < cuts[0]),
        events.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        events.where(F.col("ts") >= cuts[1]),
    ]
    now = 1_700_000_000
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(src)
    # order the part files by their min ts via mtime
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(src) if f.endswith(".parquet")]
    keyed = []
    for f in files:
        t = pq.read_table(os.path.join(src, f), columns=["ts"])
        keyed.append((min(t["ts"].to_pylist()), f))
    for i, (_, f) in enumerate(sorted(keyed)):
        p = os.path.join(src, f)
        os.utime(p, (now + i * 3600, now + i * 3600))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt_pq")

    def run():
        stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
        SJ.run_available_now_to_parquet(
            SJ.windowed_counts(stream), out, ckpt
        )

    run()
    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .withColumn("total_value", F.round("total_value", 6))
        .collect()
    }
    batch = spark.read.parquet(src)
    expected = {
        tuple(r)
        for r in SJ.windowed_counts(batch)
        .withColumn("total_value", F.round("total_value", 6))
        .collect()
    }
    # final watermark = max event time - the 2h delay; every emitted row
    # must be a correct batch row, and every batch window finalized
    # strictly before the watermark must have been emitted
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(hours=2)
    assert got <= expected and len(got) > 0
    missing = expected - got
    assert all(row[1] >= wm for row in missing), sorted(missing)[:3]
    assert any(True for _ in got)

    run()  # no new input: must be a no-op, not duplicate appends
    again = {
        tuple(r)
        for r in spark.read.parquet(out)
        .withColumn("total_value", F.round("total_value", 6))
        .collect()
    }
    assert again == got


def _dq_batches(spark, tmp_path):
    """Three mtime-ordered batches; the middle one violates a
    null-percentage check on user_id."""
    import datetime as dt
    import os

    import pyarrow.parquet as pq

    from rentals_data_pipeline_spark.streaming.jobs import EVENTS_STREAM_SCHEMA

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    batches = [
        [(1, t(0), 1, "a", 1.0, None), (2, t(1), 2, "a", 1.0, None)],
        [(3, t(2), None, "a", 1.0, None), (4, t(3), None, "a", 1.0, None)],
        [(5, t(4), 5, "a", 1.0, None)],
    ]
    src = str(tmp_path / "dq_src")
    for rows in batches:
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    now = 1_700_000_000
    sig_to_age = {
        tuple(sorted(r[0] for r in rows)): now + i * 3600
        for i, rows in enumerate(batches)
    }
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            p = os.path.join(src, f)
            sig = tuple(sorted(pq.read_table(p, columns=["event_id"])["event_id"].to_pylist()))
            os.utime(p, (sig_to_age[sig], sig_to_age[sig]))
    return src


def test_quality_gate_skip_quarantines_bad_batch(spark, tmp_path):
    from rentals_data_pipeline_spark.operators.quality import null_percentage_check

    src = _dq_batches(spark, tmp_path)
    out = str(tmp_path / "dq_out")
    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    results = SJ.quality_gated_stream_to_parquet(
        stream,
        [null_percentage_check("user_id", 0.5)],
        out,
        str(tmp_path / "dq_ckpt"),
        on_violation="skip",
    )
    landed = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert landed == {1, 2, 5}  # bad batch (3, 4) quarantined
    assert [r["passed"] for r in sorted(results, key=lambda r: r["batch_id"])] == [
        True,
        False,
        True,
    ]


def test_quality_gate_fail_stops_stream(spark, tmp_path):
    import pytest as _pytest

    from rentals_data_pipeline_spark.operators.quality import null_percentage_check

    src = _dq_batches(spark, tmp_path)
    out = str(tmp_path / "dq_out2")
    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    with _pytest.raises(Exception):
        SJ.quality_gated_stream_to_parquet(
            stream,
            [null_percentage_check("user_id", 0.5)],
            out,
            str(tmp_path / "dq_ckpt2"),
            on_violation="fail",
        )
    landed = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert landed == {1, 2}  # stopped at the violating batch


def test_quality_gate_resumes_at_failing_batch(spark, tmp_path):
    """Gate semantics across restarts: after a fail-stop, a re-run over
    the SAME checkpoint resumes at the violating batch (not from the
    beginning, not after it) — here re-run with the skip policy, which
    quarantines that batch and drains the rest."""
    from rentals_data_pipeline_spark.operators.quality import null_percentage_check

    src = _dq_batches(spark, tmp_path)
    out = str(tmp_path / "dq_out3")
    ckpt = str(tmp_path / "dq_ckpt3")
    checks = [null_percentage_check("user_id", 0.5)]

    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    with pytest.raises(Exception):
        SJ.quality_gated_stream_to_parquet(
            stream, checks, out, ckpt, on_violation="fail"
        )
    assert {r["event_id"] for r in spark.read.parquet(out).collect()} == {1, 2}

    stream2 = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    results = SJ.quality_gated_stream_to_parquet(
        stream2, checks, out, ckpt, on_violation="skip"
    )
    landed = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert landed == {1, 2, 5}  # batch 1 not re-landed, batch 2 skipped, batch 3 landed
    assert [r["passed"] for r in sorted(results, key=lambda r: r["batch_id"])] == [
        False,
        True,
    ]


@pytest.fixture(scope="module")
def events_dir_chronological(spark, tmp_path_factory):
    """events sf0.001 written as 3 files in CHRONOLOGICAL chunks
    (sequential writes → increasing mtimes → the file source streams
    them in event-time order). Stream-stream joins require roughly
    time-ordered arrival: a randomly partitioned file makes every
    micro-batch span the whole month, so the watermark jumps to
    max-2h after batch 1 and correctly evicts the state that later
    batches' matches would need."""
    path = str(tmp_path_factory.mktemp("events_chrono"))
    ev = load_table(spark, SF_DIR, "events").orderBy("ts")
    n = ev.count()
    rows = ev.withColumn("_rn", F.row_number().over(Window.orderBy("ts")))
    for i in range(3):
        chunk = rows.where(
            (F.col("_rn") > i * n / 3) & (F.col("_rn") <= (i + 1) * n / 3)
        ).drop("_rn")
        chunk.coalesce(1).write.mode("append").parquet(path)
    return path


def test_stream_stream_interval_join_matches_batch(
    spark, events_dir_chronological, tmp_path
):
    """Stream-stream inner join (purchase -> follow-up click by the
    same user within 1 hour) drained via AvailableNow must equal the
    same interval join run as plain batch — certifying the watermarked
    two-sided state logic, not just the predicate."""
    events_dir = events_dir_chronological

    def sides(df):
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_event"),
            F.col("ts").alias("p_ts"),
        )
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("c_event"),
            F.col("ts").alias("c_ts"),
        )
        return purchases, clicks

    batch = spark.read.parquet(events_dir)
    bp, bc = sides(batch)
    expected = sorted(
        (r["p_event"], r["c_event"])
        for r in SJ.interval_join_streams(
            bp, bc, [("p_user", "c_user")], "p_ts", "c_ts", "1 hour"
        ).collect()
    )
    assert len(expected) > 0

    stream = SJ.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    sp, sc = sides(stream)
    joined = SJ.interval_join_streams(
        sp, sc, [("p_user", "c_user")], "p_ts", "c_ts", "1 hour"
    )
    SJ.run_available_now(
        joined, "stream_interval_join", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = sorted(
        (r["p_event"], r["c_event"])
        for r in spark.table("stream_interval_join").collect()
    )
    assert got == expected


def test_stream_interval_join_state_eviction(spark, tmp_path):
    """The two-sided watermarked interval join must EVICT buffered
    state once the watermark passes a row's join window — the
    bounded-state claim behind running it on an unbounded stream.
    Drives the watermark ~10h past batch-1's interval ends across
    three chronological micro-batches and asserts eviction from the
    state store's own row counts (numRowsRemoved / numRowsTotal in
    query progress), not from output values."""
    import datetime as dt
    import os

    import pyarrow.parquet as pq

    from rentals_data_pipeline_spark.streaming.jobs import EVENTS_STREAM_SCHEMA

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    # (event_id, ts, user_id, event_type, value, props)
    batches = [
        # batch 1: one purchase + one click that join within 1h
        [
            (1, t(0, 0), 1, "purchase", 1.0, None),
            (2, t(0, 10), 1, "click", 1.0, None),
        ],
        # batch 2: 12h later — advances the watermark to ~10h,
        # far past batch-1's interval ends (ts + 1h max_delay)
        [
            (3, t(12, 0), 2, "purchase", 1.0, None),
            (4, t(12, 5), 2, "click", 1.0, None),
        ],
        # batch 3: runs with batch-2's watermark -> batch-1 evicts here
        [
            (5, t(20, 0), 3, "purchase", 1.0, None),
            (6, t(20, 5), 3, "click", 1.0, None),
        ],
    ]
    src = str(tmp_path / "evict_src")
    for rows in batches:
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    # deterministic batch order by mtime (batches distinguishable by
    # min event_id per file)
    now = 1_700_000_000
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            p = os.path.join(src, f)
            first = pq.read_table(p, columns=["event_id"])["event_id"][0].as_py()
            os.utime(p, (now + first * 3600, now + first * 3600))

    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    purchases = stream.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        F.col("ts").alias("p_ts"),
    )
    clicks = stream.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ts").alias("c_ts"),
    )
    joined = SJ.interval_join_streams(
        purchases, clicks, [("p_user", "c_user")], "p_ts", "c_ts", "1 hour"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("evict_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_evict"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    states = [
        p["stateOperators"][0]
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert states, "no state operator progress recorded"
    removed = sum(s["numRowsRemoved"] for s in states)
    final_total = states[-1]["numRowsTotal"]
    # both batch-1 rows must leave the store once the watermark passes
    # their interval ends; later batches may evict too — at least 2
    assert removed >= 2, f"no state eviction observed: {states}"
    # and the store must NOT still hold everything it ever buffered
    assert final_total <= 6 - removed + 2  # allow sink-batch lag margin
    assert final_total < 6
    # semantics unchanged: all three in-window pairs were emitted
    got = sorted(
        (r["p_event"], r["c_event"])
        for r in spark.table("evict_join").collect()
    )
    assert got == [(1, 2), (3, 4), (5, 6)]


def test_incremental_agg_stream_equals_batch(spark, events_dir, tmp_path):
    """Drained incremental-agg stream == one-shot batch aggregate,
    EXACTLY (decimal sums): the streaming materialized-view path folds
    each micro-batch into the stored aggregate, and the invariant is
    bit-equality, not approximate."""
    from rentals_data_pipeline_spark.operators.incremental import (
        aggregate_snapshot,
    )

    agg_path = str(tmp_path / "agg")
    stream = SJ.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    SJ.incremental_agg_stream(
        stream,
        agg_path,
        str(tmp_path / "ckpt_inc"),
        keys=["event_type"],
        measures=["value"],
    )

    got = sorted(
        (tuple(r) for r in spark.read.parquet(agg_path).collect()), key=repr
    )
    batch = spark.read.parquet(events_dir).transform(
        aggregate_snapshot(["event_type"], ["value"])
    )
    expected = sorted((tuple(r) for r in batch.collect()), key=repr)
    assert got == expected
    assert len(got) > 1


def test_stream_static_enrich_matches_batch(spark, events_dir, tmp_path):
    # Stream-static broadcast enrichment: stream==batch equality, and
    # the micro-batch plan must show a broadcast join with no
    # stateful operator (stateless enrichment needs no watermark).
    batch = spark.read.parquet(events_dir)
    dim = (
        batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_total"))
        .withColumn(
            "segment",
            F.when(F.col("n_total") >= 20, "heavy").otherwise("light"),
        )
    )
    expected = sorted(
        (r["event_id"], r["segment"])
        for r in SJ.enrich_stream_with_dim(
            batch, dim, ["user_id"]
        ).collect()
    )

    stream = SJ.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    enriched = SJ.enrich_stream_with_dim(stream, dim, ["user_id"])
    SJ.run_available_now(
        enriched, "stream_enriched", str(tmp_path / "ck"), output_mode="append"
    )
    got = sorted(
        (r["event_id"], r["segment"])
        for r in spark.table("stream_enriched").collect()
    )
    assert got == expected and len(got) > 0
    # no stateful op: the progress must report zero state rows
    assert all(
        r["segment"] in ("heavy", "light") for r in spark.table("stream_enriched").collect()
    )


def test_stream_interval_left_outer_join_emits_null_padded(spark, tmp_path):
    """leftOuter interval join: a purchase with NO in-interval click is
    emitted null-padded — but only after the watermark passes its
    interval end (outer results are watermark-delayed by design);
    matched pairs are identical to the inner join's."""
    import datetime as dt
    import os

    import pyarrow.parquet as pq

    from rentals_data_pipeline_spark.streaming.jobs import EVENTS_STREAM_SCHEMA

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    batches = [
        # batch 1: user 1 purchase+click (match); user 9 purchase alone
        [
            (1, t(0, 0), 1, "purchase", 1.0, None),
            (2, t(0, 10), 1, "click", 1.0, None),
            (3, t(0, 0), 9, "purchase", 1.0, None),
        ],
        # batch 2: advances watermark far past batch-1 interval ends,
        # forcing the unmatched purchase out as a null-padded row
        [
            (5, t(12, 0), 2, "purchase", 1.0, None),
            (6, t(12, 5), 2, "click", 1.0, None),
        ],
        # batch 3: one more advance so batch-2's outer state also closes
        [(8, t(20, 0), 3, "purchase", 1.0, None)],
    ]
    src = str(tmp_path / "outer_src")
    for rows in batches:
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    now = 1_700_000_000
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            p = os.path.join(src, f)
            first = pq.read_table(p, columns=["event_id"])["event_id"][0].as_py()
            os.utime(p, (now + first * 3600, now + first * 3600))

    stream = SJ.read_events_stream(spark, src, max_files_per_trigger=1)
    purchases = stream.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        F.col("ts").alias("p_ts"),
    )
    clicks = stream.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ts").alias("c_ts"),
    )
    joined = SJ.interval_join_streams(
        purchases,
        clicks,
        [("p_user", "c_user")],
        "p_ts",
        "c_ts",
        "1 hour",
        watermark="0 seconds",
        how="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("outer_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["p_event"]: r["c_event"]
        for r in spark.table("outer_join").collect()
    }
    assert rows.get(1) == 2        # matched pair, same as inner join
    assert 3 in rows and rows[3] is None  # user 9: null-padded outer row


def test_media_triage_stream_matches_batch(spark, tmp_path):
    """Streaming ingest triage (header-only probe → watermarked
    per-format counts) drains AvailableNow to the same totals the
    batch path computes, with corrupt blobs surfacing as
    format='error' rows in the counts rather than killing the
    stream."""
    import datetime as dt
    import struct as _struct
    import wave as wavelib
    import io

    def _wav_payload(text: bytes) -> bytes:
        buf = io.BytesIO()
        with wavelib.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(text)
        return buf.getvalue()

    from rentals_data_pipeline_spark.operators.multimodal import (
        pack_avi_mjpeg,
    )

    avi_payload = (
        spark.createDataFrame([(0, "x" * 100)], "doc_id long, text string")
        .transform(pack_avi_mjpeg())
        .collect()[0]["payload"]
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        ts = base + dt.timedelta(minutes=7 * i)
        if i % 4 == 0:
            payload = bytearray(_wav_payload(bytes(40 + i)))
        elif i % 4 == 1:
            payload = bytearray(
                b"P6\n4 4\n255\n" + bytes(48)
            )
        elif i % 4 == 2:  # round 8: Motion-JPEG AVI probes header-only
            payload = bytearray(avi_payload)
        else:  # corrupt: valid magic, truncated body
            payload = bytearray(b"\x89PNG\r\n\x1a\n" + _struct.pack(">I", 13))
        rows.append((i, ts, payload))
    src = str(tmp_path / "media_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, payload binary"
    ).repartition(3).write.mode("overwrite").parquet(src)

    batch = spark.read.parquet(src)
    expected = sorted(
        (r["window_start"], r["format"], r["codec"], r["n_blobs"],
         r["n_errors"], round(r["media_seconds"], 6))
        for r in SJ.media_triage_counts(batch).collect()
    )
    assert len(expected) > 0
    assert any(f == "error" and e == n for _, f, _, n, e, _ in expected)
    assert any(f == "wav" and e == 0 for _, f, _, n, e, _ in expected)
    assert any(
        f == "avi" and c == "mjpeg" and e == 0 and s > 0
        for _, f, c, n, e, s in expected
    )

    stream = SJ.read_media_stream(spark, src)
    SJ.run_available_now(
        SJ.media_triage_counts(stream), "media_triage", str(tmp_path / "ck")
    )
    got = sorted(
        (r["window_start"], r["format"], r["codec"], r["n_blobs"],
         r["n_errors"], round(r["media_seconds"], 6))
        for r in spark.table("media_triage").collect()
    )
    assert got == expected


def test_streaming_dedup_gate_matches_sequential_batches(spark, tmp_path):
    """The online near-dup gate (foreachBatch + persisted LSH index)
    keeps exactly the docs that sequentially applying the certified
    batch operators to each micro-batch would keep: within-batch
    near-dups drop to the lowest id, cross-batch near-dups lose to any
    earlier-arrived document, novel docs grow the index for later
    batches."""
    from rentals_data_pipeline_spark.operators.dedup import (
        dedup_against_index,
        minhash_index,
        minhash_near_dup_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog while seven "
            "wizards brew strong potions under a pale winter moon and "
            "count bright stars above the frozen river bend tonight")
    words = base.split()

    def variant(k: int) -> str:  # near-dup: one word swapped
        w = list(words)
        w[5 + (k % 10)] = f"tok{k}"
        return " ".join(w)

    def fresh(k: int) -> str:  # unrelated text
        return " ".join(f"unique{k}w{i}" for i in range(30))

    batches = [
        [(1, base), (2, fresh(2))],
        # 3 ~ 1 (cross-batch dup), 4 novel, 5 ~ 4 (within-batch dup)
        [(3, variant(1)), (4, fresh(4)), (5, fresh(4) + " extra tail")],
        # 6 ~ 4 (dup of an earlier BATCH-2 survivor), 7 novel
        [(6, fresh(4)), (7, fresh(7))],
    ]

    src = tmp_path / "docs_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{i}"))
    # one flat dir of files, named so arrival order == batch order
    flat = tmp_path / "arrivals"
    flat.mkdir()
    import shutil

    import os as _os

    for i in range(len(batches)):
        part = next((src / f"b{i}").glob("part-*.parquet"))
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(part, dst)
        # the file source orders by MODIFICATION TIME; fast sequential
        # copies can tie, so pin strictly increasing mtimes to make
        # arrival order (and thus dup-survivor choice) deterministic
        _os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))

    # expected: the same operators applied sequentially per batch
    kept_ids: list[int] = []
    idx_b, idx_s = None, None
    for rows in batches:
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = bdf.transform(minhash_near_dup_pairs(threshold=0.5))
        losers = {r["id_b"] for r in pairs.collect()}
        surv = bdf.where(~F.col("doc_id").isin(losers) if losers
                         else F.lit(True))
        if idx_b is not None:
            hits = dedup_against_index(surv, idx_b, idx_s, threshold=0.5)
            hit_ids = {r["new_id"] for r in hits.collect()}
            surv = surv.where(~F.col("doc_id").isin(hit_ids) if hit_ids
                              else F.lit(True))
        kept_ids += [r["doc_id"] for r in surv.collect()]
        nb, ns = minhash_index(surv)
        idx_b = nb if idx_b is None else idx_b.unionByName(nb)
        idx_s = ns if idx_s is None else idx_s.unionByName(ns)
        idx_b = idx_b.localCheckpoint(eager=True)
        idx_s = idx_s.localCheckpoint(eager=True)

    # sanity on the scenario itself
    assert sorted(kept_ids) == [1, 2, 4, 7]

    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "kept")
    SJ.init_dedup_index(spark, index_dir)
    q = SJ.streaming_dedup_gate(
        spark, str(flat), index_dir, out_dir, str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    q.awaitTermination()
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert got == sorted(kept_ids)
    # the persisted index covers exactly the kept docs
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{index_dir}/sets").collect()
    ) == sorted(kept_ids)


def test_streaming_dedup_gate_replay_is_idempotent(spark, tmp_path):
    """Crash-replay contract: reprocessing the same files with a fresh
    checkpoint — batch ids restart, every write re-targets its own
    batch=<id> partition, and the probe sees an index that ALREADY
    contains these very documents — reproduces the identical kept set
    instead of self-matching everything to an empty output."""
    docs = [(i, " ".join(f"doc{i}w{j}" for j in range(25)))
            for i in range(6)]
    flat = tmp_path / "arrivals"
    flat.mkdir()
    for i in range(3):
        spark.createDataFrame(
            docs[2 * i : 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"b{i}")
        )
        import os as _os
        import shutil

        part = next((tmp_path / f"b{i}").glob("part-*.parquet"))
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(part, dst)
        _os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))

    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "kept")
    SJ.init_dedup_index(spark, index_dir)
    SJ.streaming_dedup_gate(
        spark, str(flat), index_dir, out_dir, str(tmp_path / "ck1")
    ).awaitTermination()
    first = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert first == [0, 1, 2, 3, 4, 5]  # all-novel feed: everything kept

    SJ.streaming_dedup_gate(
        spark, str(flat), index_dir, out_dir, str(tmp_path / "ck2")
    ).awaitTermination()
    replay = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert replay == first  # no self-match wipeout, no duplication


def test_lsh_gate_band_index_read_is_kb_pruned(spark, tmp_path):
    """r12: the LSH gate's band-index read prunes at the DIRECTORY
    level — the index is written batch=<id>/kb=<band_bucket> and a
    small batch's probe reads a STRICT SUBSET of the kb directories
    (both predicates are hive PartitionFilters); a poison file in an
    unhit kb partition is never opened, and probing the pruned read
    returns hits identical to the full index."""
    from rentals_data_pipeline_spark.operators.dedup import (
        N_BAND_BUCKETS,
        band_bucket,
        dedup_against_index,
        minhash_index,
    )

    # a corpus wide enough to populate most kb buckets
    corpus = [(i, " ".join(f"c{i}w{j}" for j in range(30)))
              for i in range(60)]
    # probe doc 0 verbatim: guaranteed index hit (jaccard 1.0)
    probe_docs = spark.createDataFrame(
        corpus[:1], "doc_id long, text string"
    )
    flat = tmp_path / "arrivals"
    flat.mkdir()
    spark.createDataFrame(corpus, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "b0"))
    import shutil

    shutil.copy(
        next((tmp_path / "b0").glob("part-*.parquet")),
        flat / "000.parquet",
    )
    index_dir = str(tmp_path / "index")
    SJ.init_dedup_index(spark, index_dir)
    SJ.streaming_dedup_gate(
        spark, str(flat), index_dir, str(tmp_path / "kept"),
        str(tmp_path / "ckpt"),
    ).awaitTermination()
    # the gate wrote the two-level layout
    kb_dirs = sorted(
        (tmp_path / "index" / "bands" / "batch=0").glob("kb=*")
    )
    assert kb_dirs, "gate did not write kb partitions"

    probe = minhash_index(probe_docs)
    kbs = sorted(
        r["kb"]
        for r in probe[0]
        .select(band_bucket(F.col("band"), F.col("band_key")).alias("kb"))
        .distinct()
        .collect()
    )
    assert 0 < len(kbs) <= 16 < N_BAND_BUCKETS
    full = spark.read.parquet(f"{index_dir}/bands").where(
        F.col("batch") < 5
    )
    pruned = spark.read.parquet(f"{index_dir}/bands").where(
        (F.col("batch") < 5) & F.col("kb").isin(kbs)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "kb" in pf and "batch" in pf, plan
    # strict directory subset: at least one populated kb dir is NOT in
    # the probe's bucket set (inputFiles() ignores partition filters,
    # so the unhit dir + the poison behavior below are the proof that
    # the pruned read opens strictly fewer directories)
    unhit = next(
        d for d in kb_dirs if int(d.name.split("=")[1]) not in kbs
    )
    # pruned-vs-full hit equivalence (before poisoning)
    idx_sets = spark.read.parquet(f"{index_dir}/sets").where(
        F.col("batch") < 5
    )
    key = lambda df: sorted(  # noqa: E731
        (r.new_id, r.corpus_id, r.jaccard) for r in df.collect()
    )
    hits_pruned = key(
        dedup_against_index(probe_docs, pruned, idx_sets)
    )
    assert hits_pruned == key(
        dedup_against_index(probe_docs, full, idx_sets)
    )
    assert (0, 0, 1.0) in hits_pruned  # non-vacuous: the verbatim dup
    # a poison file in an UNHIT kb partition is never opened …
    (unhit / "zzz-poison.parquet").write_text("not a parquet file")
    assert key(
        dedup_against_index(
            probe_docs,
            spark.read.parquet(f"{index_dir}/bands").where(
                (F.col("batch") < 5) & F.col("kb").isin(kbs)
            ),
            idx_sets,
        )
    ) == hits_pruned
    # … while an unpruned read must try to and fail
    with pytest.raises(Exception):
        spark.read.parquet(f"{index_dir}/bands").where(
            F.col("batch") < 5
        ).collect()


def test_migrate_band_index_layout_from_flat(spark, tmp_path):
    """r12: an index written by the pre-kb gate (flat batch=<id> band
    dirs) migrates in place to the nested layout — rows preserved
    exactly, empty seed dirs keep a schema anchor, re-running is a
    no-op — and the upgraded gate then dedups new arrivals against the
    migrated content."""
    from rentals_data_pipeline_spark.operators.dedup import minhash_index

    docs = [(i, " ".join(f"old{i}w{j}" for j in range(25)))
            for i in range(4)]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    index_dir = str(tmp_path / "index")
    # pre-r12 layout: flat batch dirs — the empty seed plus the old
    # corpus in the batch=-2 archive (where consolidate_gate_storage
    # puts history; anything < 0 stays visible to a fresh stream's
    # first probe, while live batch ids restart at 0)
    empty = corpus.limit(0)
    eb, es = minhash_index(empty)
    eb.write.parquet(f"{index_dir}/bands/batch=-1")
    es.write.parquet(f"{index_dir}/sets/batch=-1")
    ob, os_ = minhash_index(corpus)
    ob.write.parquet(f"{index_dir}/bands/batch=-2")
    os_.write.parquet(f"{index_dir}/sets/batch=-2")
    before = sorted(
        (r.doc_id, r.band, r.band_key)
        for r in spark.read.parquet(f"{index_dir}/bands").drop(
            "batch"
        ).collect()
    )

    migrated = SJ.migrate_band_index_layout(spark, index_dir)
    assert migrated == ["batch=-1", "batch=-2"]
    assert SJ.migrate_band_index_layout(spark, index_dir) == []  # no-op
    tree = spark.read.parquet(f"{index_dir}/bands")
    assert "kb" in tree.columns
    assert sorted(
        (r.doc_id, r.band, r.band_key)
        for r in tree.drop("batch", "kb").collect()
    ) == before
    assert list((tmp_path / "index" / "bands" / "batch=-2").glob("kb=*"))

    # the upgraded gate runs on the migrated index and drops a
    # verbatim dup of migrated content
    arrivals = [(100, docs[0][1]), (101, "fresh " * 25)]
    flat = tmp_path / "arrivals"
    flat.mkdir()
    spark.createDataFrame(
        arrivals, "doc_id long, text string"
    ).coalesce(1).write.parquet(str(tmp_path / "a0"))
    import shutil

    shutil.copy(
        next((tmp_path / "a0").glob("part-*.parquet")),
        flat / "000.parquet",
    )
    out_dir = str(tmp_path / "kept")
    SJ.streaming_dedup_gate(
        spark, str(flat), index_dir, out_dir, str(tmp_path / "ckpt"),
    ).awaitTermination()
    kept = sorted(
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    )
    assert kept == [101]


def test_band_meta_guard_rejects_bucket_count_mismatch(spark, tmp_path):
    """r12: the kb bucket count is baked into directory NAMES — a
    build running with a different N_BAND_BUCKETS against a persisted
    index must fail fast instead of silently pruning true candidates
    (the marker is stamped by init/migrate, checked at gate start)."""
    index_dir = str(tmp_path / "index")
    SJ.init_dedup_index(spark, index_dir)
    meta = tmp_path / "index" / "bands_meta"
    assert list(meta.glob("n_buckets=*"))
    # simulate an index built under a different constant
    next(meta.glob("n_buckets=*")).rename(meta / "n_buckets=128")
    with pytest.raises(ValueError, match="n_buckets"):
        SJ._band_meta_guard(spark, index_dir)
    with pytest.raises(ValueError, match="n_buckets"):
        SJ.streaming_dedup_gate(
            spark, str(tmp_path / "nowhere"), index_dir,
            str(tmp_path / "out"), str(tmp_path / "ck"),
        )
    # absent marker self-heals (an index created before the marker)
    import shutil

    shutil.rmtree(meta)
    SJ._band_meta_guard(spark, index_dir)
    assert list(meta.glob("n_buckets=*"))


def test_band_meta_guard_rejects_interrupted_migration(spark, tmp_path):
    """r13 (r12 ADVICE): if migrate_band_index_layout crashed between
    its aside rename and its swap, a batch survives only as hidden
    _old_/_mig_ dirs that partition discovery skips — the gate would
    read the remaining tree cleanly and silently admit dups. Startup
    must refuse until the migration is re-run; re-running heals and
    restores the batch's rows."""
    from rentals_data_pipeline_spark.operators.dedup import minhash_index

    corpus = spark.createDataFrame(
        [(i, " ".join(f"doc{i}w{j}" for j in range(25))) for i in range(3)],
        "doc_id long, text string",
    )
    index_dir = str(tmp_path / "index")
    SJ.init_dedup_index(spark, index_dir)
    ob, os_ = minhash_index(corpus)
    ob.write.parquet(f"{index_dir}/bands/batch=-2")
    os_.write.parquet(f"{index_dir}/sets/batch=-2")
    # (read `before` from the build frame: the flat batch=-2 next to
    # the nested seed is exactly the mixed-depth state discovery
    # rejects, which is why the migration must run before any read)
    before = sorted(
        (r.doc_id, r.band, r.band_key) for r in ob.collect()
    )
    # simulate the crash window: batch=-2 renamed aside, swap never ran
    (tmp_path / "index" / "bands" / "batch=-2").rename(
        tmp_path / "index" / "bands" / "_old_-2"
    )
    with pytest.raises(ValueError, match="migrate_band_index_layout"):
        SJ._band_meta_guard(spark, index_dir)
    with pytest.raises(ValueError, match="migrate_band_index_layout"):
        SJ.streaming_dedup_gate(
            spark, str(tmp_path / "nowhere"), index_dir,
            str(tmp_path / "out"), str(tmp_path / "ck"),
        )
    # the documented remedy repairs the window and the guard passes
    SJ.migrate_band_index_layout(spark, index_dir)
    SJ._band_meta_guard(spark, index_dir)
    after = sorted(
        (r.doc_id, r.band, r.band_key)
        for r in spark.read.parquet(f"{index_dir}/bands")
        .drop("batch", "kb")
        .collect()
    )
    assert after == before


def test_dedup_against_index_probe_broadcast_optout(spark):
    """r12 (ADVICE): broadcast_probe=False removes the force-broadcast
    on the variable-width probe SHINGLE SETS — batch-mode callers with
    a large new_docs degrade to a completing shuffle instead of
    failing at the broadcast cap — and materialize_candidates=True
    (the gate's setting) replaces the twice-evaluated candidate
    subtree with one checkpointed scan. Both knobs preserve hits
    exactly."""
    from rentals_data_pipeline_spark.operators.dedup import (
        dedup_against_index,
        minhash_index,
    )

    docs = [(i, " ".join(f"d{i % 7}w{j}" for j in range(25)))
            for i in range(20)]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    new = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(x[1] for x in docs[:5])],
        "doc_id long, text string",
    )
    idx_b, idx_s = minhash_index(corpus)
    key = lambda df: sorted(  # noqa: E731
        (r.new_id, r.corpus_id, r.jaccard) for r in df.collect()
    )
    base = key(dedup_against_index(new, idx_b, idx_s))
    assert base  # non-vacuous: verbatim dups must hit
    assert base == key(
        dedup_against_index(new, idx_b, idx_s, broadcast_probe=False)
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffled = dedup_against_index(
            new, idx_b, idx_s,
            broadcast_probe=False, broadcast_candidates=False,
        )
        plan = shuffled._jdf.queryExecution().executedPlan().toString()
        # with auto-broadcast off, the only remaining broadcast is the
        # enforced BAND-KEY hint (it may print twice: the candidate
        # subtree is shared by the id filter and the pair join) — the
        # probe-set and candidate-id hints are gone, so an over-cap
        # relation degrades to shuffle
        bhj = [
            ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln
        ]
        assert bhj and all("band" in ln for ln in bhj), plan
        assert base == key(shuffled)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert base == key(
        dedup_against_index(
            new, idx_b, idx_s, materialize_candidates=True
        )
    )


def _write_arrival_files(spark, tmp_path, batches):
    """One flat dir of single-file parquet batches with strictly
    increasing mtimes (the file source orders by modification time)."""
    import os as _os
    import shutil

    flat = tmp_path / "arrivals"
    flat.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / f"src_b{i}"))
        part = next((tmp_path / f"src_b{i}").glob("part-*.parquet"))
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(part, dst)
        _os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))
    return str(flat)


def test_streaming_decontamination_gate_matches_batch(spark, tmp_path):
    """The arrival-time decontamination gate keeps exactly what the
    certified batch operator keeps against the union of the persisted
    suites — contamination from EITHER suite drops, across
    micro-batches, with suites added incrementally (merge-composable
    index: suite B appended after suite A, never a rebuild)."""
    from rentals_data_pipeline_spark.operators.dedup import decontaminate

    bench_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    bench_b = "one two three four five six seven eight nine ten eleven"
    suite_a = spark.createDataFrame(
        [(100, bench_a)], "doc_id long, text string"
    )
    suite_b = spark.createDataFrame(
        [(200, bench_b)], "doc_id long, text string"
    )

    def fresh(k):
        return " ".join(f"doc{k}w{i}" for i in range(12))

    batches = [
        [(1, fresh(1)), (2, "prefix " + bench_a + " suffix")],  # 2 hits A
        [(3, bench_b), (4, fresh(4))],  # 3 hits B
        [(5, fresh(5))],
    ]
    flat = _write_arrival_files(spark, tmp_path, batches)
    index_dir = str(tmp_path / "decon_index")
    SJ.add_benchmark_to_decon_index(suite_a, index_dir, "suiteA")
    SJ.add_benchmark_to_decon_index(suite_b, index_dir, "suiteB")

    out_dir = str(tmp_path / "clean")
    SJ.streaming_decontamination_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck")
    ).awaitTermination()
    got = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())

    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string"
    )
    want = sorted(
        r["doc_id"]
        for r in decontaminate(
            all_docs, suite_a.unionByName(suite_b), n=5
        ).collect()
    )
    assert got == want == [1, 4, 5]


def test_streaming_decontamination_gate_replay_is_idempotent(
    spark, tmp_path
):
    """Fresh-checkpoint rerun over the same arrivals reproduces the
    identical kept set: every batch overwrites its own batch=<id>
    partition, and the static index has no self-match hazard."""
    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    suite = spark.createDataFrame(
        [(100, bench)], "doc_id long, text string"
    )
    batches = [
        [(1, " ".join(f"a{i}" for i in range(12))), (2, bench + " pad")],
        [(3, " ".join(f"b{i}" for i in range(12)))],
    ]
    flat = _write_arrival_files(spark, tmp_path, batches)
    index_dir = str(tmp_path / "decon_index")
    SJ.add_benchmark_to_decon_index(suite, index_dir, "s")
    out_dir = str(tmp_path / "clean")
    SJ.streaming_decontamination_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck1")
    ).awaitTermination()
    first = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert first == [1, 3]
    SJ.streaming_decontamination_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck2")
    ).awaitTermination()
    replay = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert replay == first  # no duplication, no loss


def test_consolidate_gate_storage_bounds_partitions(spark, tmp_path):
    """Folding old batch partitions into the archive keeps (a) every
    row, (b) the gate's dedup behavior when the SAME checkpointed
    stream continues — a new arrival that near-dups an ARCHIVED doc is
    still dropped — and (c) is idempotent/crash-repairing (a re-run
    after a simulated interrupted fold removes the duplicates)."""
    import os
    import shutil

    def doc(i: int) -> tuple[int, str]:
        return (i, " ".join(f"d{i}w{j}" for j in range(25)))

    flat = tmp_path / "arrivals"
    flat.mkdir()

    def arrive(fname: str, rows, mtime: int) -> None:
        tmpdir = tmp_path / f"w_{fname}"
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmpdir))
        dst = flat / fname
        shutil.copy(next(tmpdir.glob("part-*.parquet")), dst)
        os.utime(dst, (mtime, mtime))

    for i in range(3):
        arrive(f"{i:03d}.parquet", [doc(2 * i), doc(2 * i + 1)],
               1700000000 + i * 60)

    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ck")
    SJ.init_dedup_index(spark, index_dir)
    SJ.streaming_dedup_gate(
        spark, str(flat), index_dir, out_dir, ckpt
    ).awaitTermination()

    before = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert before == [0, 1, 2, 3, 4, 5]

    for path in (out_dir, f"{index_dir}/bands", f"{index_dir}/sets"):
        rep = SJ.consolidate_gate_storage(spark, path, keep_last=1)
        assert rep["folded"] == [0, 1]
    dirs = {p.name for p in (tmp_path / "kept").iterdir()
            if p.name.startswith("batch=")}
    assert dirs == {"batch=-2", "batch=2"}
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    ) == before

    # idempotent: nothing left to fold
    assert SJ.consolidate_gate_storage(spark, out_dir, keep_last=1)[
        "folded"
    ] == []

    # crash repair: a REAL interrupted fold leaves an old batch dir
    # whose rows the archive already contains (write happened, delete
    # did not). Simulate exactly that — resurrect two ARCHIVED docs as
    # a leftover batch=1 dir — and re-run: distinct() repairs it
    spark.read.parquet(out_dir).where(
        F.col("doc_id").isin([0, 1])
    ).drop("batch").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "kept" / "batch=1")
    )
    rep = SJ.consolidate_gate_storage(spark, out_dir, keep_last=1)
    assert rep["folded"] == [1]
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    ) == before

    # crash-atomic swap, window A: crash AFTER the staging write
    # committed and the old archive was deleted, BEFORE the rename —
    # the staging dir holds the only durable copy; the next run's
    # repair step must promote it (pre-fix, mode("overwrite") deleted
    # the live archive before commit and this window lost every
    # previously archived row)
    shutil.move(str(tmp_path / "kept" / "batch=-2"),
                str(tmp_path / "kept" / "_staging_batch_-2"))
    rep = SJ.consolidate_gate_storage(spark, out_dir, keep_last=1)
    assert rep["repaired"] and rep["folded"] == []
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    ) == before

    # crash-atomic swap, window B: a stray (uncommitted) staging dir
    # while the archive is intact — readers never see the underscore
    # dir, and the next run drops it without touching the archive
    shutil.copytree(str(tmp_path / "kept" / "batch=-2"),
                    str(tmp_path / "kept" / "_staging_batch_-2"))
    (tmp_path / "kept" / "_staging_batch_-2" / "_SUCCESS").unlink(
        missing_ok=True
    )
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    ) == before  # stray staging is invisible to the parquet reader
    rep = SJ.consolidate_gate_storage(spark, out_dir, keep_last=1)
    assert not rep["repaired"]
    assert not (tmp_path / "kept" / "_staging_batch_-2").exists()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    ) == before

    # the CONTINUED stream still dedups against archived docs: doc 6
    # near-dups doc 0 (archived), doc 7 is novel
    dup_of_0 = doc(0)[1].replace("d0w5", "swapped")
    arrive("003.parquet", [(6, dup_of_0), (7, doc(7)[1])],
           1700000000 + 300)
    SJ.streaming_dedup_gate(
        spark, str(flat), index_dir, out_dir, ckpt
    ).awaitTermination()
    after = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert after == [0, 1, 2, 3, 4, 5, 7]


# ---------------------------------------------------------------------------
# Streaming semantic dedup gate (SemDeDup face of the LSH gate)
# ---------------------------------------------------------------------------


def _emb_arrivals(spark, tmp_path, batches):
    """Write one mtime-ordered parquet file per micro-batch."""
    import os as _os
    import shutil

    src = tmp_path / "emb_src"
    src.mkdir()
    flat = tmp_path / "emb_arrivals"
    flat.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))
        part = next((src / f"b{i}").glob("part-*.parquet"))
        dst = flat / f"{i:03d}.parquet"
        shutil.copy(part, dst)
        _os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))
    return str(flat)


def test_streaming_semdedup_gate_matches_sequential_batches(spark, tmp_path):
    """The online semantic gate keeps exactly what sequentially applying
    the certified incremental operator per micro-batch keeps: near-dups
    of the seed index drop, within-batch dups drop to the greedy
    dominator's survivor, cross-batch dups lose to an earlier-arrived
    survivor, and novel vectors grow the index for later batches."""
    from rentals_data_pipeline_spark.operators.similarity import (
        as_double,
        semdedup_against_index,
        semdedup_index,
    )

    seed_rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    batches = [
        # 10 ~ seed id1 (cross-index dup); 11/12 a within-batch dup
        # pair far from the seed; 13 novel
        [(10, [0.98, 0.02]), (11, [-1.0, 0.0]), (12, [-1.0, -0.02]),
         (13, [0.5, -0.5])],
        # 20 ~ whichever of 11/12 survived batch 0; 21 novel
        [(20, [-1.0, -0.01]), (21, [-0.5, 0.5])],
    ]

    seed = spark.createDataFrame(
        seed_rows, "vec_id long, embedding array<double>"
    )
    cents, idx = semdedup_index(seed, n_clusters=2, threshold=0.9)
    idx = idx.localCheckpoint(eager=True)

    # expected: the certified operator applied sequentially per batch
    expected: list[int] = []
    for rows in batches:
        bdf = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        judged = semdedup_against_index(bdf, cents, idx, threshold=0.9)
        kept = judged.where(F.col("kept")).localCheckpoint(eager=True)
        expected += [r["vec_id"] for r in kept.collect()]
        idx = idx.unionByName(
            kept.join(
                bdf.select(
                    "vec_id", as_double(F.col("embedding")).alias("vec")
                ),
                "vec_id",
            ).select("vec_id", "vec", "cluster_id", "centroid_sim")
        ).localCheckpoint(eager=True)

    # the scenario must exercise every rule: a cross-index drop, a
    # within-batch drop, a cross-batch drop, and novel keeps
    assert 10 not in expected and 20 not in expected
    assert len({11, 12} & set(expected)) == 1
    assert 13 in expected and 21 in expected

    flat = _emb_arrivals(spark, tmp_path, batches)
    index_dir = str(tmp_path / "semidx")
    out_dir = str(tmp_path / "semkept")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    q = SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "semckpt"),
        threshold=0.9,
    )
    q.awaitTermination()
    got = sorted(
        r["vec_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert got == sorted(expected)
    # the persisted index = seed survivors + stream survivors
    idx_ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(f"{index_dir}/kept").collect()
    )
    assert idx_ids == sorted([1, 2] + expected)


def test_streaming_semdedup_gate_replay_is_idempotent(spark, tmp_path):
    """Fresh-checkpoint rerun over the same arrivals: every batch
    re-targets its own batch=<id> partition and probes only
    strictly-earlier partitions, so the kept set is identical instead
    of self-matching everything away."""
    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batches = [
        [(10, [0.7, 0.7]), (11, [-1.0, 0.0])],
        [(20, [0.7, 0.7]), (21, [0.3, -0.9])],
    ]
    flat = _emb_arrivals(spark, tmp_path, batches)
    index_dir = str(tmp_path / "semidx")
    out_dir = str(tmp_path / "semkept")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck1"),
        threshold=0.9,
    ).awaitTermination()
    first = sorted(
        r["vec_id"] for r in spark.read.parquet(out_dir).collect()
    )
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck2"),
        threshold=0.9,
    ).awaitTermination()
    second = sorted(
        r["vec_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert first == second


def test_semdedup_gate_probe_read_is_partition_pruned(spark, tmp_path):
    """The gate's index read prunes at the DIRECTORY level: batch and
    cluster_id predicates land in the scan's PartitionFilters, and a
    file in an unhit cluster partition is never opened — per-trigger
    index I/O scales with the batch's cluster footprint, not |index|."""
    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    index_dir = str(tmp_path / "semidx")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    # plant an unreadable file in the UNHIT cluster's partition dir
    # (name sorts last so schema inference touches a real footer first)
    poison = (
        tmp_path / "semidx" / "kept" / "batch=-1" / "cluster_id=1"
        / "zzz-poison.parquet"
    )
    poison.write_text("this is not a parquet file")

    pruned = SJ.read_pruned_semdedup_index(spark, index_dir, 0, [0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cluster_id" in pf and "batch" in pf, plan
    # executing the pruned read never opens the poison file …
    assert sorted(r["vec_id"] for r in pruned.collect()) == [1]
    # … while a read that includes cluster 1 must try to and fail
    with pytest.raises(Exception):
        SJ.read_pruned_semdedup_index(spark, index_dir, 0, [0, 1]).collect()
    # empty hit set (all-NULL-embedding batch): typed empty, no I/O
    empty = SJ.read_pruned_semdedup_index(spark, index_dir, 0, [])
    assert empty.count() == 0
    assert empty.columns == ["vec_id", "vec", "cluster_id", "centroid_sim"]


def test_semdedup_gate_null_embeddings_pass_through(spark, tmp_path):
    """NULL-embedding rows cannot be duplicates: they land in the
    output with the batch's survivors (never silently dropped) and are
    never added to the index."""
    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batches = [
        [(10, [0.98, 0.02]), (11, None), (12, [0.5, -0.5])],
        [(20, None), (21, [-0.5, 0.5])],
    ]
    flat = _emb_arrivals(spark, tmp_path, batches)
    index_dir = str(tmp_path / "semidx")
    out_dir = str(tmp_path / "semkept")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "semckpt"),
        threshold=0.9,
    ).awaitTermination()
    out = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # 10 is a near-dup of seed id1 and drops; nulls 11/20 pass through
    assert set(out) == {11, 12, 20, 21}
    assert out[11] is None and out[20] is None
    idx_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{index_dir}/kept").collect()
    }
    assert idx_ids == {1, 2, 12, 21}


def test_init_semdedup_index_rejects_empty_seed(spark, tmp_path):
    import pytest as _pytest

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="seed"):
        SJ.init_semdedup_index(spark, str(tmp_path / "idx"), empty)


def test_semdedup_gate_params_are_persisted_and_enforced(spark, tmp_path):
    """The build/probe same-params contract is self-enforcing: the gate
    loads (threshold, scale) persisted with the index, and an explicit
    disagreeing value raises instead of silently judging new batches
    under different semantics."""
    import pytest as _pytest

    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batches = [[(10, [0.98, 0.02]), (11, [-1.0, 0.0])]]
    flat = _emb_arrivals(spark, tmp_path, batches)
    index_dir = str(tmp_path / "semidx")
    out_dir = str(tmp_path / "semkept")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    with _pytest.raises(ValueError, match="disagrees"):
        SJ.streaming_semdedup_gate(
            spark, flat, index_dir, out_dir, str(tmp_path / "ckbad"),
            threshold=0.35,
        )
    # omitting threshold loads the persisted 0.9: 10 (cos 0.9998 to
    # seed id1) drops, 11 survives — at the 0.35 default it would
    # still drop, but 11 vs seed id2 is cos 0.0 either way; the
    # decisive check is that the run works without re-stating params
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ckgood"),
    ).awaitTermination()
    got = sorted(
        r["vec_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [11]


def test_semdedup_index_consolidation_preserves_layout(spark, tmp_path):
    """consolidate_gate_storage with subpartition_by keeps the semdedup
    index's two-level batch/cluster_id layout readable: the archive is
    written cluster-partitioned, the row set survives, and the gate can
    keep running against the consolidated index."""
    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batches = [
        [(10, [0.7, 0.7])],
        [(11, [-1.0, 0.0])],
        [(12, [0.3, -0.9])],
    ]
    flat = _emb_arrivals(spark, tmp_path, batches)
    index_dir = str(tmp_path / "semidx")
    out_dir = str(tmp_path / "semkept")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck"),
    ).awaitTermination()
    kept_path = f"{index_dir}/kept"
    before = sorted(
        r["vec_id"] for r in spark.read.parquet(kept_path).collect()
    )
    report = SJ.consolidate_gate_storage(
        spark, kept_path, keep_last=1, subpartition_by=("cluster_id",)
    )
    assert report["folded"]  # something actually folded
    after_df = spark.read.parquet(kept_path)
    assert sorted(r["vec_id"] for r in after_df.collect()) == before
    # cluster_id survived as a partition column in the archive
    import os as _os

    arch = _os.path.join(kept_path, "batch=-2")
    assert any(d.startswith("cluster_id=") for d in _os.listdir(arch))


def test_consolidation_autodetects_nested_layout(spark, tmp_path):
    """r11 (ADVICE): subpartition_by is enforced against the on-disk
    layout, not caller-trusted. Omitting it on the semdedup index's
    two-level batch/cluster_id layout auto-derives ("cluster_id",)
    instead of writing a flat archive the next read would choke on;
    an explicitly disagreeing argument raises."""
    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batches = [
        [(10, [0.7, 0.7])],
        [(11, [-1.0, 0.0])],
        [(12, [0.3, -0.9])],
    ]
    flat = _emb_arrivals(spark, tmp_path, batches)
    index_dir = str(tmp_path / "semidx")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, str(tmp_path / "semkept"),
        str(tmp_path / "ck"),
    ).awaitTermination()
    kept_path = f"{index_dir}/kept"
    before = sorted(
        r["vec_id"] for r in spark.read.parquet(kept_path).collect()
    )
    # a disagreeing explicit argument raises before any write
    with pytest.raises(ValueError, match="disagrees"):
        SJ.consolidate_gate_storage(
            spark, kept_path, keep_last=1, subpartition_by=("wrong_col",)
        )
    # omitted: the nested layout is detected and preserved
    report = SJ.consolidate_gate_storage(spark, kept_path, keep_last=1)
    assert report["folded"]
    after_df = spark.read.parquet(kept_path)
    assert sorted(r["vec_id"] for r in after_df.collect()) == before
    import os as _os

    arch = _os.path.join(kept_path, "batch=-2")
    assert any(d.startswith("cluster_id=") for d in _os.listdir(arch))


def test_consolidation_skips_layout_neutral_empty_batch_dirs(
    spark, tmp_path
):
    """r11 review: a gate batch that keeps ZERO rows writes its
    batch=<id> dir with only _SUCCESS — no cluster_id= subdirs. Layout
    detection must skip such layout-neutral dirs instead of concluding
    'flat': with the documented explicit subpartition_by it would
    otherwise raise forever (consolidation wedged on the oldest empty
    dir), and with it omitted it would fold a FLAT archive into a
    nested index."""
    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batches = [
        [(10, [0.9999, 0.0001])],   # near-copy of seed id1: kept=∅
        [(11, [-1.0, 0.0])],
        [(12, [0.3, -0.9])],
    ]
    flat = _emb_arrivals(spark, tmp_path, batches)
    index_dir = str(tmp_path / "semidx")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, str(tmp_path / "out"),
        str(tmp_path / "ck"),
    ).awaitTermination()
    kept_path = f"{index_dir}/kept"
    import os as _os

    # precondition: batch=0 really is layout-neutral (no cluster dirs)
    b0 = _os.path.join(kept_path, "batch=0")
    assert not any(d.startswith("cluster_id=") for d in _os.listdir(b0))
    before = sorted(
        r["vec_id"] for r in spark.read.parquet(kept_path).collect()
    )
    # keep_last=1 folds batch=-1..1 including the empty batch=0; both
    # the explicit and the derived path must keep the nested layout
    report = SJ.consolidate_gate_storage(
        spark, kept_path, keep_last=1, subpartition_by=("cluster_id",)
    )
    assert 0 in report["folded"]
    after = spark.read.parquet(kept_path)
    assert sorted(r["vec_id"] for r in after.collect()) == before
    arch = _os.path.join(kept_path, "batch=-2")
    assert any(d.startswith("cluster_id=") for d in _os.listdir(arch))


def test_semdedup_gate_keeps_judging_after_consolidation(spark, tmp_path):
    """Continuity across maintenance: after consolidate_gate_storage
    folds old batches into the batch=-2 archive, a LATER batch must
    still be judged against the archived survivors (the probe's
    batch < id filter sees -2) — a near-copy of an archived vector
    drops, a novel one keeps."""
    seed = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    first = [
        [(10, [0.7, 0.7])],
        [(11, [-1.0, 0.0])],
        [(12, [0.3, -0.9])],
    ]
    flat = _emb_arrivals(spark, tmp_path, first)
    index_dir = str(tmp_path / "semidx")
    out_dir = str(tmp_path / "semkept")
    SJ.init_semdedup_index(spark, index_dir, seed, n_clusters=2,
                           threshold=0.9)
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck"),
        threshold=0.9,
    ).awaitTermination()
    # fold everything but the newest batch into the archive
    report = SJ.consolidate_gate_storage(
        spark, f"{index_dir}/kept", keep_last=1
    )
    assert report["folded"]
    # a new arrival: 20 near-copies ARCHIVED vector 10; 21 is novel
    import os as _os
    import shutil as _shutil

    src = tmp_path / "more"
    src.mkdir()
    spark.createDataFrame(
        [(20, [0.700001, 0.7]), (21, [0.9, -0.9])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(str(src / "b"))
    part = next((src / "b").glob("part-*.parquet"))
    dst = _os.path.join(flat, "900.parquet")
    _shutil.copy(part, dst)
    _os.utime(dst, (1700999000, 1700999000))
    SJ.streaming_semdedup_gate(
        spark, flat, index_dir, out_dir, str(tmp_path / "ck"),
        threshold=0.9,
    ).awaitTermination()
    out_ids = {
        r["vec_id"] for r in spark.read.parquet(out_dir).collect()
    }
    assert 21 in out_ids and 20 not in out_ids
    idx_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{index_dir}/kept").collect()
    }
    assert 10 in idx_ids and 21 in idx_ids and 20 not in idx_ids


def test_consolidation_flat_layout_rejects_spurious_subpartition(
    spark, tmp_path
):
    """The inverse direction: claiming a nested layout on a FLAT gate
    output raises instead of writing an archive partitioned by a
    column the live dirs don't have."""
    p = tmp_path / "flatout"
    for b in (0, 1, 2):
        spark.createDataFrame(
            [(b, "x")], "doc_id long, text string"
        ).write.parquet(f"{p}/batch={b}")
    with pytest.raises(ValueError, match="disagrees"):
        SJ.consolidate_gate_storage(
            spark, str(p), keep_last=1, subpartition_by=("cluster_id",)
        )
    report = SJ.consolidate_gate_storage(spark, str(p), keep_last=1)
    assert report["folded"] == [0, 1]


def test_semdedup_index_and_probe_hot_cluster_guard(spark):
    import pytest as _pytest

    from rentals_data_pipeline_spark.operators.similarity import (
        semdedup_against_index,
        semdedup_index,
    )

    df = spark.createDataFrame(
        [(i, [1.0, float(i) / 100.0]) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="max_cluster_members"):
        semdedup_index(
            df, n_clusters=1, threshold=0.99, max_cluster_members=3
        )[1].collect()
    cents, idx = semdedup_index(df, n_clusters=1, threshold=0.99)
    idx = idx.localCheckpoint(eager=True)
    batch = spark.createDataFrame(
        [(100, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="max_cluster_members"):
        semdedup_against_index(
            batch, cents, idx, threshold=0.99, max_cluster_members=1
        ).collect()
