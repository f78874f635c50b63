"""Structured Streaming entry points.

``readStream`` file-source → the batch window operators from
``streaming/windows.py`` → ``writeStream``. ``Trigger.AvailableNow``
reproduces the reference's periodic-batch semantics (weekly full
reprocess, dags/rental_pipeline_dag.py:52) as an incremental stream:
each run drains whatever files arrived, exactly once, then stops —
which is also what makes the stream/batch equivalence testable.

``running_max_by_key`` shows the custom-stateful path
(``applyInPandasWithState``): per-key state carried across micro-
batches, Arrow-batched, GroupStateTimeout-free for the batch-drain
pattern.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rentals_data_pipeline_spark.streaming import windows as TW

if TYPE_CHECKING:
    import pandas as pd

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events-shaped parquet directory.
    Explicit schema (streams can't infer); maxFilesPerTrigger bounds
    micro-batch size so state and shuffle stay memory-sized at scale."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def windowed_counts(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_by: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time counts with a watermark: late events beyond
    ``watermark`` are dropped and window state is evicted — the bounded-
    state requirement for an unbounded stream. Works on batch frames
    too (watermark is a no-op there), which is how the oracle checks it.
    """
    with_wm = events.withWatermark("ts", watermark)
    return with_wm.transform(
        TW.tumbling(
            "ts",
            duration,
            list(group_by),
            [F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")],
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    group_by: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Event-time SESSION windows on a stream: per group, events gapped
    <= ``gap`` merge into one session whose end is last-event + gap.
    Unlike tumbling windows, session state is mergeable — a session
    whose events arrive in different micro-batches unions in the state
    store (Spark's streaming session-window merge), so out-of-order
    arrival within the watermark cannot split a session. The watermark
    is what closes sessions (append-mode emission) and evicts their
    state; without it an unbounded stream would buffer every open
    session forever. Works on batch frames too (watermark no-op) —
    the merge rule itself is oracle-certified by ts_session_windows."""
    with_wm = events.withWatermark("ts", watermark)
    return with_wm.transform(
        TW.session(
            "ts",
            gap,
            list(group_by),
            [
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            ],
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within an event-time interval: a right
    row matches a left row with the same ``keys`` when it lands in
    ``[left_ts, left_ts + max_delay]``. BOTH sides carry watermarks and
    the join condition bounds event time in BOTH directions — that pair
    of constraints is what lets Spark compute how long to buffer each
    side's state and evict it, keeping state bounded on an unbounded
    stream (an unconstrained stream-stream join buffers everything
    forever). Works identically on batch frames (watermarks are no-ops
    there), which is how the equivalence test certifies it.

    Column names must be disjoint across sides (pre-project, same
    contract as the pair-output batch operators); ``keys`` maps
    left-side to right-side join columns as (left_col, right_col)
    pairs.

    ``how`` extends the same bounded-state machinery to outer joins:
    with ``leftOuter``, a left row with no in-interval partner is
    emitted null-padded — but only once the watermark passes its
    interval end, because until then a matching right row could still
    arrive. Outer results are therefore watermark-delayed by design;
    the eviction test pins that behavior.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (rw[right_ts] >= lw[left_ts]) & (
        rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}")
    )
    for lcol, rcol in keys:
        cond = (lw[lcol] == rw[rcol]) & cond
    return lw.join(rw, cond, how)


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> None:
    """Drain all available input exactly once into an in-memory table
    named ``query_name``, then stop — the AvailableNow analogue of the
    reference's scheduled batch. complete mode for windowed
    aggregations; update for stateful operators."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def quality_gated_stream_to_parquet(
    stream_df: DataFrame,
    checks: list,
    output_dir: str,
    checkpoint_dir: str,
    on_violation: str = "fail",
) -> list[dict]:
    """Stream → per-micro-batch DQ gate → parquet: the streaming
    counterpart of the reference's post-load quality stage
    (dags/rental_pipeline_dag.py DQ task), via ``foreachBatch``.

    Every micro-batch runs the declarative check suite (one agg pass —
    operators/quality.py::run_quality_checks) BEFORE its rows land.
    ``on_violation="fail"`` stops the stream on a failing batch —
    nothing from that batch is committed, and the checkpoint restarts
    AT the failing batch after the upstream issue is fixed (gate
    semantics). ``"skip"`` quarantines the whole batch (drops it from
    the sink, records the violation) and keeps draining — triage
    semantics. Returns the per-batch DQ result dicts.

    foreachBatch is the right seam: the gate is plain batch code (same
    checks, same single-agg execution), and the sink write happens
    inside the same epoch, so gating and landing stay atomic per batch.
    """
    from rentals_data_pipeline_spark.operators.quality import (
        DataQualityError,
        run_quality_checks,
    )

    if on_violation not in ("fail", "skip"):
        raise ValueError("on_violation must be 'fail' or 'skip'")
    results: list[dict] = []

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        try:
            res = run_quality_checks(batch_df, checks)
        except DataQualityError:
            if on_violation == "fail":
                raise
            results.append({"batch_id": batch_id, "passed": False})
            return
        res["batch_id"] = batch_id
        res["passed"] = True
        results.append(res)
        batch_df.write.mode("append").parquet(output_dir)

    q = (
        stream_df.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except Exception:
        if on_violation == "fail":
            raise
    return results


def run_available_now_to_parquet(
    stream_df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
) -> None:
    """Drain all available input exactly once into a parquet directory —
    the production sink (the memory sink in ``run_available_now`` is
    for tests). The file sink is append-only and exactly-once: the
    checkpoint records which source files each batch consumed and the
    sink's _spark_metadata commits each batch's output files
    atomically, so a crashed run resumes without duplicating or losing
    rows. Append output mode means watermark-finalized results only —
    the right contract for an incremental batch feeding a downstream
    table."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark``.

    Plain ``dropDuplicates`` on a stream keeps every key it has ever
    seen — state grows without bound. Within-watermark dedup keeps a
    key's state only while a duplicate could still arrive inside the
    watermark delay, then evicts it: the streaming counterpart of the
    batch exact-dedup family (D1/``dedup_exact_documents``) that an
    ingest pipeline runs in front of the corpus store. Duplicates whose
    event times differ by less than the delay are guaranteed deduped;
    a key re-arriving after eviction is treated as new (the documented
    at-least-once boundary — downstream batch dedup remains the final
    authority, this stage just keeps the volume down cheaply).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


_RUNNING_MAX_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_RUNNING_MAX_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("mx", T.DoubleType())]
)


def _running_max_fn(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, mx = state.get if state.exists else (0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, mx))
    yield pd.DataFrame({"user_id": [key[0]], "n_seen": [n], "max_value": [mx]})


def running_max_by_key(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, max(value))
    via applyInPandasWithState — state survives across micro-batches;
    each batch emits the updated snapshot per key seen."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_max_fn,
            outputStructType=_RUNNING_MAX_SCHEMA,
            stateStructType=_RUNNING_MAX_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def incremental_agg_stream(
    stream_df: DataFrame,
    agg_path: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: list[str],
) -> None:
    """Maintain a stored per-group aggregate table from an append
    stream: each micro-batch folds its rows into the aggregate via
    ``operators/incremental.py::incremental_agg_update`` (signed-delta
    merge, decimal-exact) inside ``foreachBatch`` — the streaming
    materialized-view pattern.  Work per epoch is |groups| + |batch|,
    never the full fact history; the decimal sums make "drained stream
    == one-shot batch aggregate" an exact testable invariant
    (tests/test_streaming.py).

    Exactly-once caveat (documented, inherent to a plain parquet
    target): a crash between the sink write and the checkpoint commit
    replays the batch into the already-merged aggregate.  On a
    transactional table format the merge and the batch id land in one
    commit; with plain parquet, production would stamp the max merged
    batch_id next to the aggregate and skip replays.  The AvailableNow
    drain used here (and by the reference's periodic-batch cadence)
    completes or is re-run from scratch, so the invariant holds.
    """
    from pyspark.errors import AnalysisException

    from rentals_data_pipeline_spark.operators.incremental import (
        aggregate_snapshot,
        incremental_agg_update,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            base = spark.read.parquet(agg_path)  # raises if absent (lazy-safe: path check is eager)
        except AnalysisException:  # first batch: no aggregate yet
            merged = batch_df.transform(aggregate_snapshot(keys, measures))
        else:
            merged = incremental_agg_update(
                base,
                removed=batch_df.limit(0),
                added=batch_df,
                keys=keys,
                measures=measures,
            )
        # materialize before overwriting the path being read
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(agg_path)

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch hash-joins
    against a STATIC (batch) dimension — the standard streaming-ETL
    lookup (user profile, device registry, geo table). The static side
    broadcasts, so the join is stateless and watermark-free: no
    stream-stream state store, no eviction policy, each micro-batch is
    an independent broadcast hash join — which is why this is the
    FIRST choice for stream enrichment and a stream-stream join the
    last. The dim is re-read per micro-batch by Spark's planner (a
    parquet-backed dim picks up slowly-changing refreshes between
    batches; pin a cached df for a frozen dim). Works identically on a
    batch frame, which is how the equivalence test certifies it."""
    return stream.join(F.broadcast(dim), on, how)


MEDIA_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_media_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of (doc_id, ts, payload) parquet — the
    arrival feed of a media ingest pipeline."""
    return spark.readStream.schema(MEDIA_STREAM_SCHEMA).parquet(input_dir)


def media_triage_counts(
    media: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming ingest triage: header-only probe of every arriving
    blob (``operators/multimodal.py::probe_media`` — format, codec,
    duration, never a payload byte), then watermarked tumbling counts
    per (format, codec) with error totals and summed media seconds.
    The probe is an Arrow ``mapInPandas`` stage, so it runs inside the
    micro-batch with no extra shuffle; the event-time column rides
    through it via ``passthrough`` so the watermark and window bind to
    ARRIVAL time, not probe time. Corrupt blobs land in the counts as
    ``format='error'`` rows — a poisoned feed shows up as a spike on
    the triage dashboard, not a dead stream. Works identically on a
    batch frame (watermark is a no-op there), which is how the test
    pins stream/batch equivalence."""
    from rentals_data_pipeline_spark.operators.multimodal import probe_media

    probed = probe_media(media, passthrough=("ts",))
    failed = F.col("probe_error").isNotNull()
    shaped = probed.select(
        "ts",
        # 'error' marks FAILED probes only; a successful probe with no
        # recognized codec (Ogg carrying Speex, MP4 without an stsd
        # fourcc) is 'unknown' — a healthy-but-unrecognized feed must
        # stay distinguishable from a poisoned one, which is the
        # separation this job exists to provide
        F.coalesce("format", F.when(failed, F.lit("error")).otherwise("unknown")).alias(
            "format"
        ),
        F.coalesce("codec", F.when(failed, F.lit("error")).otherwise("unknown")).alias(
            "codec"
        ),
        failed.cast("int").alias("is_error"),
        F.coalesce("duration_s", F.lit(0.0)).alias("duration_s"),
    )
    with_wm = shaped.withWatermark("ts", watermark)
    return with_wm.transform(
        TW.tumbling(
            "ts",
            duration,
            ["format", "codec"],
            [
                F.count(F.lit(1)).alias("n_blobs"),
                F.sum("is_error").alias("n_errors"),
                F.sum("duration_s").alias("media_seconds"),
            ],
        )
    )


DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def init_dedup_index(spark: SparkSession, index_dir: str) -> None:
    """Seed an empty persisted LSH index (bands + sets parquet) so the
    first micro-batch of ``streaming_dedup_gate`` has something to
    probe."""
    from rentals_data_pipeline_spark.operators.dedup import minhash_index

    empty = spark.createDataFrame([], DOCS_STREAM_SCHEMA)
    bands, sets = minhash_index(empty)
    # batch=-1 seeds the hive-partitioned layout the gate writes into:
    # each micro-batch owns the batch=<id> subdir, so a checkpoint
    # REPLAY overwrites its own partition instead of appending twice.
    # bands carry a second kb=<bucket> level (band_bucket of the band
    # key) so a probe's bounded band-key set DIRECTORY-PRUNES the
    # index scan; the seed pins that depth with a schema-bearing empty
    # file (partition discovery rejects mixed directory depths)
    bands.write.mode("overwrite").parquet(
        f"{index_dir}/bands/batch=-1/kb=0"
    )
    sets.write.mode("overwrite").parquet(f"{index_dir}/sets/batch=-1")
    _band_meta_guard(spark, index_dir)


def _band_meta_guard(spark: SparkSession, index_dir: str) -> None:
    """Pin the kb bucket count a persisted band index was built with.

    ``band_bucket`` bakes N_BAND_BUCKETS into the DIRECTORY NAMES —
    unlike num_hashes/bands it leaves no trace in the rows — so a
    later build running with a different constant would compute probe
    buckets the index dirs don't use and silently prune away true
    candidates (recall loss with no error and no test signal). The
    count is recorded as an empty marker dir
    ``<index_dir>/bands_meta/n_buckets=<N>`` by init/migrate; this
    guard raises on mismatch and self-heals an absent marker (an
    index created before the marker existed) by adopting the current
    constant.

    Also refuses to run over an interrupted migration (r12 ADVICE): if
    ``migrate_band_index_layout`` crashed between its aside rename and
    its swap, a batch exists ONLY as hidden ``_mig_``/``_old_`` dirs —
    Spark's partition discovery skips underscore-prefixed paths, so the
    gate would read the remaining tree cleanly and silently probe
    without that batch's index rows (dup docs admitted, no error).
    Re-running the migration repairs every such window at entry."""
    from rentals_data_pipeline_spark.operators.dedup import N_BAND_BUCKETS

    jvm = spark._jvm
    meta = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/bands_meta")
    fs = meta.getFileSystem(spark._jsc.hadoopConfiguration())
    bands = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/bands")
    if fs.exists(bands):
        # ANY underscore-hidden directory here is index data partition
        # discovery will skip: _mig_/_old_ from an interrupted
        # migrate_band_index_layout, _staging_* from an interrupted
        # consolidate_gate_storage, _temporary from a crashed write.
        # Each tool's own entry repair heals its windows — the gate
        # must refuse to probe past them, not silently admit dups.
        stray = [
            st.getPath().getName()
            for st in fs.listStatus(bands)
            if st.isDirectory()
            and st.getPath().getName().startswith("_")
        ]
        if stray:
            raise ValueError(
                f"band index at {index_dir} has leftover hidden dirs "
                f"{sorted(stray)} — an interrupted migration/"
                f"consolidation/write; probing now would silently "
                f"skip those batches' index rows. Re-run the owning "
                f"tool (migrate_band_index_layout for _mig_/_old_, "
                f"consolidate_gate_storage for _staging_ — both "
                f"repair their crash windows at entry) before "
                f"starting the gate"
            )
    if fs.exists(meta):
        vals = [
            st.getPath().getName().split("=", 1)[1]
            for st in fs.listStatus(meta)
            if st.getPath().getName().startswith("n_buckets=")
        ]
        if vals and vals != [str(N_BAND_BUCKETS)]:
            raise ValueError(
                f"band index at {index_dir} was bucketed with "
                f"n_buckets={vals} but this build uses "
                f"{N_BAND_BUCKETS}; probing would silently prune true "
                f"candidates — rebuild or re-migrate the index"
            )
        if vals:
            return
    fs.mkdirs(
        jvm.org.apache.hadoop.fs.Path(
            f"{index_dir}/bands_meta/n_buckets={N_BAND_BUCKETS}"
        )
    )


def migrate_band_index_layout(spark: SparkSession, index_dir: str) -> list:
    """One-shot migration of a pre-r12 band index (flat ``batch=<id>``
    dirs) to the ``batch=<id>/kb=<bucket>`` layout the r12 gate reads
    and writes. Spark's partition discovery REJECTS mixed directory
    depths outright, so a deployment restarting the upgraded gate on
    an index written by the old code must run this once first (the
    gate's first new trigger would otherwise fail the whole tree's
    read). Idempotent: batch dirs that already carry ``kb=`` children
    are skipped. Crash discipline (same as
    ``consolidate_gate_storage`` — a recursive delete is NOT atomic,
    so the source is never deleted while it is the only complete
    copy): each flat dir is staged to ``_mig_<id>``, the source is
    renamed aside to ``_old_<id>`` (O(1)), the staging dir is renamed
    in, and only then is the aside copy deleted. Every crash window
    is repaired at entry: a staging dir with no live target promotes,
    a stray one drops; an aside dir with a live target drops, an
    orphaned one restores. A zero-row dir is rewritten as a
    schema-bearing empty file under ``kb=0`` so it keeps anchoring
    schema inference, exactly like the ``init_dedup_index`` seed.
    Returns the migrated batch ids and stamps the bucket-count marker
    (``_band_meta_guard``)."""
    from rentals_data_pipeline_spark.operators.dedup import band_bucket

    jvm = spark._jvm
    bands_dir = f"{index_dir}/bands"
    root = jvm.org.apache.hadoop.fs.Path(bands_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    def _path(rel: str):
        return jvm.org.apache.hadoop.fs.Path(f"{bands_dir}/{rel}")

    # hidden dir names carry the batch id with NO "=" (a "=" in any
    # dir name is parsed as a partition column — same rule as
    # consolidate_gate_storage's staging dir)
    names = [st.getPath().getName() for st in fs.listStatus(root)]
    # repair interrupted runs: staging dirs first (a complete copy
    # promotes into a missing target), then aside dirs (drop when the
    # target is live, restore when orphaned)
    for name in names:
        if name.startswith("_mig_"):
            target = _path(f"batch={name[len('_mig_'):]}")
            if not fs.exists(target):
                if not fs.rename(_path(name), target):
                    raise OSError(f"migration repair rename failed: {name}")
            else:
                fs.delete(_path(name), True)
    for name in names:
        if name.startswith("_old_"):
            target = _path(f"batch={name[len('_old_'):]}")
            if fs.exists(target):
                fs.delete(_path(name), True)
            elif not fs.rename(_path(name), target):
                raise OSError(f"migration repair rename failed: {name}")

    migrated = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch="):
            continue
        batch_id = name.split("=", 1)[1]
        children = [
            c.getPath().getName() for c in fs.listStatus(st.getPath())
        ]
        if any(c.startswith("kb=") for c in children):
            continue  # already nested
        df = spark.read.parquet(f"{bands_dir}/{name}")
        staging = f"{bands_dir}/_mig_{batch_id}"
        if df.isEmpty():
            df.write.mode("overwrite").parquet(f"{staging}/kb=0")
        else:
            df.withColumn(
                "kb", band_bucket(F.col("band"), F.col("band_key"))
            ).write.partitionBy("kb").mode("overwrite").parquet(staging)
        # swap: source aside (O(1)) -> staging in -> drop aside; the
        # source is never deleted while it is the only complete copy
        aside = _path(f"_old_{batch_id}")
        if not fs.rename(st.getPath(), aside):
            raise OSError(f"migration aside rename failed: {name}")
        if not fs.rename(_path(f"_mig_{batch_id}"), st.getPath()):
            raise OSError(f"migration swap rename failed: {name}")
        fs.delete(aside, True)
        migrated.append(name)
    _band_meta_guard(spark, index_dir)
    return sorted(migrated)


def streaming_dedup_gate(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
):
    """Online near-dup gate for an arriving corpus: each micro-batch is
    (1) deduped WITHIN itself (``minhash_near_dup_pairs`` — keep the
    lowest doc_id of every near-dup pair), (2) probed against the
    PERSISTED LSH index (``dedup_against_index`` — the batch's band
    keys and candidate sliver carry enforced broadcast hints, so the
    index relations are STREAMED and never shuffled or built into a
    hash relation, regardless of size estimates; pinned by plan test),
    then (3) the novel survivors append to ``output_dir`` and their
    index rows append to the index — so the next batch probes a corpus
    that includes this one. Per-trigger band-index cost is ONE
    DIRECTORY-PRUNED columnar scan, run ONCE (r12): band keys can't
    prune on band number (every batch hits all 16 bands), but they DO
    prune on band-KEY hash bucket — index bands are written
    ``batch=<id>/kb=<band_bucket(band, band_key)>`` and the probe
    reads only the ≤ |batch|×bands kb directories its own band keys
    land in (both predicates are hive PartitionFilters; pinned by a
    poison-file test and a pruned-vs-full equivalence test), and the
    candidate pairs are materialized before the id filter derives from
    them, so the band join runs once per trigger, not twice. The sets
    index pays one candidate-semi-joined scan per trigger. Amortize
    further by batching triggers larger or consolidating the index
    with ``consolidate_gate_storage`` (fewer, larger files; the kb
    layout is auto-detected and preserved under ``batch=-2``). An
    index written by the pre-kb gate (flat ``batch=<id>`` dirs) must
    run :func:`migrate_band_index_layout` once before the upgraded
    gate restarts on it — partition discovery rejects mixed depths.

    The index lives in STORAGE (parquet bands + shingle sets), not in
    executor state: at 100 TB the corpus index is itself TB-scale, far
    beyond ``applyInPandasWithState``'s per-key memory model, and
    storage-resident state is exactly what survives executor loss and
    cluster restarts. ``foreachBatch`` supplies the transactional
    seam: the streaming checkpoint replays an interrupted batch, and
    because every write targets the batch's OWN ``batch=<id>``
    partition with overwrite (never a blind append), the replay is
    idempotent — exactly-once output without a table format. Every
    operator inside the batch is the already-certified batch
    implementation (operators/dedup.py — same recall as pairing over
    the unioned corpus, pinned by the batch equivalence test).
    AvailableNow + maxFilesPerTrigger=1 makes arrival order — and
    therefore which member of a cross-batch dup pair survives —
    deterministic (the file source orders by MODIFICATION time;
    equal mtimes tie-break arbitrarily, so a real feed should stamp
    arrival order into the mtime or run one-file batches)."""
    from rentals_data_pipeline_spark.operators.dedup import (
        band_bucket,
        dedup_against_index,
        minhash_index,
        minhash_near_dup_pairs,
    )

    # fail fast if the persisted index was bucketed with a different
    # N_BAND_BUCKETS — a mismatch would silently prune true candidates
    _band_meta_guard(spark, index_dir)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # file-source
        # lineage is not re-resolvable inside foreachBatch joins
        pairs = batch_df.transform(
            minhash_near_dup_pairs(threshold=threshold)
        )
        losers = pairs.select(
            F.greatest("id_a", "id_b").alias("doc_id")
        ).distinct()
        survivors = batch_df.join(losers, "doc_id", "left_anti")
        # the probe's minhash index is built ONCE (checkpointed) —
        # it feeds the prune-key collect AND both probe-side joins
        probe = minhash_index(survivors, checkpoint=True)
        # bounded collect: <= N_BAND_BUCKETS distinct bucket ints
        kbs = [
            r["kb"]
            for r in probe[0]
            .select(band_bucket(F.col("band"), F.col("band_key")).alias("kb"))
            .distinct()
            .collect()
        ]
        if kbs:
            # probe only STRICTLY-EARLIER batch partitions AND only
            # the kb directories this batch's band keys land in —
            # both hive partition filters, so the scan is pruned at
            # the directory listing. batch < batch_id is what makes
            # replay idempotent: a batch that crashed after writing
            # its own index partition would otherwise SELF-MATCH on
            # replay and overwrite its output with an empty partition.
            idx_bands = sp.read.parquet(f"{index_dir}/bands").where(
                (F.col("batch") < batch_id) & F.col("kb").isin(kbs)
            )
            idx_sets = sp.read.parquet(f"{index_dir}/sets").where(
                F.col("batch") < batch_id
            )
            hits = dedup_against_index(
                survivors,
                idx_bands,
                idx_sets,
                threshold=threshold,
                materialize_candidates=True,
                probe_index=probe,
            )
            novel = survivors.join(
                hits.select(F.col("new_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            )
        else:
            # no probe band keys (every survivor shorter than the
            # shingle width, or empty batch): nothing can match
            novel = survivors
        novel = novel.localCheckpoint(
            eager=True
        )  # one computation feeds 3 writes
        novel.write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}"
        )
        # the index rows for novel are a SUBSET of the checkpointed
        # probe index (minhash_index is a pure per-doc map, pinned by
        # the append-composability test) — semi-join the survivors'
        # sliver out instead of re-shingling the batch (r12 review:
        # the second minhash pass was the dominant duplicate cost in
        # the common mostly-novel case)
        novel_ids = novel.select("doc_id")
        nb = probe[0].join(novel_ids, "doc_id", "left_semi")
        ns = probe[1].join(novel_ids, "doc_id", "left_semi")
        nb.withColumn(
            "kb", band_bucket(F.col("band"), F.col("band_key"))
        ).write.partitionBy("kb").mode("overwrite").parquet(
            f"{index_dir}/bands/batch={batch_id}"
        )
        ns.write.mode("overwrite").parquet(
            f"{index_dir}/sets/batch={batch_id}"
        )

    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def add_benchmark_to_decon_index(
    benchmark: DataFrame,
    index_dir: str,
    suite: str,
    n: int = 5,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> None:
    """Append one eval suite to a persisted decontamination index —
    the incremental story :func:`streaming_dedup_gate`'s LSH index
    already has, for the Bloom path: each suite owns its
    ``suite=<name>`` partition under ``<index_dir>/bloom`` and
    ``<index_dir>/digests`` (``operators/dedup.py::bloom_decon_index``
    builds the rows), so adding a benchmark is a partition write —
    never a rebuild over every benchmark ever ingested — and re-running
    the same suite overwrites only its own partition (idempotent).
    ``load_decon_index`` folds the partitions at read time:
    ``bit_or`` merge makes index(A union B) == merge(index(A),
    index(B)) exactly (pinned by property test). All suites must share
    (n, m_bits, k_hashes); ``suite`` must be a path-safe name."""
    from rentals_data_pipeline_spark.operators.dedup import bloom_decon_index

    bloom, digests = bloom_decon_index(
        benchmark, n=n, m_bits=m_bits, k_hashes=k_hashes
    )
    bloom.write.mode("overwrite").parquet(
        f"{index_dir}/bloom/suite={suite}"
    )
    digests.write.mode("overwrite").parquet(
        f"{index_dir}/digests/suite={suite}"
    )


def load_decon_index(
    spark: SparkSession, index_dir: str
) -> "tuple[DataFrame, DataFrame]":
    """(bloom, digests) from a persisted decontamination index: the
    per-suite bloom partitions fold by ``bit_or`` into one relation
    (``merge_bloom_relations`` semantics — m_bits/64 rows per suite,
    map-side combined), digests by union + distinct."""
    bloom = (
        spark.read.parquet(f"{index_dir}/bloom")
        .groupBy("bloom_word")
        .agg(F.bit_or("bloom_bits").alias("bloom_bits"))
    )
    digests = spark.read.parquet(f"{index_dir}/digests").select("d").distinct()
    return bloom, digests


def streaming_decontamination_gate(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    n: int = 5,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    max_files_per_trigger: int = 1,
):
    """Arrival-time benchmark decontamination — the streaming face of
    ``decontaminate_bloom``, parity with ``streaming_dedup_gate``:
    every arriving micro-batch of documents is probed against the
    PERSISTED suite-partitioned Bloom index
    (:func:`add_benchmark_to_decon_index`) and only uncontaminated
    docs land in ``output_dir``. Output is byte-identical to running
    the certified batch operator on each batch (the bloom admits no
    false negatives; the exact digest semi-join re-verifies the
    bloom-positive sliver).

    The index is STATIC per run (benchmarks change by suite appends,
    not per batch), so it loads and folds ONCE, eagerly checkpointed —
    each micro-batch pays k broadcast probes, never an index rebuild
    or re-read. Replay is idempotent the same way the dedup gate's is:
    every batch writes its own ``batch=<id>`` partition with
    overwrite, so a checkpoint replay (or a full fresh-checkpoint
    rerun) overwrites rather than duplicates; unlike the dedup gate
    there is no self-match hazard because the gate never writes to the
    index it probes. (n, m_bits, k_hashes) must match the values the
    index was built with.

    REPLAY CONTRACT (the limit of per-batch overwrite idempotency):
    overwrite targets only the CURRENT run's ``batch=<id>`` dirs, so a
    fresh-checkpoint rerun over the same ``output_dir`` is clean only
    when the file-to-batch assignment is identical — same
    ``max_files_per_trigger``, same input file set. Changing the
    trigger size (or rerunning after new files shifted batch
    boundaries) can leave STALE ``batch=<id>`` partitions from the
    previous assignment sitting next to the new ones. For a
    different-assignment rerun, clear ``output_dir`` first (or write
    to a fresh dir); a checkpointed restart never hits this because
    the checkpoint pins the assignment."""
    from rentals_data_pipeline_spark.operators.dedup import (
        decontaminate_with_index,
    )

    bloom, digests = load_decon_index(spark, index_dir)
    bloom = bloom.localCheckpoint(eager=True)
    digests = digests.localCheckpoint(eager=True)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)  # file-source
        # lineage is not re-resolvable inside foreachBatch joins
        clean = decontaminate_with_index(
            batch_df, bloom, digests,
            n=n, m_bits=m_bits, k_hashes=k_hashes,
        )
        clean.write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}"
        )

    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _detect_nested_partitions(
    fs, jvm, dir_path: str
) -> tuple[tuple[str, ...], bool]:
    """Walk the ``<col>=<val>`` directory chain under ``dir_path`` and
    return ``(nested hive partition columns in order, has_content)``.
    ``has_content`` is False for a LAYOUT-NEUTRAL dir — neither
    partition subdirs nor data files (a gate batch that kept zero rows
    writes only ``_SUCCESS``); such dirs carry no layout evidence and
    the caller must skip them instead of concluding "flat" (which
    would either wedge consolidation against a correct explicit
    ``subpartition_by`` or fold a flat archive into a nested index).
    One representative child per level suffices: hive layouts are
    homogeneous by construction, and a level mixing different
    ``<col>=`` names is already unreadable — raised here with the
    offending names rather than downstream as a parquet discovery
    error."""
    cols: list[str] = []
    cur = jvm.org.apache.hadoop.fs.Path(dir_path)
    has_content = False
    while True:
        entries = list(fs.listStatus(cur))
        if any(
            not st.isDirectory()
            and not st.getPath().getName().startswith(("_", "."))
            for st in entries
        ):
            has_content = True
        part_dirs = [
            st.getPath()
            for st in entries
            if st.isDirectory()
            and "=" in st.getPath().getName()
            and not st.getPath().getName().startswith(("_", "."))
        ]
        if not part_dirs:
            return tuple(cols), has_content
        has_content = True
        names = {p.getName().split("=", 1)[0] for p in part_dirs}
        if len(names) != 1:
            raise ValueError(
                f"conflicting nested partition columns {sorted(names)} "
                f"under {cur}"
            )
        cols.append(names.pop())
        cur = part_dirs[0]


def consolidate_gate_storage(
    spark: SparkSession,
    path: str,
    keep_last: int = 2,
    key: str = "batch",
    archive_value: int = -2,
    target_file_bytes: int = 128 * 1024 * 1024,
    subpartition_by: tuple[str, ...] = (),
) -> dict:
    """Maintenance for ``streaming_dedup_gate`` storage (output corpus
    or either index dir): fold every batch partition older than the
    newest ``keep_last`` — plus the existing archive — into ONE
    ``batch=-2`` archive partition, then drop the folded dirs. Without
    this, per-batch idempotent partitioning accumulates one tiny dir
    per micro-batch forever; with it, partition count is bounded by
    ``keep_last + 2`` while the gate's replay contract survives:

    - the streaming checkpoint only ever replays the NEWEST in-flight
      batch, and ``keep_last >= 1`` keeps that batch out of the fold;
    - the probe filter ``batch < batch_id`` still sees the archive
      (``-2`` sorts below every live id);
    - the fold itself is crash-atomic: the merged archive is written to
      an underscore-prefixed STAGING dir (invisible to parquet readers,
      like ``_temporary``), and only after that write commits
      (``_SUCCESS``) is the old archive deleted and the staging dir
      renamed into place — an O(1) metadata swap. Source dirs are
      deleted LAST. Every crash window is covered by the repair step at
      entry: a committed staging dir with no archive is renamed into
      place (crash between delete and rename); any other stray staging
      dir is dropped (its rows still live in archive + folded dirs);
      folded dirs that outlived a completed swap re-merge on the next
      run, where ``distinct`` collapses the duplicates. No window
      exists in which previously archived rows live only in app-scoped
      memory.

    Uses the Hadoop FileSystem API, so the same code runs on HDFS/S3A
    paths, not just local disk. Returns a report dict; ``folded: []``
    means the dataset was already consolidated.

    ``subpartition_by`` names any partition columns nested INSIDE the
    batch dirs (the semdedup gate's kept index is
    ``batch=<id>/cluster_id=<c>``, so ``("cluster_id",)``) — the
    archive is then written with the same inner layout. The on-disk
    layout is AUTO-DETECTED from the ``<col>=`` directory chain under
    the first folded partition and ENFORCED, not caller-trusted:
    omitted on a nested layout → the detected columns are used (a flat
    archive next to two-level live partitions would fail the gate's
    next read on conflicting directory structures); explicitly given
    but disagreeing with the detected chain → raises."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    arch_path = jvm.org.apache.hadoop.fs.Path(
        f"{path}/{key}={archive_value}"
    )
    # no "=" in the staging name: partition discovery would parse
    # it as a conflicting partition column even under the hidden-file
    # filter — a bare underscore dir is skipped entirely
    staging = f"{path}/_staging_{key}_{archive_value}"
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    repaired = False
    if fs.exists(spath):
        if not fs.exists(arch_path):
            # crash landed between delete(old archive) and rename: the
            # staging dir holds the only durable copy — finish the
            # swap. Even if the staging write itself was interrupted,
            # promoting it is safe: the folded source dirs are deleted
            # LAST, so they still exist and the next fold re-merges
            # them (task-committed part files are individually valid).
            # The rename MUST be checked: if it fails (quota, perms,
            # transient FS error) and we proceed, this run's staging
            # overwrite at the write step below would destroy the only
            # copy of previously archived rows.
            if not fs.rename(spath, arch_path):
                raise OSError(
                    f"archive repair rename failed: {staging} -> {arch_path}"
                )
            repaired = True
        else:
            # the old archive still exists (its rows plus the folded
            # dirs are intact on disk) — drop the stray staging copy
            fs.delete(spath, True)
    vals: list[int] = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith(f"{key}="):
            try:
                vals.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    live = sorted(v for v in vals if v >= 0)
    cutoff = (live[-1] - keep_last + 1) if live else 0
    folded = [v for v in live if v < cutoff]
    if not folded:
        return {"folded": [], "cutoff": cutoff, "repaired": repaired}
    read_vals = folded + (
        [archive_value] if archive_value in vals else []
    )
    # layout evidence comes from EVERY batch dir (live + archive), not
    # just the oldest folded one — a zero-rows batch dir holds only
    # _SUCCESS and is layout-neutral, so skipping it is what keeps a
    # healthy nested index from being misread as flat (review r11)
    detected: tuple[str, ...] | None = None
    detected_at = None
    for v in sorted(vals):
        cols, has_content = _detect_nested_partitions(
            fs, jvm, f"{path}/{key}={v}"
        )
        if not has_content:
            continue
        if detected is None:
            detected, detected_at = cols, v
        elif detected != cols:
            raise ValueError(
                f"inconsistent nested partition layouts on disk: "
                f"{detected} under {key}={detected_at} vs {cols} under "
                f"{key}={v} in {path}"
            )
    if detected is not None:
        if not subpartition_by:
            subpartition_by = detected
        elif tuple(subpartition_by) != detected:
            raise ValueError(
                f"subpartition_by={tuple(subpartition_by)} disagrees "
                f"with the on-disk nested partition layout {detected} "
                f"under {path}/{key}={detected_at}; folding with the "
                f"wrong inner layout would corrupt the archive's "
                f"directory structure"
            )
    # every dir layout-neutral: nothing to learn, trust the caller
    # (an empty merge writes no partition dirs either way)
    total_bytes = sum(
        fs.getContentSummary(
            jvm.org.apache.hadoop.fs.Path(f"{path}/{key}={v}")
        ).getLength()
        for v in read_vals
    )
    n_files = max(1, -(-total_bytes // target_file_bytes))
    merged = (
        spark.read.parquet(path)
        .where(F.col(key).isin(read_vals))
        .drop(key)
        .distinct()  # crash-repair: duplicates from folded dirs that
        # outlived a completed swap collapse here
    )
    merged = (
        merged.repartition(int(n_files), *subpartition_by)
        if subpartition_by
        else merged.repartition(int(n_files))
    )
    # Stage, then swap: the old archive dir stays on disk (not just in
    # app-scoped checkpoint blocks) until the replacement is durable.
    writer = merged.write.mode("overwrite")
    if subpartition_by:
        writer = writer.partitionBy(*subpartition_by)
    writer.parquet(staging)
    if archive_value in vals:
        fs.delete(arch_path, True)
    if not fs.rename(spath, arch_path):
        # Hadoop rename reports failure by return value, not exception;
        # surfacing it keeps the repair path honest (staging intact,
        # archive absent -> next run promotes it)
        raise OSError(f"archive swap rename failed: {staging} -> {arch_path}")
    for v in folded:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{key}={v}"), True)
    return {
        "folded": folded,
        "cutoff": cutoff,
        "repaired": repaired,
        "archive_files": int(n_files),
        "archive_bytes": int(total_bytes),
    }


EMB_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def init_semdedup_index(
    spark: SparkSession,
    index_dir: str,
    seed: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.35,
    scale: int = 4,
) -> None:
    """Seed the persisted SemDeDup index ``streaming_semdedup_gate``
    probes: run the certified build
    (operators/similarity.py::semdedup_index) over a non-empty SEED
    corpus, persist its centroids (the cluster universe every later
    probe assigns against — immutable for the index's lifetime, the
    same contract as ``ivf_index(centroids=...)``) and its kept rows
    under the hive ``batch=-1`` partition the gate's per-batch
    overwrite layout expects. A seed is REQUIRED because SemDeDup has
    no cluster universe without centroids; an arbitrary stream prefix
    is a fine seed (the paper samples centroids from the corpus)."""
    from rentals_data_pipeline_spark.operators.similarity import (
        semdedup_index,
    )

    cents, kept = semdedup_index(
        seed, n_clusters=n_clusters, threshold=threshold, scale=scale
    )
    if not cents:
        raise ValueError(
            "semdedup gate seed corpus is empty: no centroid universe"
        )
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, cv array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    # persist the build params NEXT TO the index: "same (centroids,
    # threshold, scale) at build and probe time" is the operator's
    # documented contract — storing them makes it self-enforcing
    # instead of an operator-discipline footnote
    spark.createDataFrame(
        [(float(threshold), int(scale))], "threshold double, scale int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/params")
    kept.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{index_dir}/kept/batch=-1"
    )


def read_pruned_semdedup_index(
    spark: SparkSession,
    index_dir: str,
    batch_id: int,
    hit_clusters: list[int],
) -> DataFrame:
    """Partition-pruned read of the persisted SemDeDup kept index:
    strictly-earlier batches (replay safety) restricted to the
    clusters a probe batch actually hits. ``batch`` and ``cluster_id``
    are both hive partition columns of the ``kept/`` layout, so both
    predicates become PartitionFilters — the scan lists and reads ONLY
    the hit ``batch=<b>/cluster_id=<c>`` directories (pinned by the
    inputFiles test), which is what keeps a trigger's index I/O
    proportional to the batch's cluster footprint instead of |index|.
    An empty hit set (an all-NULL-embedding batch) short-circuits to
    an empty, correctly-typed frame BEFORE the parquet read is even
    constructed — constructing it would run partition discovery over
    every batch/cluster directory plus a footer read (thousands of
    object-store LISTs on a long-lived gate) for zero rows."""
    if not hit_clusters:
        return spark.createDataFrame(
            [],
            "vec_id long, vec array<double>, cluster_id int,"
            " centroid_sim double",
        )
    return spark.read.parquet(f"{index_dir}/kept").where(
        (F.col("batch") < batch_id)
        & F.col("cluster_id").isin([int(c) for c in hit_clusters])
    ).select("vec_id", "vec", "cluster_id", "centroid_sim")


def streaming_semdedup_gate(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    threshold: float | None = None,
    scale: int | None = None,
    max_files_per_trigger: int = 1,
):
    """Online SEMANTIC dedup gate for an arriving embedding stream —
    the SemDeDup face of ``streaming_dedup_gate``: each micro-batch is
    judged by the certified incremental operator
    (operators/similarity.py::semdedup_against_index — within-batch
    greedy dominator + domination by any kept index member of the
    batch row's cluster), the kept rows land in ``output_dir`` and
    their index rows (vector + cluster + centroid_sim) grow the
    persisted index, so the next batch is judged against a corpus that
    includes this one.

    Same storage/replay design as the LSH gate: the index lives in
    PARQUET partitioned by (batch, cluster_id) — TB-scale at 100 TB,
    far beyond per-key streaming state — every write targets the
    batch's OWN ``batch=<id>`` partition with overwrite, and the probe
    reads only STRICTLY-EARLIER partitions, so a checkpoint replay of
    a crashed batch never self-matches. Centroids load once per run (a
    bounded n_clusters × dim collect); they are the fixed cluster
    universe — growing a drifted corpus eventually wants an index
    rebuild with re-sampled centroids, exactly like IVF re-centering.

    Maintenance: per-trigger partitions accumulate exactly like the
    LSH gate's — fold them with ``consolidate_gate_storage(spark,
    f"{index_dir}/kept", subpartition_by=("cluster_id",))`` (the
    subpartition argument is REQUIRED for this index's two-level
    layout; see that function's docstring).

    Probe cost per trigger — pruned, not full-index: the batch is
    assigned to clusters FIRST (``semdedup_assign``, one broadcast
    matmul), the hit-cluster set is collected (bounded by n_clusters —
    a list of ints, never rows), and the index read is filtered to
    ``batch < id AND cluster_id IN hits`` — both hive partition
    columns, so the scan reads ONLY the hit ``cluster_id=<c>`` dirs
    (partition-pruned; pinned by test). A batch row can only be
    dominated by index members of its own cluster, so the pruned
    verdicts are byte-identical to a full-index probe (pinned by
    test). The probe's groupBy then shuffles just those pruned rows —
    per-trigger I/O scales with the batch's cluster footprint, not
    with |index|. A TB-scale kept-set with well-sized n_clusters
    (k ≈ 0.1‰ of n, the SemDeDup paper's ratio) therefore reads
    ~|batch|/k of itself per trigger, not all of itself.

    NULL-embedding rows cannot be duplicates of anything (they have no
    vector to compare): they PASS THROUGH to ``output_dir`` with the
    batch's novel survivors instead of being silently dropped, and are
    never added to the index. Quarantine them upstream if a producer
    emitting null vectors should be treated as an error.

    Precondition, same as the LSH gate's doc_id: ``vec_id`` is unique
    within a micro-batch. Exact duplicate rows (a replaying producer)
    are dropped here defensively; two DIFFERENT vectors sharing a
    vec_id in one batch have no right answer and will double-write.

    ``threshold``/``scale`` default to the values PERSISTED with the
    index (init_semdedup_index stores them) — the build/probe
    same-params contract is enforced, not trusted: passing an explicit
    value that disagrees with the stored one raises instead of
    silently judging new batches under different semantics than the
    index's survivors were kept under."""
    from rentals_data_pipeline_spark.operators.similarity import (
        as_double,
        semdedup_against_index,
        semdedup_assign,
    )

    cents = [
        list(r["cv"])
        for r in spark.read.parquet(f"{index_dir}/centroids")
        .orderBy("cid")
        .collect()
    ]
    stored = spark.read.parquet(f"{index_dir}/params").collect()[0]
    for name, given, kept_val in (
        ("threshold", threshold, stored["threshold"]),
        ("scale", scale, stored["scale"]),
    ):
        if given is not None and given != kept_val:
            raise ValueError(
                f"semdedup gate {name}={given} disagrees with the "
                f"index's build-time {name}={kept_val} "
                f"({index_dir}/params); rebuild the index or drop "
                f"the explicit argument"
            )
    threshold = float(stored["threshold"])
    scale = int(stored["scale"])

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        # exact-duplicate rows (replaying producer) collapse before
        # judging; see the vec_id-uniqueness precondition above
        batch_df = batch_df.dropDuplicates().localCheckpoint(
            eager=True
        )  # file-source lineage is not re-resolvable inside
        # foreachBatch joins
        # assignment runs ONCE: it feeds both the hit-cluster set that
        # prunes the index read and (via assigned=) the probe itself
        assigned = semdedup_assign(
            batch_df, cents, scale=scale
        ).localCheckpoint(eager=True)
        hits = sorted(
            r["cluster_id"]
            for r in assigned.select("cluster_id").distinct().collect()
        )  # bounded: at most n_clusters ints (the centroid universe)
        idx = read_pruned_semdedup_index(sp, index_dir, batch_id, hits)
        judged = semdedup_against_index(
            batch_df, cents, idx,
            threshold=threshold, scale=scale, assigned=assigned,
        )
        kept = judged.where(F.col("kept")).localCheckpoint(eager=True)
        # NULL-embedding rows pass through: no vector, no duplicate
        novel = batch_df.join(
            kept.select("vec_id"), "vec_id", "left_semi"
        ).unionByName(batch_df.where(F.col("embedding").isNull()))
        novel.write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}"
        )
        new_idx = kept.join(
            batch_df.select(
                "vec_id", as_double(F.col("embedding")).alias("vec")
            ),
            "vec_id",
        ).select("vec_id", "vec", "cluster_id", "centroid_sim")
        new_idx.write.mode("overwrite").partitionBy("cluster_id").parquet(
            f"{index_dir}/kept/batch={batch_id}"
        )

    return (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
