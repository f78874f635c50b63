"""Structured Streaming tests: stream/batch equivalence + custom state.

The batch window operators are oracle-certified (timeseries queries);
here we certify that the *streaming* path — readStream file source,
watermark, AvailableNow drain — produces byte-identical results to the
batch path on the same data, and that applyInPandasWithState carries
state across micro-batches.
"""

from __future__ import annotations

import pytest
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
