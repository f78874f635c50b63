"""Runtime stage-metrics capture from Spark's driver status store.

``tools/plan_audit.py`` is the STATIC half of the engine's scale
discipline: it counts plan markers (exchanges, cartesians, Python
stages) before execution. This module is the DYNAMIC half — it reads
the driver's ``AppStatusStore`` (the same store the Spark UI's REST
``/api/v1/.../stages`` endpoint serves) after a query runs and reports
what the shuffles actually COST: bytes and records written/read,
spill, and scan input volume. The two together close the "measure,
don't guess" loop: the plan audit proves a query has no cartesian; the
metrics audit proves its shuffles carry 16-byte digests rather than
document text.

Why the status store and not a listener: PySpark cannot register a
Python ``SparkListener`` without a Java shim, and the REST API needs
``spark.ui.enabled=true`` (the engine's sessions disable the UI). The
status store is always populated, driver-local, and free — reading it
is a py4j call, no extra thread, no HTTP.

Key invariant this enables (used by ``tools/shuffle_audit.py`` budgets
and ``tests/test_shuffle_metrics.py``): **shuffle bytes per shuffled
record is scale-free**. A dedup/similarity plan whose shuffle keys are
hex strings or raw text shows hundreds-to-thousands of bytes/record;
one keyed on binary digests shows tens. Asserting the ratio (not the
absolute bytes, which grow with SF) pins the discipline at every scale
factor, including ones far larger than the test's.

Caveats:
- Metrics are attributed by stage-id watermark (stage ids increase
  monotonically per SparkContext). Attribution assumes no CONCURRENT
  jobs on the same session between ``snapshot`` and ``since`` — true
  for the engine's batch queries; do not use around streaming jobs.
- SKIPPED stages (AQE reused exchanges) report zero task metrics and
  are counted separately — a high ``skipped_stages`` is a *good* sign
  (exchange reuse), not missing data.
- The store retains ``spark.ui.retainedStages`` (default 1000) stages;
  a single measured query stays far below that, but do not batch many
  queries between snapshots.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: StageData getter -> output key. Sums over COMPLETE stages.
_FIELDS = {
    "shuffle_write_bytes": "shuffleWriteBytes",
    "shuffle_write_records": "shuffleWriteRecords",
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_read_records": "shuffleReadRecords",
    "input_bytes": "inputBytes",
    "input_records": "inputRecords",
    "output_bytes": "outputBytes",
    "memory_spill_bytes": "memoryBytesSpilled",
    "disk_spill_bytes": "diskBytesSpilled",
}


def _stage_list(spark: SparkSession):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    # Spark 4 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus); empty statuses list == all.
    return store.stageList(
        gw.jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(gw.jvm.double, 0),
        gw.jvm.java.util.ArrayList(),
    )


def snapshot(spark: SparkSession) -> int:
    """Current high-water stage id (-1 on a fresh context).

    Pass the returned watermark to :func:`since` after running the
    workload to be measured.
    """
    stages = _stage_list(spark)
    max_id = -1
    for i in range(stages.size()):
        sid = stages.apply(i).stageId()
        if sid > max_id:
            max_id = sid
    return max_id


def since(spark: SparkSession, watermark: int) -> dict[str, int]:
    """Aggregate task metrics over stages with id > ``watermark``.

    Returns the summed :data:`_FIELDS` plus ``stages`` (COMPLETE),
    ``skipped_stages`` (AQE exchange reuse) and ``tasks``.
    """
    stages = _stage_list(spark)
    out: dict[str, int] = {k: 0 for k in _FIELDS}
    out["stages"] = 0
    out["skipped_stages"] = 0
    out["tasks"] = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() <= watermark:
            continue
        status = s.status().toString()
        if status == "SKIPPED":
            out["skipped_stages"] += 1
            continue
        if status != "COMPLETE":
            continue
        out["stages"] += 1
        out["tasks"] += s.numTasks()
        for key, getter in _FIELDS.items():
            out[key] += getattr(s, getter)()
    return out


def run_measured(
    spark: SparkSession,
    fn: Callable[[], Any],
    *,
    collect: bool = True,
) -> tuple[Any, dict[str, int]]:
    """Run ``fn`` and return ``(result, stage_metrics)``.

    If ``fn`` returns a :class:`DataFrame` and ``collect`` is true, the
    frame is collected so lazy plans actually execute inside the
    measured window; the collected rows are returned.
    """
    mark = snapshot(spark)
    result = fn()
    if collect and isinstance(result, DataFrame):
        result = result.collect()
    return result, since(spark, mark)


def shuffle_bytes_per_record(metrics: dict[str, int]) -> float | None:
    """Mean shuffle-write bytes per record, or None if nothing shuffled."""
    recs = metrics.get("shuffle_write_records", 0)
    if not recs:
        return None
    return metrics["shuffle_write_bytes"] / recs
