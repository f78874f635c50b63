"""Conditional parallelism widening for CPU-bound stages over narrow
scans — the ONE copy of the probe-and-repartition logic the multimodal
pack pipelines and the column profiler share (r12 review: the two
inline copies had independently picked up the same bug)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_has_exchange(df: DataFrame) -> bool:
    """True when the physical plan carries an Exchange (shuffle).

    Checked on ``executedPlan``, NOT ``sparkPlan``: exchanges are
    inserted by EnsureRequirements during ``prepareForExecution``, so
    ``sparkPlan`` never contains them for groupBy/join-derived inputs
    — a guard written against it is a no-op for exactly the inputs it
    targets (r12 review, verified empirically). Under AQE,
    ``executedPlan`` is the AdaptiveSparkPlan wrapper whose string is
    the initial plan WITH exchanges; building it runs no jobs."""
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()


def widen_if_narrow(df: DataFrame, enabled: bool = True) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` when — and only
    when — it is a batch frame whose plan is exchange-free (a bare
    scan) and whose scan supplies fewer partitions than cores.

    The guards, in order:

    - streaming frames are untouched (no RDD probe on streams;
      micro-batch parallelism is the source's job);
    - exchange-bearing plans are untouched: under AQE, ``toRdd()`` on
      a plan with upstream exchanges EXECUTES those shuffle stages
      just to expose a partition count, and a derived input's
      parallelism is already set by its own shuffle;
    - the partition count comes from the JVM-internal RDD
      (``df.rdd`` would splice a Python-serializer stage into the DAG
      just to ask — r10 verdict).

    Callers rely on the repartition being result-invariant: only apply
    this upstream of partitioning-invariant work (per-row maps,
    aggregates with deterministic merge)."""
    if not enabled or df.isStreaming:
        return df
    qe = df._jdf.queryExecution()
    if "Exchange" in qe.executedPlan().toString():
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if qe.toRdd().getNumPartitions() < target:
        return df.repartition(target)
    return df
