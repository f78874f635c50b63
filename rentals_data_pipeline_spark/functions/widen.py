"""Conditional parallelism widening for CPU-bound stages over narrow
scans — the ONE copy of the probe-and-repartition logic the multimodal
pack pipelines and the column profiler share (r12 review: the two
inline copies had independently picked up the same bug)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Shuffle exchanges only — a bare "Exchange" substring would also match
# BroadcastExchange / ReusedExchange, and a broadcast join over a narrow
# single-file scan sets NO downstream partitioning: treating it as
# "derived" would silently reinstate the single-threaded regression this
# module exists to fix (r12 review pass 2). RoundRobinPartitioning (an
# upstream repartition()/REBALANCE) IS matched here even though
# plan_audit excludes it from data-shuffle budgets: for the probe-cost
# guard the question is "would toRdd() execute a shuffle stage", and a
# round-robin exchange both executes and already sets the parallelism
# (r12 ADVICE).
_SHUFFLE_EXCHANGE = re.compile(
    r"Exchange (?:hash|range|RoundRobin)[Pp]artitioning"
    r"|Exchange SinglePartition"
)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True when the physical plan carries a SHUFFLE exchange.

    Checked on ``executedPlan``, NOT ``sparkPlan``: exchanges are
    inserted by EnsureRequirements during ``prepareForExecution``, so
    ``sparkPlan`` never contains them for groupBy/join-derived inputs
    — a guard written against it is a no-op for exactly the inputs it
    targets (r12 review, verified empirically). Under AQE,
    ``executedPlan`` is the AdaptiveSparkPlan wrapper whose string is
    the initial plan WITH exchanges; building it runs no jobs."""
    return bool(
        _SHUFFLE_EXCHANGE.search(
            df._jdf.queryExecution().executedPlan().toString()
        )
    )


def widen_if_narrow(df: DataFrame, enabled: bool = True) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` when — and only
    when — it is a batch frame whose plan carries no shuffle and whose
    scan supplies fewer partitions than cores.

    The guards, in order:

    - streaming frames are untouched (no RDD probe on streams;
      micro-batch parallelism is the source's job);
    - shuffle-bearing plans are untouched: under AQE, ``toRdd()`` on
      a plan with upstream shuffles EXECUTES those stages just to
      expose a partition count, and a shuffle already sets the input's
      parallelism. Broadcast-only plans (a dim join over a narrow
      scan) still widen — a broadcast sets no downstream partitioning,
      and the probe's cost there is the small broadcast build;
    - the partition count comes from the JVM-internal RDD
      (``df.rdd`` would splice a Python-serializer stage into the DAG
      just to ask — r10 verdict).

    Callers rely on the repartition being result-invariant: only apply
    this upstream of partitioning-invariant work (per-row maps,
    aggregates with deterministic merge)."""
    if not enabled or df.isStreaming:
        return df
    if plan_has_shuffle(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    n = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df
