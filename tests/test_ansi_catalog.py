"""ANSI-robustness sweep: every catalog query must run ANSI-on.

The engine's own session standardizes on permissive semantics
(session.py), but the driver's correctness gate runs under Spark 4's
ANSI-on default and never opts out — so any out-of-bounds
``element_at``, overflow cast, or unguarded division that is silent
ANSI-off becomes a runtime error exactly where certification happens
(round-3 verdict: ``multimodal_frame_sample`` detonated this way).
This sweep executes the full catalog with
``spark.sql.ansi.enabled=true`` at sf0.01 — the SAME scale the driver
gate certifies at, because ANSI errors are data-dependent (an overflow
cast or out-of-bounds element_at can first appear on rows that only
exist at the larger scale) — so the class of bug is caught in
``tests/`` instead of in CORRECTNESS_r{N}.json.  Override with
``SPARK_GRAFT_ANSI_SF_DIR`` for a faster local loop.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_ANSI_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ansi_spark(spark):
    """The shared session with ANSI flipped on for this module only
    (runtime conf; restored on teardown so other modules keep the
    engine's documented ANSI-off default)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_survives_ansi_on(ansi_spark, name):
    fn = entry.queries()[name]
    df = fn(ansi_spark, SF_DIR)
    # executing must not raise under ANSI-on; the oracle gate checks
    # values — this sweep checks the error class
    df.collect()
