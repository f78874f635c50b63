"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke);
``queries()`` / ``oracle_sql()`` expose the engine's full catalog for
the DuckDB hash-compare correctness gate at sf0.01.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from rentals_data_pipeline_spark.plans import catalog  # noqa: E402
from rentals_data_pipeline_spark.plans import relational_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import text_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import dedup_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import similarity_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import multimodal_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import curation_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import sampling_queries  # noqa: E402, F401
from rentals_data_pipeline_spark.plans import timeseries_queries  # noqa: E402, F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["flagship_events_daily"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return dict(catalog.ORACLE_SQL)
