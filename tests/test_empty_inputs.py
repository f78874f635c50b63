"""Robustness sweep: every catalog query must run on an EMPTY corpus.

Each table is rewritten with its sf0.001 schema and zero rows; every
``queries()`` entry must plan and execute without raising. At 100 TB an
empty partition, a fully filtered-out source, or a first-run bootstrap
is routine — a query that crashes on zero rows is a production outage,
not an edge case.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from rentals_data_pipeline_spark.sources.tables import TABLES, load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        df.limit(0).write.mode("overwrite").parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    fn = entry.queries()[name]
    df = fn(spark, empty_sf_dir)
    # executing must not raise; any row count (incl. aggregates' single
    # all-null/zero row) is acceptable
    df.collect()
