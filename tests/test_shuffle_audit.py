"""Runtime shuffle-budget gate as a pytest job (round-6 verdict 7).

``tools/shuffle_audit.py`` measured the full catalog by hand each
round; this promotes the GATED subset into the suite so a regression
fails CI instead of waiting for a manual sweep. Same budgets, same
measurement path (driver status store via ``metrics.run_measured``),
at sf0.001 so the whole job stays seconds: both gated ratios —
shuffle bytes per shuffled record (payload discipline) and shuffle
records per input record (explosion discipline) — are scale-free by
design, and the zero-spill bar is absolute at any test scale.

Run alone with ``pytest -m shuffle_audit`` (marker registered in
``pytest.ini``); runs as part of the plain suite too.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.shuffle_audit import BUDGETS, audit_query, check_budgets  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Shuffle-heavy, non-budget queries that still carry the zero-spill
# bar: a spill at sf0.001 on local[4] is a partition-sizing bug that
# 100x scale turns into instability.
SPILL_WATCH = [
    "text_pack_chunks_by_split",
    "dedup_duplicate_clusters",
    "graph_pagerank_copurchase",
    "sim_cosine_topk",
]


@pytest.fixture(scope="module")
def catalog():
    import __spark_entry__ as entrymod

    return entrymod.queries()


@pytest.mark.shuffle_audit
@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budgets(spark, catalog, name):
    row = audit_query(spark, name, catalog[name], SF_DIR)
    failures = check_budgets(row)
    assert not failures, f"{failures}; measured: {row}"


@pytest.mark.shuffle_audit
@pytest.mark.parametrize("name", SPILL_WATCH)
def test_zero_spill(spark, catalog, name):
    row = audit_query(spark, name, catalog[name], SF_DIR)
    assert row.get("disk_spill_bytes", 0) == 0, row
    assert row["rows"] >= 0
