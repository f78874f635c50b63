"""Catalog shuffle-volume audit: MEASURED bytes, not plan guesses.

Runs catalog queries end-to-end and reports per-query runtime totals
from the driver status store (``rentals_data_pipeline_spark.metrics``):
shuffle write/read bytes and records, scan input volume, spill, task
and stage counts. This is the dynamic complement to
``tools/plan_audit.py`` — that gate proves a plan has no cartesian;
this one proves the shuffles the plan does have are CHEAP, i.e. keyed
on digests/ids rather than document text, combined map-side before the
exchange, and spill-free at the test scale.

GATE (scale-free, two axes): for queries in :data:`BUDGETS`,
(a) mean shuffle bytes PER RECORD must stay under ``bpr`` — pins the
    payload discipline (16-byte digests and int ids, not text). The
    ratio is independent of scale factor, so a 2-second sf0.01 run
    catches the same regression a 100 TB run would. One deliberate
    exception documented inline: the MinHash plan's shuffle record IS
    a 64-hash signature (~485 B measured), constant per doc — its
    budget pins "one signature per doc", not "small record".
(b) shuffle records per INPUT record (``fanout``) must stay under
    budget — pins the explosion discipline. A plan that regresses to
    shuffling per-gram rows instead of per-doc rows jumps this ratio
    ~50x regardless of payload size; this axis catches what (a)
    cannot when fixture text is short enough to rival a digest.

A third, absolute gate: ``disk_spill_bytes`` must be ZERO for every
audited query at test scale — local[32] with default memory should
never spill at sf<=0.1; any spill means a partition-sizing bug that
100x scale would turn into a stability problem.

Usage:
    python tools/shuffle_audit.py [sf_dir] [query ...]   # JSON lines
    (no query args: runs the bench HEADLINE set)
    python tools/shuffle_audit.py [sf_dir] --all         # full catalog
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from rentals_data_pipeline_spark import metrics as M  # noqa: E402
from rentals_data_pipeline_spark.session import create_spark_session  # noqa: E402

# Scale-free budgets, set at ~2-3x the sf0.01 measurement (recorded
# per query in COVERAGE.md's round-6 shuffle-audit table) so
# environment drift cannot flake the gate while a text-keyed or
# per-gram regression (an order-of-magnitude jump on its axis) still
# fails it. Only queries whose scale story *depends* on cheap shuffles
# are gated — the point is to pin the discipline, not to freeze every
# plan's constant factors. ``bpr`` = shuffle-write bytes / shuffled
# record; ``fanout`` = shuffle-write records / scan input record.
BUDGETS: dict[str, dict[str, float]] = {
    # span-level dedup: distinct (doc, gram-digest) rows shuffle as
    # 16-byte binaries (measured 25 B/rec); fanout = distinct grams
    # per doc, bounded by fixture doc length (measured 46)
    "text_duplicated_ngram_fraction": {"bpr": 60.0, "fanout": 150.0},
    # minhash: ONE record per doc carrying the 64-hash signature
    # (64 x int64 ~ 485 B/rec measured — payload by design); the
    # scale killer here would be per-gram records, caught by fanout
    # (measured 1.0: the explode feeds a map-side partial agg)
    "dedup_minhash_lsh_pairs": {"bpr": 1200.0, "fanout": 4.0},
    # canonicalize-then-digest exact dedup: md5 keys, never text
    # (measured 44 B/rec, fanout 1.0)
    "dedup_normalized_documents": {"bpr": 120.0, "fanout": 3.0},
    # decontamination: digest semi-join, no benchmark text travels
    # (measured 44 B/rec, fanout 0.17)
    "dedup_decontaminate_train": {"bpr": 120.0, "fanout": 1.5},
    # curation flagship: filters fused into scan; shuffles carry
    # digests + chunk structs (measured 79 B/rec, fanout 0.37)
    "pipeline_training_data_prep": {"bpr": 250.0, "fanout": 2.0},
    # star join: dims broadcast; the only shuffle is post-agg group
    # rows (measured 87 B/rec, fanout 0.0003 = 25 groups / 77k scans)
    "join_star_revenue": {"bpr": 250.0, "fanout": 0.01},
    # DSIR: the hashed-LM shuffles carry (bucket, count) ints and the
    # per-doc rollup (measured 20 B/rec, fanout 1.37 — bucket partials
    # + doc rows over input docs; the scale killer would be raw grams
    # crossing the wire, which would blow fanout past doc length)
    "sample_dsir_importance": {"bpr": 60.0, "fanout": 5.0},
    # r12 contamination rewrite: digests and count slivers only, train
    # never shuffles for the membership probe (measured 40 B/rec,
    # fanout 0.60 — per-doc gram partials, never raw text)
    "dedup_contamination_report": {"bpr": 120.0, "fanout": 2.0},
    # r12 vocab coverage: token counts collapse to the frequency
    # histogram; shuffles carry (token, count) then (cnt, n_terms)
    # ints (measured 42 B/rec, fanout 0.16 — the scale killer would
    # be raw token rows reaching the window, blowing fanout past 1)
    "text_vocab_coverage": {"bpr": 120.0, "fanout": 1.0},
    # r12 hard negatives: only per-batch top-k survivors shuffle to
    # the per-anchor window (measured 27 B/rec, fanout 0.5 = k x
    # anchors x batches over corpus rows; the pair space never
    # crosses the wire)
    "sim_hard_negatives": {"bpr": 80.0, "fanout": 2.0},
    # streaks (budget added r12): the fact reduces to distinct
    # (user, day) in one shuffle; day-rows, never events, flow to the
    # window (measured 8 B/rec, fanout 0.80 at the fixture's density)
    "analytics_activity_streaks": {"bpr": 30.0, "fanout": 2.0},
    # r12 Mann-Whitney drift: pre-aggregated (type, value) count rows
    # shuffle, then the distinct-value frame re-shuffles to the
    # window (measured 12 B/rec, fanout 1.81 — the scale killer would
    # be raw fact rows reaching the rank window, blowing fanout)
    "stats_mann_whitney_value_drift": {"bpr": 40.0, "fanout": 4.0},
    # r12 Gini concentration: the fact folds to the customer dim
    # before anything shuffles; only dim-sized (segment, x) rows flow
    # to the rank window (measured 23 B/rec, fanout 0.18 = customer
    # rows over fact+dim scan rows)
    "stats_gini_revenue_concentration": {"bpr": 60.0, "fanout": 0.6},
    # r12 Spearman trend: the fact scans ONCE into the (type, hr,
    # value) count cube whose exchange every branch reuses; shuffles
    # carry count/rank ints (measured 13 B/rec, fanout 3.49 = cube +
    # two marginal maps + the rank-joined cube re-agg)
    "stats_spearman_value_trend": {"bpr": 40.0, "fanout": 8.0},
    # r12 soft dedup: the minhash signature rows dominate (64 x int64
    # per doc, the same by-design payload as dedup_minhash_lsh_pairs);
    # the corpus itself never shuffles — cluster sizes broadcast back
    # (measured 324 B/rec, fanout 0.72)
    "dedup_soft_dedup_weights": {"bpr": 1200.0, "fanout": 2.0},
    # r12 k-anonymity: QI equivalence classes shuffle as pre-counted
    # int tuples (measured 20 B/rec, fanout 0.60)
    "quality_k_anonymity_customers": {"bpr": 60.0, "fanout": 1.5},
    # r12 ACF: hourly anchored means are the only data-sized shuffle
    # (measured 18 B/rec, fanout 0.68 = hour rows + lag-pair partials
    # over input rows)
    "ts_acf_hourly_lags": {"bpr": 60.0, "fanout": 2.0},
    # r12 MAD outliers: the (type, value) count frame shuffles once
    # (measured 12 B/rec); fanout 4.5 = count frame + two median
    # windows + the deviation frame — never raw fact rows
    "quality_mad_anomaly_events": {"bpr": 40.0, "fanout": 10.0},
    # r12 cross-source overlap: gram rows shuffle once keyed by digest
    # (measured 44 B/rec); fanout = grams per doc (measured 48,
    # bounded by doc length — same axis as
    # text_duplicated_ngram_fraction). No self-join exists: pairs
    # generate in-row from each digest's collected source set
    "dedup_cross_source_overlap": {"bpr": 120.0, "fanout": 150.0},
}


def audit_query(spark, name: str, fn, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    rows, stats = M.run_measured(spark, lambda: fn(spark, sf_dir))
    sec = time.perf_counter() - t0
    row: dict = {"query": name, "rows": len(rows), "sec": round(sec, 3)}
    row.update(stats)
    bpr = M.shuffle_bytes_per_record(stats)
    row["shuffle_bytes_per_record"] = round(bpr, 1) if bpr is not None else None
    row["shuffle_fanout"] = (
        round(stats["shuffle_write_records"] / stats["input_records"], 4)
        if stats.get("input_records")
        else None
    )
    return row


def check_budgets(row: dict) -> list[str]:
    """Return gate-failure strings for one audited row (empty = pass)."""
    failures: list[str] = []
    name = row["query"]
    budget = BUDGETS.get(name, {})
    bpr = row.get("shuffle_bytes_per_record")
    if "bpr" in budget and bpr is not None and bpr > budget["bpr"]:
        failures.append(
            f"{name}: shuffle {bpr:.0f} B/record exceeds budget {budget['bpr']:.0f}"
        )
    if "fanout" in budget and row.get("shuffle_fanout") is not None:
        fanout = row["shuffle_fanout"]  # gate the value the JSON prints
        if fanout > budget["fanout"]:
            failures.append(
                f"{name}: shuffle fanout {fanout:.2f} records/input-record "
                f"exceeds budget {budget['fanout']}"
            )
    if row.get("disk_spill_bytes", 0) > 0:
        failures.append(
            f"{name}: spilled {row['disk_spill_bytes']} bytes to disk at test scale"
        )
    return failures


def main() -> int:
    args = sys.argv[1:]
    run_all = "--all" in args
    args = [a for a in args if a != "--all"]  # flag position-independent
    if args and Path(args[0]).is_dir():
        sf_dir, rest = args[0], args[1:]
    else:  # bare query names: keep the default scale
        sf_dir, rest = "/root/testdata/sf0.01", args
    queries = entrymod.queries()
    if run_all:
        names = list(queries)
    else:
        names = rest or [q for q in HEADLINE if q in queries]
    spark = create_spark_session("shuffle-audit")
    failures: list[str] = []
    for name in names:
        fn = queries.get(name)
        if fn is None:
            failures.append(f"{name}: not in catalog")
            continue
        try:
            row = audit_query(spark, name, fn, sf_dir)
        except Exception as exc:  # surface, keep auditing
            print(json.dumps({"query": name, "error": str(exc)[:200]}), flush=True)
            failures.append(f"{name}: failed ({str(exc)[:120]})")
            continue
        failures.extend(check_budgets(row))
        print(json.dumps(row), flush=True)
    for f in failures:
        print(f"SHUFFLE AUDIT FAIL {f}", file=sys.stderr)
    if not failures:
        print("shuffle audit clean", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
