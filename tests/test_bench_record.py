"""Bench output-contract tests (round 8).

BENCH_r07.json recorded ``parsed: null`` because bench.py's single full
JSON line outgrew the round driver's ~2.2 KB stdout tail buffer. The
contract is now: full record in BENCH_LOCAL.json, compact final stdout
line ≤~500 B, and tools/bench_compare.py reconstructs truncated tails
from older rounds. These tests pin all three pieces without running
Spark.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from bench_compare import reconstruct_tail  # noqa: E402


def test_reconstruct_real_r07_tail():
    d = json.loads((REPO / "BENCH_r07.json").read_text())
    assert d.get("parsed") is None, "fixture drifted: r07 was unparsed"
    rec = reconstruct_tail(d["tail"])
    assert rec["value"] == 53.447
    assert rec["sf"] == 0.1
    assert rec["harness"] == "warm-median-of-3_v1"
    # every query recovered: the per-query medians sum to the headline
    # total exactly (the strongest completeness check available)
    assert len(rec["queries"]) == 53
    assert round(sum(rec["queries"].values()), 3) == rec["value"]
    assert rec["queries"]["flagship_events_daily"] == 0.857
    assert rec["queries"]["dedup_decontaminate_bloom"] == 1.436
    assert rec["calib_pyloop_3m_sec"] == 0.1183
    assert rec["calib_parallel_scaling_16w"] == 7.28
    assert rec["calib_spark_agg_sec"] == 0.1528


def test_reconstruct_synthetic_truncation():
    full = json.dumps(
        {
            "metric": "headline_queries_total_sec",
            "value": 12.5,
            "unit": "sec",
            "queries": {"q1": 1.25, "q2": 11.25},
            "calib_pyloop_3m_sec": 0.1,
            "calib_parallel_scaling_16w": None,
            "calib_spark_agg_sec": 0.15,
            "sf": 0.01,
            "harness": "warm-median-of-3_v1",
        }
    )
    # chop the head like the driver's tail buffer does
    rec = reconstruct_tail(full[17:])
    assert rec["queries"] == {"q1": 1.25, "q2": 11.25}
    assert rec["value"] == 12.5
    assert "calib_parallel_scaling_16w" not in rec  # null stays absent
    assert rec["calib_spark_agg_sec"] == 0.15


def test_reconstruct_rebuilds_lost_value_from_query_sum():
    """'value' sits BEFORE the queries map in the JSON line, so deeper
    truncation loses it — reconstruction rebuilds it from the medians'
    sum (the headline total IS that sum)."""
    full = json.dumps(
        {
            "metric": "m",
            "value": 3.75,
            "unit": "sec",
            "queries": {"q1": 1.5, "q2": 2.25},
            "sf": 0.1,
            "harness": "h",
        }
    )
    cut = full.index('"queries"')  # head truncated past "value"
    rec = reconstruct_tail(full[cut - 1 :])
    assert rec["value"] == 3.75


def test_compare_compact_vs_compact_without_local_file(tmp_path):
    """Two compact-format rounds whose BENCH_LOCAL.json is absent (or
    stale) must compare totals informationally and exit 0 — never a
    spurious 'TOTAL(shared)' failure on an empty shared set."""
    import subprocess

    for i, total in ((8, 10.0), (9, 11.0)):
        (tmp_path / f"BENCH_r0{i}.json").write_text(
            json.dumps(
                {
                    "parsed": {
                        "metric": "headline_queries_total_sec",
                        "value": total,
                        "unit": "sec",
                        "n_queries": 5,
                        "queries_file": "nonexistent_local.json",
                        "sf": 0.1,
                        "harness": "warm-median-of-3_v1",
                    }
                }
            )
        )
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "bench_compare.py"),
            str(tmp_path / "BENCH_r08.json"),
            str(tmp_path / "BENCH_r09.json"),
        ],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "no shared per-query data" in proc.stdout
    assert "1.10x" in proc.stdout
    # the mislabeling guard: full-total ratios must never print under
    # a "shared total" normalization label in this branch
    assert "normalized shared total" not in proc.stdout


def _compare(tmp_path, old_rec, new_rec):
    import subprocess

    (tmp_path / "OLD.json").write_text(json.dumps(old_rec))
    (tmp_path / "NEW.json").write_text(json.dumps(new_rec))
    return subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "bench_compare.py"),
            str(tmp_path / "OLD.json"),
            str(tmp_path / "NEW.json"),
        ],
        capture_output=True,
        text=True,
    )


def test_spark_normalized_gate_host_drift_does_not_fail(tmp_path):
    """r13 (verdict #4): a uniformly degraded host (calib 2x) pushes
    raw ratios past the threshold on unchanged code — the gate must
    judge the spark-normalized ratio, label the raw exceedance HOST,
    and exit 0."""
    old = {"value": 2.0, "queries": {"q": 2.0}, "calib_spark_agg_sec": 0.10}
    new = {"value": 3.6, "queries": {"q": 3.6}, "calib_spark_agg_sec": 0.20}
    proc = _compare(tmp_path, old, new)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "HOST" in proc.stdout
    assert "no regressions" in proc.stdout


def test_spark_normalized_gate_catches_masked_regression(tmp_path):
    """The converse hazard: a FASTER host masks a real engine
    regression in the raw ratio (1.2x raw on a half-cost host = 2.4x
    engine). The normalized gate must fail it."""
    old = {"value": 2.0, "queries": {"q": 2.0}, "calib_spark_agg_sec": 0.20}
    new = {"value": 2.4, "queries": {"q": 2.4}, "calib_spark_agg_sec": 0.10}
    proc = _compare(tmp_path, old, new)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "FAIL" in proc.stdout
    assert "normalized" in proc.stdout


def test_raw_gate_when_calibration_absent(tmp_path):
    """Without calibration on both sides the gate falls back to raw
    ratios — a >threshold raw regression still fails."""
    old = {"value": 2.0, "queries": {"q": 2.0}}
    new = {"value": 3.6, "queries": {"q": 3.6}}
    proc = _compare(tmp_path, old, new)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "(raw)" in proc.stdout


def test_git_history_recovers_overwritten_local_record():
    """Each round's bench (builder's AND the driver's post-commit run)
    overwrites BENCH_LOCAL.json; any COMMITTED copy must be recoverable
    from git history by its headline value so the per-query gate
    survives compact-vs-compact comparisons. Round 8 lesson: never
    assume the worktree copy is committed — read the target value OUT
    of git history first, so this holds even while the worktree holds
    an uncommitted fresh run."""
    import subprocess

    from bench_compare import _git_history_match

    committed = json.loads(
        subprocess.run(
            ["git", "show", "HEAD:BENCH_LOCAL.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )
    rec = _git_history_match("BENCH_LOCAL.json", committed["value"])
    assert rec is not None
    assert rec["queries"] == committed["queries"]
    # and a value no run ever produced finds nothing
    assert _git_history_match("BENCH_LOCAL.json", 0.000123) is None


def test_simulated_driver_overwrite_still_recovers_committed(tmp_path):
    """Round-8 failure mode, simulated end-to-end in a scratch git
    repo: commit a bench record, then overwrite the worktree copy with
    an uncommitted post-commit driver run. The committed record must
    still be recoverable by its value; the uncommitted one must not."""
    import subprocess

    import bench_compare

    def git(*argv):
        subprocess.run(
            ["git", *argv], cwd=tmp_path, check=True, capture_output=True
        )

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    committed = {"value": 56.713, "queries": {"q1": 56.713}}
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(committed))
    git("add", "BENCH_LOCAL.json")
    git("commit", "-qm", "bench record")
    # the driver's post-commit overwrite (never committed)
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"value": 78.058, "queries": {"q1": 78.058}})
    )
    orig = bench_compare.REPO
    bench_compare.REPO = tmp_path
    try:
        rec = bench_compare._git_history_match("BENCH_LOCAL.json", 56.713)
        assert rec == committed
        assert (
            bench_compare._git_history_match("BENCH_LOCAL.json", 78.058)
            is None
        )
    finally:
        bench_compare.REPO = orig


def test_compact_stdout_line_fits_tail_buffer():
    """The compact record bench.py prints must stay well under the
    driver's observed ~2.2 KB tail buffer even with worst-case widths."""
    compact = {
        "metric": "headline_queries_total_sec",
        "value": 99999.999,
        "unit": "sec",
        "calib_pyloop_3m_sec": 0.1234,
        "calib_parallel_scaling_16w": 16.12,
        "calib_spark_agg_sec": 0.1234,
        "sf": 0.1,
        "harness": "warm-median-of-3_v1",
        "n_queries": 999,
        "queries_file": "BENCH_LOCAL.json",
    }
    line = json.dumps(compact)
    assert len(line) < 500

    # and bench.py actually emits exactly these keys — parse the source
    # so the contract can't silently drift
    src = (REPO / "bench.py").read_text()
    for key in compact:
        assert f'"{key}"' in src, f"bench.py no longer emits {key}"
    assert "BENCH_LOCAL.json" in src
