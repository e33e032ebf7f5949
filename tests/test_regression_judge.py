"""The benchmark-regression judge must go red on an injected regression.

Reference parity: the PR-vs-master benchmark judge of
``/root/reference/benchmark/runbenchmarks.jl:56-76`` (adapted to a
committed-baseline workflow — see ``benchmarks/regression_check.py``).
These tests exercise the judging logic itself against doctored "fresh"
runs, so CI proves the red path without re-measuring the matrix.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JUDGE = os.path.join(REPO, "benchmarks", "regression_check.py")
BASELINE = os.path.join(REPO, "benchmarks", "results_cpu_f64.jsonl")


@pytest.fixture(scope="module")
def rows():
    with open(BASELINE) as f:
        return [json.loads(line) for line in f if line.strip()]


def run_judge(fresh_rows, tmp_path, *extra):
    fresh = tmp_path / "fresh.jsonl"
    fresh.write_text("".join(json.dumps(r) + "\n" for r in fresh_rows))
    return subprocess.run(
        [sys.executable, JUDGE, "--fresh", str(fresh), *extra],
        capture_output=True, text=True,
    )


def test_identical_run_is_green(rows, tmp_path):
    r = run_judge(rows, tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout


def test_injected_slowdown_is_red(rows, tmp_path):
    bad = [dict(r) for r in rows]
    bad[0]["median_ms"] *= 10
    if "min_ms" in bad[0]:
        bad[0]["min_ms"] *= 10  # the judge compares min-of-N (load-robust)
    r = run_judge(bad, tmp_path)
    assert r.returncode == 1
    kinds = [json.loads(line)["kind"]
             for line in r.stdout.splitlines() if line.startswith("{")]
    assert kinds == ["time"]


def test_iteration_count_change_is_red_at_any_magnitude(rows, tmp_path):
    bad = [dict(r) for r in rows]
    bad[1]["iters"] += 1
    r = run_judge(bad, tmp_path)
    assert r.returncode == 1
    kinds = [json.loads(line)["kind"]
             for line in r.stdout.splitlines() if line.startswith("{")]
    assert kinds == ["behavior"]


def test_missing_row_is_red(rows, tmp_path):
    r = run_judge(rows[1:], tmp_path)
    assert r.returncode == 1
    kinds = [json.loads(line)["kind"]
             for line in r.stdout.splitlines() if line.startswith("{")]
    assert kinds == ["missing"]


def test_speedup_is_green(rows, tmp_path):
    fast = [dict(r) for r in rows]
    for r in fast:
        r["median_ms"] *= 0.1
        if "min_ms" in r:
            r["min_ms"] *= 0.1
    res = run_judge(fast, tmp_path)
    assert res.returncode == 0, res.stdout + res.stderr
