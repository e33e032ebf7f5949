"""Benchmark-regression judge: fail CI when a fresh solver-matrix run
regresses against the committed baseline.

Port of the reference's PR-vs-master benchmark judge
(``/root/reference/benchmark/runbenchmarks.jl:56-76`` +
``.github/workflows/benchmark.yml``), adapted to a committed-baseline
workflow: instead of checking out master and re-running it (slow, and the
runner fleet is heterogeneous), the baseline JSONL is committed
(``benchmarks/results_cpu_f64.jsonl``) and every CI run re-measures the same
matrix and compares row by row.

Two failure classes, judged differently:

* **behavioral regressions** — ``iters`` (deterministic on CPU f64: same
  data, same algorithm) or ``converged`` changing at all.  These are hard
  failures at any magnitude: an algorithm change that alters trajectories
  must come with a baseline update (``--update``).
* **wall-time regressions** — ``median_ms`` above ``threshold x`` the
  committed median (default 1.5x: generous enough for shared-runner noise,
  tight enough to catch a dropped fusion or an accidental de-jit).  Rows
  faster than baseline never fail; sub-millisecond baseline rows are exempt
  from the time check (pure noise at that scale) but still iter-checked.

Usage:
    python benchmarks/regression_check.py                 # judge vs baseline
    python benchmarks/regression_check.py --update        # re-record baseline
    python benchmarks/regression_check.py --threshold 2.0 --repeat 3

Exit code 0 = all green; 1 = regression(s), each printed as a JSON line with
``"regression": true``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_BASELINE = os.path.join(HERE, "results_cpu_f64.jsonl")
MIN_JUDGED_MS = 1.0  # below this, runner noise dominates the median


def load_rows(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            rows[(r["workload"], r["solver"])] = r
    return rows


def judge(baseline, fresh, threshold):
    failures = []
    for key, base in baseline.items():
        new = fresh.get(key)
        wname, sname = key
        if new is None:
            failures.append({
                "workload": wname, "solver": sname, "regression": True,
                "kind": "missing", "detail": "row absent from fresh run",
            })
            continue
        if new["iters"] != base["iters"] or (
            bool(new["converged"]) != bool(base["converged"])
        ):
            failures.append({
                "workload": wname, "solver": sname, "regression": True,
                "kind": "behavior",
                "detail": (
                    f"iters {base['iters']} -> {new['iters']}, converged "
                    f"{base['converged']} -> {new['converged']}"
                ),
            })
        # judge on MIN-of-N, not median: min is the load-robust estimator
        # (what BenchmarkTools' min-time judge uses, runbenchmarks.jl:56-76)
        # — a transiently loaded runner inflates medians 2-4x while minima
        # move far less (observed: 3 same-code judge runs under varying
        # load flagged 0/4/6 rows on medians; an A/B worktree run showed
        # no real regression).  Fall back to median for old baselines.
        b_ms = base.get("min_ms", base["median_ms"])
        n_ms = new.get("min_ms", new["median_ms"])
        if b_ms >= MIN_JUDGED_MS and n_ms > threshold * b_ms:
            failures.append({
                "workload": wname, "solver": sname, "regression": True,
                "kind": "time",
                "detail": (
                    f"min {b_ms:.3f} ms -> {n_ms:.3f} ms "
                    f"({n_ms / b_ms:.2f}x > {threshold}x)"
                ),
            })
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=DEFAULT_BASELINE)
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="fail when fresh median exceeds this multiple of "
                    "the committed median")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--workloads", default="all",
                    help="subset, e.g. lasso_tiny,lasso_small (baseline "
                    "rows outside the subset are skipped)")
    ap.add_argument("--update", action="store_true",
                    help="re-record the baseline file instead of judging")
    ap.add_argument("--fresh", default=None,
                    help="judge a pre-recorded fresh JSONL instead of "
                    "re-running the matrix (for judge self-tests)")
    args = ap.parse_args()

    if args.fresh:
        fresh_rows = load_rows(args.fresh)
    else:
        from run_benchmarks import run_matrix

        results = run_matrix("float64", repeat=args.repeat, platform="cpu",
                             workloads=args.workloads, quiet=True)
        fresh_rows = {(r["workload"], r["solver"]): r for r in results}

    if args.update:
        # MERGE into the existing baseline: with --workloads (or a partial
        # --fresh) a plain rewrite would silently drop every other row —
        # and since judge() iterates baseline keys, the dropped rows would
        # never be judged again (no missing-row failure fires)
        merged = {}
        if os.path.exists(args.baseline):
            merged = load_rows(args.baseline)
        merged.update(fresh_rows)
        with open(args.baseline, "w") as f:
            for r in merged.values():
                f.write(json.dumps(r) + "\n")
        print(f"baseline updated: {args.baseline} ({len(fresh_rows)} rows "
              f"re-recorded, {len(merged)} total)")
        return 0

    baseline = load_rows(args.baseline)
    if args.workloads != "all":
        baseline = {
            k: v for k, v in baseline.items() if k[0] in args.workloads
        }
    failures = judge(baseline, fresh_rows, args.threshold)
    for f in failures:
        print(json.dumps(f))
    n = len(baseline)
    if failures:
        print(f"FAIL: {len(failures)} regression(s) across {n} rows",
              file=sys.stderr)
        return 1
    print(f"OK: {n} rows within {args.threshold}x of baseline, "
          f"iteration counts identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
