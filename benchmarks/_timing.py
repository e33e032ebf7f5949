"""Shared host-fenced timing core for the batched-solver benchmarks.

``jax.block_until_ready`` does not block on the axon tunnel backend
(BASELINE.md measurement notes), so every benchmark fences with a host
transfer of the solution array.  One warm (compile) run, then ``reps``
timed runs; the median is the reported estimator, with the 25/75
percentiles as spread.
"""

from __future__ import annotations

import time

import numpy as np


def timed_solve(run, reps, batch):
    """Time ``run()`` (returning ``(solution, iters, done)``) ``reps``
    times after one compile run, fencing each with a host transfer.

    Returns ``(solution_host, record)`` where ``record`` carries the
    common benchmark fields; callers add/rename fields as their jsonl
    schema needs.
    """
    t0 = time.perf_counter()
    out = run()
    sol = np.asarray(out[0])  # host transfer is the only reliable fence
    t_compile = time.perf_counter() - t0
    iters = np.asarray(out[1])
    done = np.asarray(out[2])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        sol = np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    lo, hi = np.percentile(times, [25, 75])
    rec = {
        "problems_per_sec": batch / med,
        "median_s": med,
        "iqr_s": [float(lo), float(hi)],
        "compile_s": t_compile,
        "all_done": bool(done.all()),
        "done_frac": float(done.mean()),
        "iters_median": int(np.median(iters)),
        "iters_max": int(iters.max()),
    }
    return sol, rec
