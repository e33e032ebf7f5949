"""Single-problem precision warm-starting on the reference's lasso_medium.

BASELINE.md round 4 recorded the honest single-problem story: all 10
solvers reach tol=1e-6 on the reference's largest own workload in f64 on
chip, but at 0.3-1.1x a single CPU core — the x64 software emulation pays
3-5x per iteration for hundreds of f32-reachable iterations.
``WarmStartedAlgorithm`` moves those iterations to native f32 and leaves
only the polish in f64; this measures the effect per solver family and
checks each warm solution against the cold-f64 one.

Usage: python benchmarks/warm_single_bench.py [--repeat 3]
Committed record: benchmarks/results_warm_single.jsonl (+ BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import proxtpu as pa  # noqa: E402
from proxtpu.parallel import WarmStartedAlgorithm  # noqa: E402
from proxtpu.prox import NormL1, make_least_squares  # noqa: E402
from run_benchmarks import load_workload  # noqa: E402

TOL = 1e-6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    A_np, b_np, lam = load_workload("lasso_medium.jld2")
    A = jnp.asarray(A_np, jnp.float64)
    b = jnp.asarray(b_np, jnp.float64)
    Lf = float(np.linalg.norm(A_np, 2) ** 2)
    x0 = jnp.zeros(A.shape[1], jnp.float64)
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "workload": "lasso_medium", "tol": TOL}), flush=True)

    # the families whose cold-f64 rows lose to CPU; each solver's own
    # stopping criterion, check_every=8 like the cold record
    FAMS = [
        ("FastForwardBackward", pa.FastForwardBackward,
         dict(Lf=Lf), 50_000),
        ("ZeroFPR", pa.ZeroFPR, dict(Lf=Lf), 5_000),
        ("PANOC", pa.PANOC, dict(Lf=Lf), 5_000),
        ("DRLS", pa.DRLS, dict(Lf=Lf), 5_000),
        ("ForwardBackward", pa.ForwardBackward, dict(Lf=Lf), 200_000),
        # the cold record's worst row (26 s, 54591 iterations, gamma=1
        # like the reference benchmark config).  Warm-starting CANNOT fix
        # this one and the row documents why: DR at gamma=1 contracts at
        # ~(1 - 1e-4) per step on this problem, so the FINAL decades
        # dominate the count — even a start within 3e-5 of the fixed
        # point (or handing off the shadow variable x itself, measured
        # separately: 13k f32 + 50k f64) still needs ~50k f64 iterations.
        # Warm-starting pays where the EARLY decades dominate (the
        # sublinear FB/FISTA phase), not in slow-linear tails.  warm_tol
        # is raised to DR's attainable f32 floor so the warm stage does
        # not burn to warm_maxit (the 1.2e-5 default is unattainable for
        # f32 DR at this scale).
        ("DouglasRachford", pa.DouglasRachford, dict(gamma=1.0), 100_000),
    ]
    for name, factory, extra, maxit in FAMS:
        problem = dict(f=make_least_squares(A, b), g=NormL1(lam), **extra)
        cold = factory(maxit=maxit, tol=TOL, check_every=8)
        wt = 3e-5 if name == "DouglasRachford" else 1.2e-5
        warm = WarmStartedAlgorithm(factory, maxit=maxit, tol=TOL,
                                    warm_tol=wt, check_every=8)

        def timeit(run):
            out = run()
            _ = np.asarray(out[0])  # host fence
            ts = []
            for _i in range(args.repeat):
                t0 = time.perf_counter()
                out = run()
                _ = np.asarray(out[0])
                ts.append(time.perf_counter() - t0)
            return float(np.min(ts)), out

        t_c, (x_c, it_c) = timeit(lambda: cold(x0=x0, **problem))
        t_w, (x_w, it_w) = timeit(lambda: warm(x0=x0, **problem))
        gap = float(jnp.max(jnp.abs(x_w - x_c)))
        print(json.dumps({
            "solver": name, "cold_ms": round(t_c * 1e3, 1),
            "warm_ms": round(t_w * 1e3, 1),
            "speedup": round(t_c / t_w, 2),
            "iters_cold": int(it_c), "iters_warm_total": int(it_w),
            "max_abs_gap": gap,
        }), flush=True)
        assert gap < 1e-3, (name, gap)


if __name__ == "__main__":
    main()
