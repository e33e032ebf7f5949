"""Lane-packed (zero-padding) kernel vs the natural-layout kernel (TPU).

At the flagship 256x200x400 f32 shape the natural (M, N) layout pads
N=400 to 512 HBM/VMEM lanes, so ~22% of the A stream — which IS the
per-iteration cost (BASELINE.md round-3 pure-read ablation) — is dead
bytes.  ``solve_lasso_batch_packed`` interleaves p = 128/gcd(N,128)
problems per kernel row (W = p*N lanes, an exact multiple of 128) so the
stream carries no padding.  This measures, in one process:

* fixed-512-iteration per-iteration time (tol=0 protocol, stable under
  tunnel load) for the one-step kernel vs the packed kernel — the
  prediction from unpadded bytes is ~400/512 = 0.78x the natural layout;
* convergent solves at tol=1e-5 (plain and adaptive-restart), problems/s
  and per-lane parity vs the natural kernel.

Usage: python benchmarks/packed_bench.py [--reps 5]
Committed record: benchmarks/results_packed.jsonl (+ BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, M, N = 256, 200, 400
FIXED_ITERS = 512


def gen():
    rng = np.random.default_rng(0)
    As = (rng.standard_normal((B, M, N)) / np.sqrt(M)).astype(np.float32)
    bs = rng.standard_normal((B, M)).astype(np.float32)
    lams = (0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", As, bs)), axis=1)
            ).astype(np.float32)
    Lfs = np.array([np.linalg.norm(As[i], 2) ** 2 for i in range(B)],
                   np.float32)
    return As, bs, lams, Lfs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from proxtpu.kernels.lasso import (
        solve_lasso_batch,
        solve_lasso_batch_packed,
    )

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "shape": [B, M, N]}), flush=True)
    As, bs, lams, Lfs = gen()
    A, b = jnp.asarray(As), jnp.asarray(bs)
    lam, Lf = jnp.asarray(lams), jnp.asarray(Lfs)

    def timeit(run, reps):
        _ = np.asarray(run()[0])  # compile + warm
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = run()
            _ = np.asarray(out[0])  # host fence (axon: block_until_ready lies)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    # --- fixed-iteration per-iter cost (tol=0 -> exactly maxit iterations)
    rows = {}
    for key, run in [
        ("onestep", lambda: solve_lasso_batch(
            A, b, lam, Lf, 0.0, maxit=FIXED_ITERS, use_kernel=True)),
        ("packed", lambda: solve_lasso_batch_packed(
            A, b, lam, Lf, 0.0, maxit=FIXED_ITERS)),
    ]:
        med, _ = timeit(run, args.reps)
        per_iter = med / FIXED_ITERS
        rows[key] = per_iter
        print(json.dumps({"variant": f"fixed{FIXED_ITERS}_{key}",
                          "per_iter_us": per_iter * 1e6,
                          "median_s": med}), flush=True)
    print(json.dumps({"packed_vs_onestep_per_iter": rows["packed"]
                      / rows["onestep"],
                      "unpadded_bytes_prediction": N / 512}), flush=True)

    # --- convergent solves at tol (plain + restart): p/s and parity
    tol = 1e-5
    for restart in (False, True):
        tag = "restart" if restart else "plain"
        med_n, out_n = timeit(lambda: solve_lasso_batch(
            A, b, lam, Lf, tol, maxit=3000, use_kernel=True,
            restart=restart), args.reps)
        med_p, out_p = timeit(lambda: solve_lasso_batch_packed(
            A, b, lam, Lf, tol, maxit=3000, restart=restart), args.reps)
        z_n, i_n, d_n = (np.asarray(v) for v in out_n)
        z_p, i_p, d_p = (np.asarray(v) for v in out_p)
        assert d_n.all() and d_p.all()
        gap = float(np.max(np.abs(z_n - z_p)))
        count_match = float((i_n == i_p).mean())
        print(json.dumps({
            "variant": f"solve_tol1e-5_{tag}",
            "onestep_pps": B / med_n, "packed_pps": B / med_p,
            "speedup": med_n / med_p, "max_abs_gap": gap,
            "count_match_frac": count_match,
            "iters_median": int(np.median(i_p)),
        }), flush=True)
        # every packed solution satisfies the criterion, recomputed f64
        worst = 0.0
        for i in range(0, B, 16):
            A64 = As[i].astype(np.float64)
            x = z_p[i].astype(np.float64)
            gam = 1.0 / float(Lfs[i])
            y = x - gam * (A64.T @ (A64 @ x - bs[i].astype(np.float64)))
            zz = np.sign(y) * np.maximum(np.abs(y) - gam * float(lams[i]),
                                         0.0)
            worst = max(worst, float(np.max(np.abs(x - zz)) / gam))
        print(json.dumps({f"packed_{tag}_recomputed_residual_worst": worst,
                          "tol": tol}), flush=True)
        assert worst <= 1.5 * tol, worst


if __name__ == "__main__":
    main()
