"""Batched 1-D total-variation denoising on one TPU chip.

An eighth measured problem family, and the sharpest possible baseline
contest in the suite: the CPU reference algorithm (Condat 2013's direct
taut-string scan, the method behind ``ProximalOperators.TotalVariation1D``)
is *O(N) direct* — no iterations, ~1k solves/s/core in plain NumPy — while
the TPU path (``proxtpu.prox.TotalVariation1D``) is an *iterative* dual
FGP (Beck-Teboulle) that trades per-solve optimality for batch shape:
B signals denoise as one (B, N) vectorized drive (the taut string's
data-dependent pointer scan cannot batch, vectorize, or jit).

So unlike the matvec families (where batching wins ~100x against an
algorithm of the same complexity class), this row measures how much MXU-free
VPU streaming buys against a strictly cheaper sequential algorithm — the
honest "iterative-but-parallel vs direct-but-serial" trade.

Correctness gate: every returned lane is compared against the f64
taut-string solution (exact oracle, validated against SLSQP epigraph QPs
in ``tests/test_prox_catalogue_completion.py``); worst inf-error is
committed in the jsonl and asserted below the f32 attainability bound.

Usage: python benchmarks/tv1d_bench.py [--batch 8192] [--n 512] [--reps 3]
Committed record: benchmarks/results_tv1d.jsonl.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LAM = 0.3
NOISE = 0.3
N_PIECES = 8
ORACLE_LANES = 1024  # f64 taut-string accuracy gate on this many lanes
BASELINE_SOLVES = 64


def tv1d_condat(y, lam):
    """Condat (2013), "A direct algorithm for 1-D total variation
    denoising", Algorithm 1 (0-indexed): argmin_x 1/2||x-y||^2 + lam*TV(x).

    The exact sequential taut-string scan ProximalOperators.jl's
    ``TotalVariation1D`` prox uses — the per-signal CPU baseline here, and
    the f64 oracle for the accuracy gate."""
    y = np.asarray(y, dtype=np.float64)
    N = y.shape[0]
    x = np.empty(N)
    if N == 1:
        return y.copy()
    k = k0 = km = kp = 0
    vmin, vmax = y[0] - lam, y[0] + lam
    umin, umax = lam, -lam
    while True:
        if k == N - 1:  # last sample: terminate or take the forced jump
            if umin < 0:
                x[k0:km + 1] = vmin
                k = k0 = km = km + 1
                kp = max(kp, k)
                vmin, umin = y[k], lam
                umax = y[k] + lam - vmax
            elif umax > 0:
                x[k0:kp + 1] = vmax
                k = k0 = kp = kp + 1
                km = max(km, k)
                vmax, umax = y[k], -lam
                umin = y[k] - lam - vmin
            else:
                x[k0:N] = vmin + umin / (k - k0 + 1)
                return x
            continue
        if y[k + 1] + umin < vmin - lam:  # negative jump necessary
            x[k0:km + 1] = vmin
            k = k0 = km = kp = km + 1
            vmin, vmax = y[k], y[k] + 2 * lam
            umin, umax = lam, -lam
        elif y[k + 1] + umax > vmax + lam:  # positive jump necessary
            x[k0:kp + 1] = vmax
            k = k0 = km = kp = kp + 1
            vmin, vmax = y[k] - 2 * lam, y[k]
            umin, umax = lam, -lam
        else:  # no jump: extend the segment, pull the string taut
            k += 1
            umin += y[k] - vmin
            umax += y[k] - vmax
            if umin >= lam:
                vmin += (umin - lam) / (k - k0 + 1)
                umin, km = lam, k
            if umax <= -lam:
                vmax += (umax + lam) / (k - k0 + 1)
                umax, kp = -lam, k

def gen_signals(B, N, seed=0):
    rng = np.random.default_rng(seed)
    steps = np.cumsum(rng.standard_normal((B, N_PIECES)), axis=1)
    truth = np.repeat(steps, N // N_PIECES, axis=1)
    return (truth + NOISE * rng.standard_normal((B, N))).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    B, N = args.batch, args.n
    if N % N_PIECES:
        ap.error(f"--n must be a multiple of {N_PIECES} (got {N})")

    from proxtpu.prox import TotalVariation1D

    Y = gen_signals(B, N)
    Yd = jnp.asarray(Y)

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "batch": B, "n": N, "lam": LAM,
                      "noise": NOISE}), flush=True)

    worst_committed = None
    for restart in (True, False):
        tv = TotalVariation1D(LAM, restart=restart)
        # prox returns (z, f_z); the (B,) value vector is the fence — it
        # depends on the full solution, so materializing it on the host
        # proves the loop finished, without paying the B*N solution
        # transfer through the tunnel (the round-5 streaming-protocol
        # finding, BASELINE.md; production consumers keep z on device)
        batched = jax.jit(jax.vmap(lambda y: tv.prox(y, 1.0)))

        t0 = time.perf_counter()
        _, val = batched(Yd)
        np.asarray(val)
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _, val = batched(Yd)
            np.asarray(val)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        lo, hi = np.percentile(times, [25, 75])
        Z = np.asarray(batched(Yd)[0])  # post-timing fetch for the gate

        # accuracy gate: f64 taut-string oracle on ORACLE_LANES lanes
        k = min(ORACLE_LANES, B)
        worst = 0.0
        for i in range(k):
            zo = tv1d_condat(Y[i].astype(np.float64), LAM)
            worst = max(
                worst, float(np.max(np.abs(Z[i].astype(np.float64) - zo)))
            )
        rec = {
            "variant": "tv1d_batched_dual_fgp_f32"
            + ("_restart" if restart else "_plain"),
            "batch": B, "n": N,
            "signals_per_sec": B / med,
            "median_s": med,
            "iqr_s": [float(lo), float(hi)],
            "compile_s": t_compile,
            "oracle_lanes": k,
            "worst_inf_err_vs_tautstring": worst,
        }
        print(json.dumps(rec), flush=True)
        # f32 iterates + stall-based dual stop: measured ~2e-4 worst on
        # unit-scale signals (CPU study); gate with margin
        assert worst < 1e-3, worst
        if restart:
            worst_committed = worst
            med_restart = med

    # sequential CPU baseline: the direct taut string, one signal at a time
    ts = []
    for i in range(min(BASELINE_SOLVES, B)):
        t0 = time.perf_counter()
        tv1d_condat(Y[i].astype(np.float64), LAM)
        ts.append(time.perf_counter() - t0)
    med_np = float(np.median(ts))
    print(json.dumps({
        "variant": "tv1d_sequential_tautstring_numpy",
        "signals_per_sec": 1.0 / med_np,
        "median_solve_s": med_np,
        "n_timed": len(ts),
        "speedup_batched_vs_direct": (B / med_restart) / (1.0 / med_np),
    }), flush=True)


if __name__ == "__main__":
    main()
