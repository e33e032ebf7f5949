"""Per-call overhead / streaming-dispatch probe (round-5 protocol study).

Reproduces every number in BASELINE.md's "Streaming headline protocol"
section on the committed record (`results_streaming.jsonl`):

* fenced-each single-solve throughput under the xs fence vs the 2 KB
  iteration-count fence (the solution-transfer cost);
* pipelined dispatch at depth 2/4/8 (the `stream_solve` execution model);
* the maxit=1 vs maxit=512 decomposition (pure per-call overhead vs the
  marginal per-iteration cost);
* marginal per-iteration cost vs batch width on the natural-layout kernel
  (the tail-compaction bound);
* TV1D dual-FGP iteration counts with/without adaptive restart (the
  numbers in ``TotalVariation1D``'s docstring).

All rows are same-process, same-window comparisons — the tunnel's
absolute rate is bimodal on minute scales (BASELINE.md round-4 section),
so only intra-run ratios are meaningful.

Usage: python benchmarks/streaming_probe.py [--reps 5]
Committed record: benchmarks/results_streaming.jsonl.
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

M, N, B = 200, 400, 256
TOL = 1e-5


def gen(batch):
    """The EXACT headline workload: reuse bench.py's generator (same
    M/N/seed/lam/Lf recipe) so the decomposition keeps describing the
    number the driver records — a separate copy could silently drift."""
    import bench

    assert (bench.M, bench.N) == (M, N) and bench.TOL == TOL
    As, bs, lams, Lfs = bench.gen_problems(batch)
    return tuple(map(jnp.asarray, (As, bs, lams, Lfs)))


def med(ts):
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    reps = args.reps

    from proxtpu.kernels.lasso import (
        solve_lasso_batch,
        solve_lasso_batch_packed,
    )
    from proxtpu.parallel import stream_solve

    A, b, lam, Lf = gen(B)
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "shape": [B, M, N], "tol": TOL}), flush=True)

    def solve_dev(tol=TOL, maxit=2000):
        return solve_lasso_batch_packed(
            A, b, lam, Lf, tol, maxit=maxit, restart=True
        )

    # --- fence comparison (single solve) -------------------------------
    for fence_name in ("xs", "iters"):
        out = solve_dev()
        np.asarray(out[0] if fence_name == "xs" else out[1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = solve_dev()
            np.asarray(out[0] if fence_name == "xs" else out[1])
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "variant": f"fenced_each_{fence_name}",
            "problems_per_sec": B / med(ts), "median_s": med(ts),
        }), flush=True)

    # --- pipelined dispatch (stream_solve) -----------------------------
    # 3*depth problems per run, so the IN-LOOP fence path executes and
    # the steady-state regime (depth+1 calls in flight at each fence) is
    # what gets measured — with n_problems == depth everything would
    # dispatch up front and only the drain loop would fence, i.e. an
    # off-by-one-lighter pipeline than real stream_solve use (r5 review)
    for depth in (1, 2, 4, 8):
        n_probs = 3 * depth
        list(stream_solve(
            lambda _: solve_dev(), range(n_probs), depth=depth
        ))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            list(stream_solve(
                lambda _: solve_dev(), range(n_probs), depth=depth
            ))
            ts.append((time.perf_counter() - t0) / n_probs)
        print(json.dumps({
            "variant": f"pipelined_depth{depth}",
            "problems_per_sec": B / med(ts),
            "median_s_per_solve": med(ts),
            "n_problems_per_run": n_probs,
        }), flush=True)

    # --- overhead decomposition ----------------------------------------
    decomp = {}
    for maxit in (1, 512):
        for fence_name in ("xs", "iters"):
            out = solve_dev(tol=0.0, maxit=maxit)
            np.asarray(out[0] if fence_name == "xs" else out[1])
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = solve_dev(tol=0.0, maxit=maxit)
                np.asarray(out[0] if fence_name == "xs" else out[1])
                ts.append(time.perf_counter() - t0)
            decomp[f"maxit{maxit}_{fence_name}_ms"] = med(ts) * 1e3
    decomp["variant"] = "overhead_decomposition"
    decomp["per_iter_us"] = (
        (decomp["maxit512_iters_ms"] - decomp["maxit1_iters_ms"])
        / 511 * 1e3
    )
    decomp["xs_fence_cost_ms"] = (
        decomp["maxit1_xs_ms"] - decomp["maxit1_iters_ms"]
    )
    print(json.dumps(decomp), flush=True)

    # --- per-iteration cost vs batch width (natural-layout kernel) -----
    # MARGINAL cost: subtract a maxit=1 run at each width, so the ~38 ms
    # constant per-call overhead doesn't flatten the width scaling this
    # section exists to bound (r5 review; same subtraction as the
    # overhead-decomposition block above)
    for bw in (32, 64, 128, 256):
        Aw, bw_, lamw, Lfw = gen(bw)
        fix = 256

        def wall(maxit):
            def run():
                xs, it, dn = solve_lasso_batch(
                    Aw, bw_, lamw, Lfw, 0.0, maxit=maxit, restart=True
                )
                return np.asarray(it)

            run()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            return med(ts)

        w_fix, w_1 = wall(fix), wall(1)
        print(json.dumps({
            "variant": f"per_iter_vs_width_B{bw}",
            "per_iter_us": (w_fix - w_1) / (fix - 1) * 1e6,
            "total_ms_fixed": w_fix * 1e3,
            "overhead_ms_maxit1": w_1 * 1e3,
            "fixed_iters": fix,
        }), flush=True)

    # --- tail-continuation A/B (steady-state stream, outer jit) --------
    # the two-phase solver vs the single-phase packed solve, both under
    # one jax.jit, drained through stream_solve (the headline regime)
    from functools import partial as _partial

    from proxtpu.kernels.lasso import solve_lasso_batch_packed_tail

    for name, fn in (
        ("single_phase", jax.jit(_partial(
            solve_lasso_batch_packed, tol=TOL, maxit=2000, restart=True))),
        ("tail_k192_t64", jax.jit(_partial(
            solve_lasso_batch_packed_tail, tol=TOL, maxit=2000, k1=192,
            tail=64, restart=True))),
    ):
        out = fn(A, b, lam, Lf)
        np.asarray(out[1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            list(stream_solve(
                lambda _p: fn(A, b, lam, Lf), range(6), depth=2))
            ts.append((time.perf_counter() - t0) / 6)
        xs, iters, done = (np.asarray(o) for o in fn(A, b, lam, Lf))
        print(json.dumps({
            "variant": f"outer_jit_stream_{name}",
            "problems_per_sec": B / med(ts),
            "max_it": int(iters.max()),
            "all_done": bool(done.all()),
        }), flush=True)

    # --- TV1D dual iterations with/without restart ---------------------
    # The library prox does not return iteration counts, so this block
    # runs an INSTRUMENTED copy of the same dual loop (identical update
    # algebra, plus a per-lane k counter) and asserts its output matches
    # the library prox lane-for-lane — the counts quoted in
    # ``TotalVariation1D``'s docstring come from here.
    from proxtpu.prox import TotalVariation1D

    rng = np.random.default_rng(0)
    Bt, Nt = 4096, 512
    steps = np.cumsum(rng.standard_normal((Bt, 8)), axis=1)
    truth = np.repeat(steps, Nt // 8, axis=1)
    Y = jnp.asarray(
        (truth + 0.3 * rng.standard_normal((Bt, Nt))).astype(np.float32)
    )

    def counted_prox(lam, restart, maxit=2000, tol=1e-10):
        def prox(leaf, gamma):
            R = leaf.dtype
            thr = jnp.asarray(lam * gamma, R)
            eps = jnp.finfo(R).eps
            tolv = jnp.maximum(jnp.asarray(tol, R), 10 * eps) * (
                1 + jnp.max(jnp.abs(leaf))
            )

            def Dt(u):
                return jnp.pad(u, (1, 0)) - jnp.pad(u, (0, 1))

            u0 = jnp.zeros(leaf.shape[0] - 1, R)
            quarter = jnp.asarray(0.25, R)

            def cond(c):
                u, w, t, k, delta = c
                return (k < maxit) & (delta > tolv)

            def body(c):
                u, w, t, k, _ = c
                g = jnp.diff(Dt(w) - leaf)
                u_new = jnp.clip(w - quarter * g, -thr, thr)
                if restart:
                    do_r = jnp.sum((w - u_new) * (u_new - u)) > 0
                    t = jnp.where(do_r, jnp.ones((), R), t)
                t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
                beta = (t - 1) / t_new
                if restart:
                    beta = jnp.where(do_r, jnp.zeros((), R), beta)
                w_new = u_new + beta * (u_new - u)
                delta = jnp.max(jnp.abs(u_new - u), initial=0.0)
                return u_new, w_new, t_new, k + 1, delta

            u, _, _, k, _ = jax.lax.while_loop(
                cond, body,
                (u0, u0, jnp.ones((), R), jnp.zeros((), jnp.int32),
                 jnp.asarray(jnp.inf, R)),
            )
            return leaf - Dt(u), k

        return prox

    for restart in (False, True):
        tv = TotalVariation1D(0.3, restart=restart)
        lib = jax.jit(jax.vmap(lambda y: tv.prox(y, 1.0)[0]))
        inst = jax.jit(
            jax.vmap(lambda y: counted_prox(0.3, restart)(y, 1.0))
        )
        Z_lib = np.asarray(lib(Y))
        Z_inst, K = inst(Y)
        Z_inst, K = np.asarray(Z_inst), np.asarray(K)
        parity = float(np.max(np.abs(Z_lib - Z_inst)))
        # the two programs compile separately (the counter changes the
        # carry), so XLA may legally round differently by a ulp, which
        # can flip a restart decision on a knife-edge lane — gate at the
        # f32 solution-accuracy floor instead of demanding bitwise zero
        assert parity < 1e-5, parity
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _, K_ = inst(Y)
            np.asarray(K_)
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "variant": f"tv1d_restart_{restart}",
            "signals_per_sec": Bt / med(ts),
            "dual_iters_mean": float(K.mean()),
            "dual_iters_max": int(K.max()),
            "instrumented_parity_inf_err": parity,
        }), flush=True)


if __name__ == "__main__":
    main()
