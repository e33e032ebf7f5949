"""Measure the generic-batched-driver vs specialized/kernel paths on ONE chip.

Round-1 VERDICT flagged a 9x gap between `batched_run_loop` (the generic
vmapped driver every algorithm uses) and the fused kernel path on the
flagship 200x400/batch-256 lasso workload, measured across *different*
processes on the wandering axon tunnel.  This script measures all paths in
ONE process, back-to-back, host-transfer fenced, median of `--repeat` runs:

  generic    batched_run_loop + FISTA iteration (LeastSquaresLoss oracle)
  einsum     solve_lasso_batch(use_kernel=False) — specialized XLA step
  kernel     solve_lasso_batch(use_kernel=True) — fused Pallas one-step
  packed     solve_lasso_batch_packed — zero-lane-padding packed A stream
  blocked    solve_lasso_batch_blocked(iter_block=K) — A resident in VMEM
  qp_xla / qp_kernel / qp_blocked — the box-QP family (VERDICT r1 weak #5)

For each path it reports end-to-end problems/s *and* a fixed-iteration
(tol=0) per-iteration time, which is stable under tunnel load variance.

Usage: python benchmarks/driver_gap.py [--repeat 5] [--batch 256] ...
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(tree):
    import jax

    return [np.asarray(l) for l in jax.tree.leaves(tree)]


def timed(fn, repeat):
    fence(fn())  # compile + warm
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fence(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), float(np.min(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--maxit", type=int, default=2000)
    ap.add_argument("--fixed-it", type=int, default=512)
    ap.add_argument("--paths", default="generic,generic_k8,einsum,kernel,packed,blocked,qp")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-fixed", action="store_true",
                    help="skip the tol=0 fixed-iteration pass (halves the "
                    "number of TPU compiles; per_iter_us reported as null)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    platform = jax.devices()[0].platform
    paths = set(args.paths.split(","))

    B, M, N = args.batch, args.m, args.n
    rng = np.random.default_rng(0)
    As = (rng.standard_normal((B, M, N)) / np.sqrt(M)).astype(np.float32)
    bs = rng.standard_normal((B, M)).astype(np.float32)
    lams = (0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", As, bs)), axis=1)
            ).astype(np.float32)
    Lfs = np.array([np.linalg.norm(As[i], 2) ** 2 for i in range(B)],
                   np.float32)
    A, b = jnp.asarray(As), jnp.asarray(bs)
    lam, Lf = jnp.asarray(lams), jnp.asarray(Lfs)

    out = []

    def record(name, solve_fn, n_problems, mean_iters_fn=None):
        dt, dt_min = timed(lambda: solve_fn(args.tol, args.maxit),
                           args.repeat)
        if args.skip_fixed:
            dt_fix = None
        else:
            dt_fix, _ = timed(lambda: solve_fn(0.0, args.fixed_it),
                              args.repeat)
        res = solve_fn(args.tol, args.maxit)
        iters = np.asarray(res[1])
        done = np.asarray(res[2])
        rec = {
            "path": name,
            "problems_per_sec": round(n_problems / dt, 2),
            "problems_per_sec_best": round(n_problems / dt_min, 2),
            "per_iter_us": (None if dt_fix is None
                            else round(dt_fix / args.fixed_it * 1e6, 2)),
            "mean_iters": round(float(iters.mean()), 1),
            "frac_converged": round(float(done.mean()), 4),
            "platform": platform,
            "shape": f"{B}x{M}x{N}",
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)

    from proxtpu.kernels.lasso import (
        solve_lasso_batch,
        solve_lasso_batch_blocked,
    )

    if "einsum" in paths:
        record("einsum",
               lambda tol, maxit: solve_lasso_batch(
                   A, b, lam, Lf, tol, maxit=maxit, use_kernel=False), B)

    if "generic" in paths:
        from proxtpu.algorithms.fast_forward_backward import (
            make_fast_forward_backward_iteration,
        )
        from proxtpu.parallel.batch import batched_run_loop
        from proxtpu.prox import LeastSquaresLoss, NormL1

        iteration = jax.vmap(
            lambda Ai, bi, li, Li: make_fast_forward_backward_iteration(
                x0=jnp.zeros(N, jnp.float32),
                f=LeastSquaresLoss(Ai, bi),
                g=NormL1(li),
                gamma=1.0 / Li,
            )
        )(A, b, lam, Lf)
        record("generic",
               lambda tol, maxit: batched_run_loop(iteration, maxit, tol), B)

    if "generic_k8" in paths:
        from proxtpu.algorithms.fast_forward_backward import (
            make_fast_forward_backward_iteration,
        )
        from proxtpu.parallel.batch import batched_run_loop
        from proxtpu.prox import LeastSquaresLoss, NormL1

        iteration = jax.vmap(
            lambda Ai, bi, li, Li: make_fast_forward_backward_iteration(
                x0=jnp.zeros(N, jnp.float32),
                f=LeastSquaresLoss(Ai, bi),
                g=NormL1(li),
                gamma=1.0 / Li,
            )
        )(A, b, lam, Lf)
        record("generic_k8",
               lambda tol, maxit: batched_run_loop(
                   iteration, maxit, tol, check_every=8), B)

    if "multirhs_k8" in paths:
        from proxtpu.kernels.lasso import solve_lasso_multirhs

        A0 = jnp.asarray(As[0])
        Lf0 = float(Lfs[0])
        record("multirhs_k8",
               lambda tol, maxit: solve_lasso_multirhs(
                   A0, b, lam, Lf0, tol, maxit=maxit, iter_block=8), B)

    if "multirhs_k8_restart" in paths:
        from proxtpu.kernels.lasso import solve_lasso_multirhs

        A0 = jnp.asarray(As[0])
        Lf0 = float(Lfs[0])
        record("multirhs_k8_restart",
               lambda tol, maxit: solve_lasso_multirhs(
                   A0, b, lam, Lf0, tol, maxit=maxit, iter_block=8,
                   restart=True), B)

    if "kernel" in paths and platform == "tpu":
        record("kernel",
               lambda tol, maxit: solve_lasso_batch(
                   A, b, lam, Lf, tol, maxit=maxit, use_kernel=True), B)

    if "packed" in paths and platform == "tpu":
        from proxtpu.kernels.lasso import solve_lasso_batch_packed

        record("packed",
               lambda tol, maxit: solve_lasso_batch_packed(
                   A, b, lam, Lf, tol, maxit=maxit), B)

    if "blocked" in paths and platform == "tpu":
        record("blocked_k8",
               lambda tol, maxit: solve_lasso_batch_blocked(
                   A, b, lam, Lf, tol, maxit=maxit, iter_block=8), B)

    if "multirhs" in paths:
        from proxtpu.kernels.lasso import solve_lasso_multirhs

        A0 = jnp.asarray(As[0])
        Lf0 = float(Lfs[0])
        record("multirhs_sharedA",
               lambda tol, maxit: solve_lasso_multirhs(
                   A0, b, lam, Lf0, tol, maxit=maxit), B)

    if "ksweep" in paths and platform == "tpu":
        for K in (16, 32):
            record(f"blocked_k{K}",
                   lambda tol, maxit, K=K: solve_lasso_batch_blocked(
                       A, b, lam, Lf, tol, maxit=maxit, iter_block=K), B)

    if "padtax" in paths and platform == "tpu":
        # lane-padding tax: N=400 occupies 512 lanes in VMEM; compare
        # per-iteration time against a true N=512 problem (28% more math in
        # the same physical tiles => identical per-iter time means the padded
        # lanes are pure waste at N=400)
        for Np in (512,):
            rngp = np.random.default_rng(2)
            Ap = jnp.asarray(
                (rngp.standard_normal((B, M, Np)) / np.sqrt(M)).astype(np.float32)
            )
            bp = jnp.asarray(rngp.standard_normal((B, M)).astype(np.float32))
            lamp = jnp.asarray(
                0.1 * np.max(np.abs(np.einsum(
                    "bmn,bm->bn", np.asarray(Ap), np.asarray(bp))), axis=1),
                jnp.float32)
            Lfp = jnp.asarray(
                [np.linalg.norm(np.asarray(Ap[i]), 2) ** 2 for i in range(B)],
                jnp.float32)
            record(f"blocked_k8_N{Np}",
                   lambda tol, maxit: solve_lasso_batch_blocked(
                       Ap, bp, lamp, Lfp, tol, maxit=maxit, iter_block=8), B)

    if "qp" in paths:
        from proxtpu.kernels.box_qp import (
            solve_box_qp_batch,
            solve_box_qp_batch_blocked,
        )

        for nq in (128, 256):
            Bq = args.batch
            rngq = np.random.default_rng(1)
            Us = rngq.standard_normal((Bq, nq, nq)).astype(np.float32)
            Qs = np.einsum("bij,bkj->bik", Us, Us) / nq
            Qs = (0.5 * (Qs + np.transpose(Qs, (0, 2, 1)))).astype(np.float32)
            qs = rngq.standard_normal((Bq, nq)).astype(np.float32)
            Lips = np.array([np.linalg.norm(Qs[i], 2) for i in range(Bq)],
                            np.float32)
            Qj, qj = jnp.asarray(Qs), jnp.asarray(qs)
            Lipj = jnp.asarray(Lips)

            def qp_solve(tol, maxit, use_kernel):
                return solve_box_qp_batch(
                    Qj, qj, -1.0, 1.0, Lipj, tol, maxit=maxit,
                    use_kernel=use_kernel,
                )

            sh = f"{Bq}x{nq}"
            record(f"qp_xla_{sh}",
                   lambda tol, maxit: qp_solve(tol, maxit, False), Bq)
            if platform == "tpu":
                record(f"qp_kernel_{sh}",
                       lambda tol, maxit: qp_solve(tol, maxit, True), Bq)
                record(f"qp_blocked_{sh}",
                       lambda tol, maxit: solve_box_qp_batch_blocked(
                           Qj, qj, -1.0, 1.0, Lipj, tol, maxit=maxit,
                           iter_block=8), Bq)

    return out


if __name__ == "__main__":
    main()
