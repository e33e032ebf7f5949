"""Benchmark: batched lasso problems/sec on one TPU chip.

The reference publishes no numbers (BASELINE.md); its harness solves lasso
instances one at a time on one CPU core with BenchmarkTools
(/root/reference/benchmark/runbenchmarks.jl:43-76).  The TPU-native headline
metric (BASELINE.json) is *batched problems/sec to convergence*: a stacked
batch of lasso instances solved by the fused-Pallas-kernel batched FISTA
driver, every per-lane matvec fused into one MXU-fed kernel step.

Configurations measured every round (round-5 protocol; see ``timed`` /
``timed_streaming``):

* **headline** — the library's best validated distinct-A path under the
  PRODUCTION EXECUTION MODEL:
  ``solve_lasso_batch_packed_tail(restart=True, k1=192, tail=64)``
  (per-lane O'Donoghue-Candès adaptive restart, in-kernel,
  zero-lane-padding packed A stream for the bulk, then the unconverged
  tail gathered into a 64-lane narrow continuation — in-jit ``lax.cond``
  fallback to full width if the tail overflows), measured as STREAMING
  throughput —
  a 6-solve stream drained through ``proxtpu.parallel.stream_solve``
  with depth 2 dispatched ahead (JAX async dispatch overlaps the
  per-call tunnel/host overhead, ~31 ms/call on this tunnel, with
  device compute — exactly how a pipeline drains a problem queue), each
  yield fenced by ``stream_solve``'s smallest-leaf host transfer (the
  256-byte per-lane done mask — a complete fence: the packed solver's
  outputs all come from one executable; the 400 KB solution stays on
  device as in production).
  Same stopping rule as everything else
  (``||x - z||_inf / gamma <= tol``); solutions are fetched once after
  timing and an inlined residual recheck asserts every returned lane's
  recomputed forward-backward residual is ``<= 1.1 * tol``, so the
  protocol change cannot silently trade accuracy.  Measured decomposition
  (``benchmarks/streaming_probe.py`` ->
  ``benchmarks/results_streaming.jsonl``, BASELINE.md round-5 streaming
  section): single-solve xs-fenced 3389 p/s -> iters fence 4070 ->
  steady-state depth-2 stream 6867 in the committed same-session run.
* **fenced single-solve** (stderr detail line) — the exact r1-4 headline
  protocol (one solve per rep, xs host transfer as the fence), kept for
  round-over-round comparability.
* **parity** — textbook FISTA (``restart=False``), same math/stopping
  protocol as rounds 1-3 (detail line on stderr), single-solve xs-fenced.

``vs_baseline`` is the measured speedup over the SAME algorithm as the
headline (FISTA + gradient-scheme adaptive restart), same data, same
stopping rule, implemented in single-threaded NumPy (a faithful stand-in
for the single-core Julia reference, which solves one problem at a time).
The textbook-vs-textbook ratio is reported in the detail line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

M, N = 200, 400
BATCH = 256
TOL = 1e-5
MAXIT = 2000  # batch converges in ~650 iterations at HIGHEST matmul precision
BASELINE_PROBLEMS = 32  # numpy baseline solves (median-of-32 per-solve time)
DTYPE = np.float32


def gen_problems(batch):
    rng = np.random.default_rng(0)
    As = (rng.standard_normal((batch, M, N)) / np.sqrt(M)).astype(DTYPE)
    bs = rng.standard_normal((batch, M)).astype(DTYPE)
    lams = 0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", As, bs)), axis=1)
    Lfs = np.array(
        [np.linalg.norm(As[i], 2) ** 2 for i in range(batch)], dtype=DTYPE
    )
    return As, bs, lams.astype(DTYPE), Lfs


def numpy_fista(A, b, lam, Lf, tol, maxit, restart=False):
    """Single-threaded baseline: FISTA with the simple t-sequence and the
    same ||res||_inf/gamma stopping rule.  ``restart=True`` adds the same
    O'Donoghue-Candès gradient-scheme adaptive restart the headline kernel
    uses: reset t (and zero the extrapolation) when <x - z_new, z_new - z>
    > 0."""
    n = A.shape[1]
    x = np.zeros(n, DTYPE)
    z = x.copy()
    gamma = DTYPE(1.0) / Lf
    t = 1.0
    for k in range(1, maxit + 1):
        grad = A.T @ (A @ x - b)
        y = x - gamma * grad
        z_new = np.sign(y) * np.maximum(np.abs(y) - gamma * lam, 0)
        res = x - z_new
        if np.max(np.abs(res)) / gamma <= tol:
            return z_new, k
        if restart and float(np.dot(x - z_new, z_new - z)) > 0.0:
            t, beta = 1.0, 0.0
        else:
            t_new = (1 + np.sqrt(1 + 4 * t * t)) / 2
            beta = (t - 1) / t_new
            t = t_new
        x = z_new + beta * (z_new - z)
        z = z_new
    return z, maxit


def run_numpy_baseline(As, bs, lams, Lfs, restart):
    """Per-solve timing over >= 32 problems; the baseline problems/s is the
    reciprocal of the MEDIAN per-solve time, so a transient host-load spike
    during any one solve cannot move the denominator (r2 VERDICT weak #6 —
    the old 8-solve aggregate wandered with hourly machine load).  Returns
    (problems/s, mean iters, per-solve IQR / median)."""
    k = min(BASELINE_PROBLEMS, As.shape[0])
    times, iters = [], []
    for i in range(k):
        t0 = time.perf_counter()
        _, it = numpy_fista(
            As[i], bs[i], lams[i], Lfs[i], TOL, MAXIT, restart=restart
        )
        times.append(time.perf_counter() - t0)
        iters.append(it)
    med = float(np.median(times))
    iqr = float(np.percentile(times, 75) - np.percentile(times, 25))
    return 1.0 / med, float(np.mean(iters)), iqr / med


def _recheck_residuals(As, bs, lams, Lfs, xs, tol):
    """Inlined accuracy gate (round-3 restart study): recompute the f32
    forward-backward residual ||x - prox_g(x - gamma grad f(x))||_inf/gamma
    at every returned lane and require <= 1.1*tol.  Guards the headline
    number against any fast path that trades accuracy for speed."""
    gam = (1.0 / Lfs)[:, None]
    grad = np.einsum("bmn,bm->bn", As, np.einsum("bmn,bn->bm", As, xs) - bs)
    y = xs - gam * grad
    z = np.sign(y) * np.maximum(np.abs(y) - gam * lams[:, None], 0.0)
    res = np.max(np.abs(xs - z), axis=1) / gam[:, 0]
    worst = float(np.max(res))
    assert worst <= 1.1 * tol, (
        f"residual recheck failed: worst lane {worst:.3e} > 1.1*tol "
        f"{1.1 * tol:.3e}"
    )
    return worst


def run_jax(As, bs, lams, Lfs):
    """Measure the fused-Pallas-kernel batched FISTA solver
    (proxtpu/kernels/lasso.py) in both configurations.  On non-TPU
    platforms the kernel runs in interpreter mode, so the XLA step is used
    there."""
    import jax
    import jax.numpy as jnp

    from proxtpu.kernels.lasso import (
        solve_lasso_batch,
        solve_lasso_batch_packed,
        solve_lasso_batch_packed_tail,
    )

    platform = jax.devices()[0].platform
    use_kernel = platform == "tpu"
    A = jnp.asarray(As)
    b = jnp.asarray(bs)
    lam = jnp.asarray(lams)
    Lf = jnp.asarray(Lfs)

    from functools import partial

    _jitted = {}

    def solve_dev(restart, tol=TOL, maxit=MAXIT, use_tail=False):
        """Dispatch one batched solve; results stay on device.

        The whole solver call is wrapped in ONE outer ``jax.jit`` (it is
        traceable end-to-end), so each solve costs a single executable
        launch instead of ~10 eager op dispatches for the packing
        transpose — on the tunnel that is the difference between ~31 ms
        and a few ms of host path per call (measured +26% steady-state
        streaming throughput, bit-identical solutions; BASELINE.md
        round-5 streaming section)."""
        key = (use_kernel, use_tail, restart, tol, maxit)
        if key not in _jitted:
            if use_kernel and use_tail:
                # headline path: packed bulk + narrow tail continuation
                # (k1/tail tuned to this workload's convergence profile —
                # 192 iterations leave ~31 of 256 lanes, streaming_probe;
                # the in-jit wide fallback covers any mis-tune)
                _jitted[key] = jax.jit(partial(
                    solve_lasso_batch_packed_tail, tol=tol, maxit=maxit,
                    k1=192, tail=64, restart=restart,
                ))
            elif use_kernel:
                # packed zero-padding kernel (falls back to the natural
                # layout internally when N is already lane-aligned)
                _jitted[key] = jax.jit(partial(
                    solve_lasso_batch_packed, tol=tol, maxit=maxit,
                    restart=restart,
                ))
            else:
                _jitted[key] = jax.jit(partial(
                    solve_lasso_batch, tol=tol, maxit=maxit,
                    use_kernel=False, restart=restart,
                ))
        return _jitted[key](A, b, lam, Lf)

    def solve(restart, tol=TOL, maxit=MAXIT):
        xs, iters, done = solve_dev(restart, tol, maxit)
        # NOTE: jax.block_until_ready does NOT actually block on the axon
        # backend; a host transfer is the only reliable completion fence.
        return np.asarray(xs), np.asarray(iters), np.asarray(done)

    # Protocol (round-5 hardening): 1 warm/compile run, then timed reps
    # spread over EPOCHS separated by sleeps.  The axon tunnel's
    # deliverable rate is bimodal on minute scales (+-35%, BASELINE.md
    # round-4 window-lottery section) and sticky within a process-minute,
    # so 5 back-to-back reps all sample ONE window; 3 epochs x 3 reps with
    # ~25 s gaps sample ~3 windows and the median lands mid-distribution —
    # the committed number stops inheriting a single window draw.  The IQR
    # over all 9 reps makes a cross-window spread visible in the output.
    def timed(restart, epochs=3, reps=3, gap_s=25.0):
        xs, iters, done = solve(restart)  # compile + warm
        times = []
        epoch_medians = []
        for e in range(epochs):
            if e:
                time.sleep(gap_s)
            et = []
            for _ in range(reps):
                t0 = time.perf_counter()
                xs, iters, done = solve(restart)
                et.append(time.perf_counter() - t0)
            times += et
            epoch_medians.append(BATCH / float(np.median(et)))
        dt = float(np.median(times))
        iqr = float(np.percentile(times, 75) - np.percentile(times, 25))
        return {
            "pps": BATCH / dt,
            "rel_iqr": iqr / dt,
            "mean_it": float(np.mean(iters)),
            "max_it": int(np.max(iters)),
            "frac_done": float(np.mean(done)),
            "epoch_pps": epoch_medians,
            "xs": xs,
        }

    def timed_streaming(restart, depth=2, n_stream=6, epochs=3, reps=3,
                        gap_s=25.0):
        """Round-5 headline protocol: STEADY-STATE STREAMING throughput
        via the library's own ``stream_solve`` — a stream of ``n_stream``
        batched solves drained with ``depth`` dispatched ahead (JAX async
        dispatch overlaps the per-call host/tunnel overhead with device
        compute, exactly how a production pipeline drains a problem
        queue).  Each yield is fenced by the helper's smallest-leaf host
        transfer (the 256-byte per-lane done mask; since round 5 the
        packed solver's unpack runs inside the jitted core, so all
        outputs come from ONE executable and any leaf is a complete
        fence — the 400 KB solution array stays on device, as in
        production).  ``n_stream > depth`` makes the in-loop fence path
        dominate, i.e. the measured regime is the steady state, not a
        dispatch burst (streaming_probe.py measured the burst regime
        ~25% slower).  Solutions are fetched ONCE after timing and
        residual-rechecked, so the accuracy gate is unchanged.  Same
        epoch structure as ``timed`` (the window-lottery hardening)."""
        from proxtpu.parallel import stream_solve

        xs_dev, iters_dev, done_dev = solve_dev(
            restart, use_tail=use_kernel)  # compile + warm
        _ = np.asarray(iters_dev)
        times = []
        epoch_medians = []
        for e in range(epochs):
            if e:
                time.sleep(gap_s)
            et = []
            for _ in range(reps):
                t0 = time.perf_counter()
                outs = list(stream_solve(
                    lambda _p: solve_dev(restart, use_tail=use_kernel),
                    range(n_stream), depth=depth,
                ))
                et.append((time.perf_counter() - t0) / n_stream)
            times += et
            epoch_medians.append(BATCH / float(np.median(et)))
        dt = float(np.median(times))
        iqr = float(np.percentile(times, 75) - np.percentile(times, 25))
        xs_dev, iters_dev, done_dev = outs[-1]
        xs = np.asarray(xs_dev)  # post-timing fetch for the recheck
        iters = np.asarray(iters_dev)
        done = np.asarray(done_dev)
        return {
            "pps": BATCH / dt,
            "rel_iqr": iqr / dt,
            "mean_it": float(np.mean(iters)),
            "max_it": int(np.max(iters)),
            "frac_done": float(np.mean(done)),
            "epoch_pps": epoch_medians,
            "xs": xs,
        }

    headline = timed_streaming(restart=True)
    headline_fenced = timed(restart=True)
    headline["worst_res"] = _recheck_residuals(
        As, bs, lams, Lfs, headline["xs"], TOL
    )
    parity = timed(restart=False)

    # fixed-iteration timing on the headline kernel: tol=0 forces every
    # lane to run exactly maxit iterations.  The MARGINAL per-iteration
    # cost subtracts a maxit=1 run, so the ~38 ms per-call dispatch and
    # the xs-fence transfer cancel instead of inflating the figure ~2x
    # (round-5 review fix; matches streaming_probe.py's decomposition)
    fixed_it = 512

    def _median_wall(maxit):
        solve(True, tol=0.0, maxit=maxit)  # compile this variant
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            solve(True, tol=0.0, maxit=maxit)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    per_iter_us = (
        (_median_wall(fixed_it) - _median_wall(1)) / (fixed_it - 1) * 1e6
    )

    return headline, headline_fenced, parity, per_iter_us, platform


def main():
    As, bs, lams, Lfs = gen_problems(BATCH)
    headline, headline_fenced, parity, per_iter_us, platform = run_jax(
        As, bs, lams, Lfs
    )
    np_pps, np_iters, np_rel_iqr = run_numpy_baseline(
        As, bs, lams, Lfs, restart=True
    )
    np_plain_pps, np_plain_iters, _ = run_numpy_baseline(
        As, bs, lams, Lfs, restart=False
    )
    print(
        json.dumps(
            {
                "metric": "batched_lasso_problems_per_sec",
                "value": round(headline["pps"], 3),
                "unit": f"problems/s ({M}x{N} lasso to tol={TOL}, "
                f"batch={BATCH}, {platform}; adaptive-restart packed FISTA "
                f"kernel + 64-lane tail continuation under one outer jit, "
                f"STREAMING protocol: 6-solve "
                f"stream_solve drain (depth 2) fenced on the smallest "
                f"output leaf, solutions "
                f"fetched post-timing and residual-rechecked <=1.1*tol; "
                f"median of 3x3 reps across sleep-separated epochs "
                f"(window-lottery hardening), IQR "
                f"{100 * headline['rel_iqr']:.0f}%, "
                f"{per_iter_us:.0f} us/iter marginal (512-vs-1 fixed-it); single-solve "
                f"xs-fenced protocol (r1-4 semantics) "
                f"{headline_fenced['pps']:.0f} p/s restart / "
                f"{parity['pps']:.0f} p/s textbook; baseline "
                f"median-of-{BASELINE_PROBLEMS} numpy restart-FISTA "
                f"solves, IQR {100 * np_rel_iqr:.0f}%)",
                "vs_baseline": round(headline["pps"] / np_pps, 3),
            }
        )
    )
    print(
        f"# headline(restart, streaming depth-2): {headline['pps']:.2f} p/s "
        f"mean_it={headline['mean_it']:.0f} "
        f"max_it={headline['max_it']} "
        f"converged={headline['frac_done']:.3f} "
        f"rel_iqr={headline['rel_iqr']:.3f} "
        f"worst_recheck_res={headline['worst_res']:.2e} "
        f"per_iter={per_iter_us:.1f}us "
        f"epoch_medians="
        f"{'/'.join(f'{p:.0f}' for p in headline['epoch_pps'])}",
        file=sys.stderr,
    )
    print(
        f"# headline(restart, single-solve xs-fenced, r1-4 protocol): "
        f"{headline_fenced['pps']:.2f} p/s "
        f"rel_iqr={headline_fenced['rel_iqr']:.3f} "
        f"epoch_medians="
        f"{'/'.join(f'{p:.0f}' for p in headline_fenced['epoch_pps'])}",
        file=sys.stderr,
    )
    print(
        f"# parity(textbook): jax={parity['pps']:.2f} p/s "
        f"mean_it={parity['mean_it']:.0f} "
        f"converged={parity['frac_done']:.3f} "
        f"rel_iqr={parity['rel_iqr']:.3f} | numpy textbook "
        f"{np_plain_pps:.2f} p/s mean_it={np_plain_iters:.0f} "
        f"(textbook ratio {parity['pps'] / np_plain_pps:.1f}x) | numpy "
        f"restart {np_pps:.2f} p/s mean_it={np_iters:.0f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
