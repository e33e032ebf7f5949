"""TPU measurement: per-trip pipeline overhead of the one-step lasso path.

Round-2 verdict weak #4: the flagship one-step path ran at ~286 us/iter
against a 128 us DMA floor, with ~270 us fixed per-trip overhead.  Round 3
moves the FISTA extrapolation + converged-lane freeze + residual read-out
into the kernel and aliases the x/z_prev carries to the outputs
(input_output_aliases), so the loop body is ONE pallas_call plus
(B,)-scalar bookkeeping.  This bench times the OLD body shape (separate
step kernel + XLA epilogue: 2 (B,N) where-selects + extrapolation axpys +
fresh HBM outputs per trip) against the NEW fused/aliased body,
back-to-back in one process, at a fixed iteration count (tol=0) so
per-iteration time is exact.

Usage: python benchmarks/trip_overhead_bench.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from proxtpu.kernels.lasso import (
    _fista_full_step_kernel,
    fused_fb_prox_grad,
    solve_lasso_batch,
)

B, M, N = 256, 200, 400
ITERS = 300
DTYPE = np.float32


@partial(jax.jit, static_argnames=("maxit",))
def old_body_solver(A, b, lam, Lf, tol, maxit=ITERS):
    """The round-2 one-step path: step kernel + XLA epilogue per trip."""
    Bn, _, Nn = A.shape
    dtype = A.dtype
    gamma = (1.0 / Lf).astype(dtype)
    thr = (gamma * lam).astype(dtype)
    x0 = jnp.zeros((Bn, Nn), dtype)
    z0, res0 = fused_fb_prox_grad(A, b, x0, gamma, thr)
    done0 = res0 / gamma <= tol
    t0 = jnp.ones((Bn,), dtype)
    t1 = (1 + jnp.sqrt(1 + 4 * t0 * t0)) / 2
    init = (jnp.asarray(1, jnp.int32), z0, z0, t1, done0,
            jnp.ones((Bn,), jnp.int32))

    def cond(c):
        return (c[0] < maxit) & jnp.logical_not(jnp.all(c[4]))

    def body(c):
        k, x, z_prev, t, done, iters = c
        t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        z, res = fused_fb_prox_grad(A, b, x, gamma, thr)
        beta = ((t - 1) / t_new)[:, None]
        x_new = z + beta * (z - z_prev)
        newly_done = res / gamma <= tol
        keep = done[:, None]
        x_new = jnp.where(keep, x, x_new)
        z = jnp.where(keep, z_prev, z)
        k = k + 1
        iters = jnp.where(done, iters, k)
        return (k, x_new, z, jnp.where(done, t, t_new), done | newly_done,
                iters)

    k, x, z, t, done, iters = jax.lax.while_loop(cond, body, init)
    return z, jnp.where(done, iters, k), done


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from proxtpu.kernels.common import auto_lanes


def _dma_reduce_kernel(A_ref, out_ref):
    # the cheapest op that still streams the whole A block from HBM:
    # one multiply-free reduction per lane
    L = A_ref.shape[0]
    for l in range(L):
        out_ref[l] = jnp.sum(A_ref[l]).reshape(1, 1)


@partial(jax.jit, static_argnames=("trips",))
def dma_floor_loop(A, trips=ITERS):
    """`trips` pallas_calls that each read all of A and emit (B,) sums —
    the in-session per-trip DMA + launch floor at this shape."""
    Bn, Mn, Nn = A.shape
    L = auto_lanes(Bn, Mn * Nn * A.dtype.itemsize, None)
    vspec = lambda shape: pl.BlockSpec(
        (L,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def one(A_, s):
        out = pl.pallas_call(
            _dma_reduce_kernel,
            grid=(Bn // L,),
            in_specs=[vspec((Mn, Nn))],
            out_specs=[vspec((1, 1))],
            out_shape=[jax.ShapeDtypeStruct((Bn, 1, 1), A_.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=Bn * Mn * Nn,
                bytes_accessed=Bn * Mn * Nn * A_.dtype.itemsize,
                transcendentals=0,
            ),
        )(A_)[0]
        return out.reshape(Bn)

    def body(c):
        k, acc = c
        # feed the accumulator back so trips serialize
        acc = acc + one(A + acc[0] * 0, acc)
        return (k + 1, acc)

    k, acc = jax.lax.while_loop(
        lambda c: c[0] < trips, body,
        (jnp.asarray(0, jnp.int32), jnp.zeros((Bn,), A.dtype)),
    )
    return (acc,)


@partial(jax.jit, static_argnames=("maxit", "alias"))
def full_step_solver(A, b, lam, Lf, tol, maxit=ITERS, alias=True):
    """Full-iteration kernel body, with and without the carry aliasing —
    isolates input_output_aliases from the in-kernel-epilogue change."""
    Bn, Mn, Nn = A.shape
    dtype = A.dtype
    gamma = (1.0 / Lf).astype(dtype)
    thr = (gamma * lam).astype(dtype)
    L = auto_lanes(Bn, Mn * Nn * dtype.itemsize, None)
    vspec = lambda shape: pl.BlockSpec(
        (L,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def full_step(x, z_prev, beta, dm):
        xo, zo, res, _rs = pl.pallas_call(
            _fista_full_step_kernel(),
            grid=(Bn // L,),
            in_specs=[
                vspec((Mn, Nn)), vspec((Mn, 1)), vspec((1, Nn)),
                vspec((1, Nn)), vspec((1, 1)), vspec((1, 1)),
                vspec((1, 1)), vspec((1, 1)),
            ],
            out_specs=[vspec((1, Nn)), vspec((1, Nn)), vspec((1, 1)),
                       vspec((1, 1))],
            out_shape=[
                jax.ShapeDtypeStruct((Bn, 1, Nn), dtype),
                jax.ShapeDtypeStruct((Bn, 1, Nn), dtype),
                jax.ShapeDtypeStruct((Bn, 1, 1), dtype),
                jax.ShapeDtypeStruct((Bn, 1, 1), dtype),
            ],
            input_output_aliases={2: 0, 3: 1} if alias else {},
        )(A, b.reshape(Bn, Mn, 1), x.reshape(Bn, 1, Nn),
          z_prev.reshape(Bn, 1, Nn),
          beta.reshape(Bn, 1, 1).astype(dtype),
          gamma.reshape(Bn, 1, 1), thr.reshape(Bn, 1, 1),
          dm.reshape(Bn, 1, 1))
        return xo.reshape(Bn, Nn), zo.reshape(Bn, Nn), res.reshape(Bn)

    x0 = jnp.zeros((Bn, Nn), dtype)
    z0, res0 = fused_fb_prox_grad(A, b, x0, gamma, thr)
    done0 = res0 / gamma <= tol
    t1 = (1 + jnp.sqrt(5.0)) / 2 * jnp.ones((Bn,), dtype)
    init = (jnp.asarray(1, jnp.int32), z0, z0, t1, done0,
            jnp.ones((Bn,), jnp.int32))

    def cond(c):
        return (c[0] < maxit) & jnp.logical_not(jnp.all(c[4]))

    def body(c):
        k, x, z_prev, t, done, iters = c
        t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        beta = (t - 1) / t_new
        xn, zn, res = full_step(x, z_prev, beta, done.astype(dtype))
        newly = res / gamma <= tol
        k = k + 1
        iters = jnp.where(done, iters, k)
        return (k, xn, zn, jnp.where(done, t, t_new), done | newly, iters)

    k, x, z, t, done, iters = jax.lax.while_loop(cond, body, init)
    return z, jnp.where(done, iters, k), done


def timed(tag, run, reps=5):
    t0 = time.perf_counter()
    out = run()
    np.asarray(out[0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    rec = {
        "variant": tag,
        "us_per_iter": med / ITERS * 1e6,
        "median_s": med,
        "iqr_s": [float(v) for v in np.percentile(times, [25, 75])],
        "compile_s": compile_s,
    }
    print(json.dumps(rec), flush=True)
    return out, rec


def main():
    rng = np.random.default_rng(0)
    A = jnp.asarray((rng.standard_normal((B, M, N)) / np.sqrt(M)).astype(DTYPE))
    b = jnp.asarray(rng.standard_normal((B, M)).astype(DTYPE))
    lam = jnp.asarray(
        0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", np.asarray(A),
                                      np.asarray(b))), axis=1).astype(DTYPE))
    Lf = jnp.asarray(np.array(
        [np.linalg.norm(np.asarray(A[i]), 2) ** 2 for i in range(B)],
        dtype=DTYPE))

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "iters": ITERS, "shape": [B, M, N]}), flush=True)

    # tol=0: every lane runs exactly ITERS iterations in every variant
    _, rec_dma = timed("dma_reduce_floor", lambda: dma_floor_loop(A))
    (z_old, _, _), rec_old = timed(
        "old_body", lambda: old_body_solver(A, b, lam, Lf, 0.0))
    (z_new, _, _), rec_new = timed(
        "fused_aliased_body",
        lambda: solve_lasso_batch(A, b, lam, Lf, 0.0, maxit=ITERS))
    (z_na, _, _), rec_na = timed(
        "fused_noalias_body",
        lambda: full_step_solver(A, b, lam, Lf, 0.0, alias=False))

    print(json.dumps({
        "max_abs_solution_gap": float(np.max(np.abs(
            np.asarray(z_old) - np.asarray(z_new)))),
        "noalias_gap": float(np.max(np.abs(
            np.asarray(z_na) - np.asarray(z_new)))),
        "speedup_fused_vs_old": rec_old["us_per_iter"] / rec_new["us_per_iter"],
        "alias_effect": rec_na["us_per_iter"] / rec_new["us_per_iter"],
        "old_vs_dma_floor": rec_old["us_per_iter"] / rec_dma["us_per_iter"],
    }), flush=True)


if __name__ == "__main__":
    main()
