"""Fused Pallas TPU kernel for the batched lasso forward-backward step.

The hot op of the batched FB/FISTA solvers is, per problem lane i:

    z_i = soft_threshold(x_i - gamma_i * A_i^T (A_i x_i - b_i), gamma_i*lam_i)
    res_i = ||x_i - z_i||_inf

XLA compiles the two matvecs as separate batched GEMVs, reading every A_i
from HBM *twice* per iteration; since the step is memory-bound on A traffic
(SURVEY.md §7 stage 7), that caps throughput at half the roofline.  This
kernel performs the whole step in one pass: each grid step DMAs one lane's
A_i into VMEM (Pallas double-buffers the stream across grid steps
automatically), computes both contractions as VPU multiply-reduce in native
float32 (full precision — no MXU bf16 passes, and no 127/128 column waste
from matvec-shaped MXU calls), applies the prox, and emits the per-lane
convergence residual.

Layout: A_i is (M sublanes, N lanes); ``r = sum_N(A * x)`` is a lane
reduction to (M, 1); ``grad = sum_M(A * r)`` is a sublane reduction to
(1, N); everything else is elementwise on (1, N).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import auto_lanes


def _fb_step_kernel(A_ref, b_ref, x_ref, gamma_ref, thr_ref, z_ref, res_ref):
    # L lanes per grid step amortize the fixed per-step cost (grid overhead
    # and pipeline bubbles) over L problems; the per-lane body is 2-D (the
    # layout Mosaic handles best), unrolled statically over the L dim
    L = A_ref.shape[0]
    for l in range(L):
        A = A_ref[l]          # (M, N) in VMEM
        x = x_ref[l]          # (1, N)
        b = b_ref[l]          # (M, 1)
        gamma = gamma_ref[l, 0, 0]
        thr = thr_ref[l, 0, 0]

        r = jnp.sum(A * x, axis=1, keepdims=True) - b      # (M, 1) lane-reduce
        grad = jnp.sum(A * r, axis=0, keepdims=True)       # (1, N) sublane-reduce
        y = x - gamma * grad
        absy = jnp.abs(y)
        z = jnp.sign(y) * jnp.maximum(absy - thr, 0.0)
        z_ref[l] = z
        res_ref[l] = jnp.max(jnp.abs(x - z)).reshape(1, 1)


@partial(jax.jit, static_argnames=("interpret", "lanes"))
def fused_fb_prox_grad(A, b, x, gamma, thr, interpret=False, lanes=None):
    """One fused FB step for a batch of lasso problems.

    Args:
      A: (B, M, N) stacked operators.
      b: (B, M) stacked offsets.
      x: (B, N) current iterates.
      gamma: (B,) per-lane stepsizes.
      thr: (B,) per-lane soft-threshold levels (gamma * lam).
      interpret: run in interpreter mode (for CPU tests).
      lanes: problems per grid step (amortizes per-step overhead; VMEM use
        is ~2 * lanes * M * N * 4 bytes with double buffering).  Default:
        largest of {8, 4, 2, 1} that divides B and fits ~8 MB.

    Returns:
      z: (B, N) prox points; res_inf: (B,) ||x - z||_inf per lane.
    """
    B, M, N = A.shape
    dtype = A.dtype
    L = auto_lanes(B, M * N * dtype.itemsize, lanes)
    b3 = b.reshape(B, M, 1)
    # TPU lowering requires the last two block dims to divide (8, 128) or
    # equal the array dims — so vectors ride as (B, 1, N) with (L, 1, N)
    # blocks rather than (B, N) with (L, N) blocks.
    x3 = x.reshape(B, 1, N)
    gamma2 = gamma.reshape(B, 1, 1).astype(dtype)
    thr2 = thr.reshape(B, 1, 1).astype(dtype)

    z, res = pl.pallas_call(
        _fb_step_kernel,
        grid=(B // L,),
        in_specs=[
            pl.BlockSpec((L, M, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, M, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N), dtype),
            jax.ShapeDtypeStruct((B, 1, 1), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * M * N,
            bytes_accessed=B * M * N * dtype.itemsize + 3 * B * N * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, b3, x3, gamma2, thr2)
    return z.reshape(B, N), res.reshape(B)


def reference_fb_prox_grad(A, b, x, gamma, thr):
    """Pure-XLA reference of the fused step (same math, two A reads)."""
    r = jnp.einsum("bmn,bn->bm", A, x,
                   precision=jax.lax.Precision.HIGHEST) - b
    grad = jnp.einsum("bmn,bm->bn", A, r,
                      precision=jax.lax.Precision.HIGHEST)
    y = x - gamma[:, None] * grad
    z = jnp.sign(y) * jnp.maximum(jnp.abs(y) - thr[:, None], 0.0)
    return z, jnp.max(jnp.abs(x - z), axis=1)


@partial(
    jax.jit,
    static_argnames=("maxit", "use_kernel", "interpret"),
)
def solve_lasso_batch(
    A, b, lam, Lf, tol, maxit=1000, use_kernel=True, interpret=False
):
    """Batched FISTA lasso solver with the fused Pallas step.

    Per-lane convergence freezing matches
    :func:`proxtpu.parallel.batch.batched_run_loop` semantics: converged
    lanes stop changing, per-lane iteration counts are reported.  Stopping
    rule is the FB-family criterion ``||x - z||_inf / gamma <= tol``.
    """
    B, M, N = A.shape
    dtype = A.dtype
    gamma = (1.0 / Lf).astype(dtype)
    thr = (gamma * lam).astype(dtype)
    step_fn = (
        partial(fused_fb_prox_grad, interpret=interpret)
        if use_kernel
        else reference_fb_prox_grad
    )

    x0 = jnp.zeros((B, N), dtype)
    z0, res0 = step_fn(A, b, x0, gamma, thr)
    # state: (k, x, z_prev, t, done, iters); the init FB step counts as
    # iteration 1.  The first extrapolation coefficient is beta = 0 (t=1),
    # so the next point is z0 itself: carry x = z0 with the t-sequence
    # already advanced once, matching the generic FISTA driver's counts.
    done0 = res0 / gamma <= tol
    t0 = jnp.ones((B,), dtype)
    t1 = (1 + jnp.sqrt(1 + 4 * t0 * t0)) / 2
    init = (
        jnp.asarray(1, jnp.int32),
        z0,
        z0,
        t1,
        done0,
        jnp.ones((B,), jnp.int32),
    )

    def cond(c):
        k, done = c[0], c[4]
        return (k < maxit) & jnp.logical_not(jnp.all(done))

    def body(c):
        k, x, z_prev, t, done, iters = c
        # FB step at the current extrapolated point, then Nesterov
        # extrapolation with the simple t-sequence
        t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        z, res = step_fn(A, b, x, gamma, thr)
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
    iters = jnp.where(done, iters, k)
    return z, iters, done
