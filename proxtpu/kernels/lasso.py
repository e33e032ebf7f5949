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


def _fista_full_step_kernel(A_ref, b_ref, x_ref, zp_ref, beta_ref,
                            gamma_ref, thr_ref, done_ref,
                            xo_ref, zo_ref, res_ref):
    """One complete FISTA iteration per lane: FB step + prox + Nesterov
    extrapolation + converged-lane freeze + residual read-out, all in VMEM.

    The per-trip XLA epilogue of :func:`solve_lasso_batch` (two (B, N)
    where-selects, the extrapolation axpys, and two fresh HBM buffers per
    trip) moves in here; with ``input_output_aliases`` the x/z_prev carry
    buffers are updated in place, so the loop body is ONE aliased
    pallas_call plus (B,)-scalar bookkeeping."""
    L = A_ref.shape[0]
    for l in range(L):
        A = A_ref[l]            # (M, N)
        x = x_ref[l]            # (1, N)
        zp = zp_ref[l]          # (1, N)
        bcol = b_ref[l]         # (M, 1)
        beta = beta_ref[l, 0, 0]
        gamma = gamma_ref[l, 0, 0]
        thr = thr_ref[l, 0, 0]
        dm = done_ref[l, 0, 0]  # 1.0 = frozen lane

        r = jnp.sum(A * x, axis=1, keepdims=True) - bcol
        grad = jnp.sum(A * r, axis=0, keepdims=True)
        y = x - gamma * grad
        z = jnp.sign(y) * jnp.maximum(jnp.abs(y) - thr, 0.0)
        x_new = z + beta * (z - zp)
        # frozen lanes keep their carry (the aliased buffers must still be
        # written: the VMEM output window is distinct from the input's)
        xo_ref[l] = dm * x + (1 - dm) * x_new
        zo_ref[l] = dm * zp + (1 - dm) * z
        res_ref[l] = ((1 - dm) * jnp.max(jnp.abs(x - z))).reshape(1, 1)


@partial(jax.jit, static_argnames=("interpret", "lanes"))
def fused_fista_full_step(A, b, x, z_prev, beta, gamma, thr, done_mask,
                          interpret=False, lanes=None):
    """One full FISTA iteration for the batch (see the kernel docstring).

    ``x`` and ``z_prev`` are aliased to the outputs — inside a
    ``while_loop`` the carry is updated in place with no fresh HBM
    allocation.  Returns (x_new, z_new, res_inf) with res_inf = 0 for
    frozen lanes."""
    B, M, N = A.shape
    dtype = A.dtype
    L = auto_lanes(B, M * N * dtype.itemsize, lanes)
    b3 = b.reshape(B, M, 1)
    x3 = x.reshape(B, 1, N)
    zp3 = z_prev.reshape(B, 1, N)
    s3 = lambda v: v.reshape(B, 1, 1).astype(dtype)
    vspec = lambda shape: pl.BlockSpec(
        (L,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    xo, zo, res = pl.pallas_call(
        _fista_full_step_kernel,
        grid=(B // L,),
        in_specs=[
            vspec((M, N)), vspec((M, 1)), vspec((1, N)), vspec((1, N)),
            vspec((1, 1)), vspec((1, 1)), vspec((1, 1)), vspec((1, 1)),
        ],
        out_specs=[vspec((1, N)), vspec((1, N)), vspec((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N), dtype),
            jax.ShapeDtypeStruct((B, 1, N), dtype),
            jax.ShapeDtypeStruct((B, 1, 1), dtype),
        ],
        input_output_aliases={2: 0, 3: 1},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * M * N,
            bytes_accessed=B * M * N * dtype.itemsize + 5 * B * N * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, b3, x3, zp3, s3(beta), s3(gamma), s3(thr), s3(done_mask))
    return xo.reshape(B, N), zo.reshape(B, N), res.reshape(B)


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

    if use_kernel:
        # full-iteration kernel: FB step + extrapolation + freeze live in
        # VMEM, the x/z_prev carries are aliased in place, and the body's
        # XLA epilogue is (B,)-scalar bookkeeping only
        def body(c):
            k, x, z_prev, t, done, iters = c
            t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
            beta = (t - 1) / t_new
            x_new, z, res = fused_fista_full_step(
                A, b, x, z_prev, beta, gamma, thr, done.astype(dtype),
                interpret=interpret,
            )
            newly_done = res / gamma <= tol
            k = k + 1
            iters = jnp.where(done, iters, k)
            return (k, x_new, z, jnp.where(done, t, t_new),
                    done | newly_done, iters)
    else:
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
            return (k, x_new, z, jnp.where(done, t, t_new),
                    done | newly_done, iters)

    k, x, z, t, done, iters = jax.lax.while_loop(cond, body, init)
    iters = jnp.where(done, iters, k)
    return z, iters, done


def _fb_k_steps_kernel(K):
    """Kernel factory: K FISTA iterations per invocation with A resident in
    VMEM — HBM reads A once per K iterations instead of once per iteration,
    turning the memory-bound step compute-bound (the iteration-blocking fast
    path; trajectories are identical to the one-step kernel, only the
    convergence read-out happens every K steps)."""

    def kernel(A_ref, b_ref, x_ref, zp_ref, t_ref, gamma_ref, thr_ref,
               done_ref, xo_ref, zo_ref, to_ref, res_ref):
        L = A_ref.shape[0]
        for l in range(L):
            A = A_ref[l]          # (M, N) stays in VMEM for all K steps
            bcol = b_ref[l]       # (M, 1)
            gamma = gamma_ref[l, 0, 0]
            thr = thr_ref[l, 0, 0]
            dm = done_ref[l, 0, 0]  # 1.0 = frozen lane

            def step(_, carry):
                x, zprev, t, _res = carry
                r = jnp.sum(A * x, axis=1, keepdims=True) - bcol
                grad = jnp.sum(A * r, axis=0, keepdims=True)
                y = x - gamma * grad
                z = jnp.sign(y) * jnp.maximum(jnp.abs(y) - thr, 0.0)
                res = jnp.max(jnp.abs(x - z))
                t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
                beta = (t - 1) / t_new
                x_new = z + beta * (z - zprev)
                return (x_new, z, t_new, res)

            x_in, zp_in, t_in = x_ref[l], zp_ref[l], t_ref[l, 0, 0]
            x, z, t, res = jax.lax.fori_loop(
                0, K, step, (x_in, zp_in, t_in, jnp.zeros((), A.dtype)),
            )
            # frozen lanes keep their carry (the freeze select that used
            # to run as XLA where-ops per trip)
            xo_ref[l] = dm * x_in + (1 - dm) * x
            zo_ref[l] = dm * zp_in + (1 - dm) * z
            to_ref[l] = (dm * t_in + (1 - dm) * t).reshape(1, 1)
            # stopping read-out: |x - z| of the last inner step — the same
            # criterion the one-step solver checks every iteration
            res_ref[l] = ((1 - dm) * res).reshape(1, 1)

    return kernel


@partial(jax.jit, static_argnames=("K", "interpret", "lanes"))
def fused_fista_k_steps(A, b, x, z_prev, t, gamma, thr, done_mask=None,
                        K=8, interpret=False, lanes=None):
    """Run K fused FISTA iterations for the whole batch in one kernel call.

    ``done_mask`` (B,) float 1.0-marks frozen lanes (their carry passes
    through unchanged, in-kernel); the x/z_prev/t carries are aliased to
    the outputs so a while-loop updates them in place.  Returns
    (x, z, t, res_inf) where res_inf is ||x - z||_inf of the final inner
    step (the FB-family stopping quantity; 0 for frozen lanes).
    """
    B, M, N = A.shape
    dtype = A.dtype
    L = auto_lanes(B, M * N * dtype.itemsize, lanes)
    b3 = b.reshape(B, M, 1)
    x3 = x.reshape(B, 1, N)
    zp3 = z_prev.reshape(B, 1, N)
    s3 = lambda v: v.reshape(B, 1, 1).astype(dtype)
    if done_mask is None:
        done_mask = jnp.zeros((B,), dtype)

    vspec = lambda shape: pl.BlockSpec(
        (L,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    xo, zo, to, res = pl.pallas_call(
        _fb_k_steps_kernel(K),
        grid=(B // L,),
        in_specs=[
            vspec((M, N)), vspec((M, 1)), vspec((1, N)), vspec((1, N)),
            vspec((1, 1)), vspec((1, 1)), vspec((1, 1)), vspec((1, 1)),
        ],
        out_specs=[vspec((1, N)), vspec((1, N)), vspec((1, 1)),
                   vspec((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N), dtype),
            jax.ShapeDtypeStruct((B, 1, N), dtype),
            jax.ShapeDtypeStruct((B, 1, 1), dtype),
            jax.ShapeDtypeStruct((B, 1, 1), dtype),
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2},
        cost_estimate=pl.CostEstimate(
            flops=4 * K * B * M * N,
            bytes_accessed=B * M * N * dtype.itemsize,
            transcendentals=K * B,
        ),
        interpret=interpret,
    )(A, b3, x3, zp3, s3(t), s3(gamma), s3(thr), s3(done_mask))
    return (xo.reshape(B, N), zo.reshape(B, N), to.reshape(B),
            res.reshape(B))


@partial(
    jax.jit, static_argnames=("maxit", "iter_block", "interpret", "lanes")
)
def solve_lasso_batch_blocked(
    A, b, lam, Lf, tol, maxit=2000, iter_block=8, interpret=False, lanes=None
):
    """Batched FISTA with K-step iteration blocking: A is read from HBM once
    per ``iter_block`` iterations instead of once per iteration.

    The iterate trajectory is identical to :func:`solve_lasso_batch`; the
    stopping criterion is only *sampled* every ``iter_block`` steps.  Since
    FISTA's fixed-point residual is non-monotone, a lane whose residual
    dips below tol between sample points keeps iterating until a sampled
    residual is below tol — iteration counts are an upper bound and the
    returned solutions are at least as converged as the one-step solver's.
    The trade: A is read from HBM once per ``iter_block`` iterations, which
    converts the memory-bound step into a compute-bound one.
    """
    B, M, N = A.shape
    dtype = A.dtype
    gamma = (1.0 / jnp.asarray(Lf)).astype(dtype)
    thr = (gamma * jnp.asarray(lam)).astype(dtype)
    K = iter_block

    x0 = jnp.zeros((B, N), dtype)
    z0, res0 = fused_fb_prox_grad(A, b, x0, gamma, thr, interpret=interpret,
                                  lanes=lanes)
    done0 = res0 / gamma <= tol
    t1 = (1 + jnp.sqrt(5.0)) / 2 * jnp.ones((B,), dtype)
    init = (jnp.asarray(1, jnp.int32), z0, z0, t1, done0,
            jnp.ones((B,), jnp.int32))

    def cond(c):
        return (c[0] < maxit) & jnp.logical_not(jnp.all(c[4]))

    def body(c):
        k, x, z_prev, t, done, iters = c
        xn, zn, tn, res = fused_fista_k_steps(
            A, b, x, z_prev, t, gamma, thr, done.astype(dtype), K=K,
            interpret=interpret, lanes=lanes,
        )
        k = k + K
        newly_done = res / gamma <= tol
        iters = jnp.where(done, iters, k)
        return (k, xn, zn, tn, done | newly_done, iters)

    k, x, z, t, done, iters = jax.lax.while_loop(cond, body, init)
    # The loop advances K iterations at a time from k=1, so unconverged lanes
    # may have run up to maxit+K-1 steps; clamp the *report* to the maxit
    # contract (matching solve_lasso_batch's exact cap).
    iters = jnp.minimum(jnp.where(done, iters, k), maxit)
    return z, iters, done


@partial(jax.jit, static_argnames=("maxit", "iter_block"))
def solve_lasso_multirhs(A, Bmat, lam, Lf, tol, maxit=2000, iter_block=1):
    """Batched FISTA for many lasso instances sharing ONE design matrix:

        min_x  ||A x_i - b_i||^2 / 2 + lam_i ||x_i||_1,   i = 1..B

    (lasso paths, multi-target regression, scenario sweeps over b).  Unlike
    the distinct-A batch — whose per-lane matvecs are VPU-bound multiply-
    reduces — the shared-A step is two *real* matmuls, (B,N)@(N,M) and
    (B,M)@(M,N), which map straight onto the MXU at full tile utilization.
    This is the speed-of-light formulation whenever the workload allows it:
    the MXU at HIGHEST (6-pass bf16 ~ f32) precision sustains ~10x the
    VPU's f32 FMA rate, and A stays resident in CMEM/VMEM across the whole
    batch instead of being streamed once per lane.

    Same iterate trajectory, stopping rule (``||x-z||_inf / gamma <= tol``)
    and per-lane freezing as :func:`solve_lasso_batch`; pure XLA (no Pallas
    needed — XLA fuses the prox/extrapolation elementwise epilogue into the
    matmuls).

    Args:
      A: (M, N) shared design matrix.  Bmat: (B, M) right-hand sides.
      lam: scalar or (B,) l1 weights.  Lf: scalar ``opnorm(A)^2``.
      iter_block: FISTA iterations per while-loop trip.  The per-trip fixed
        cost (op sequencing, convergence reduction, lane freezing) dwarfs
        the ~tens of microseconds of MXU work at these sizes, so K>1
        amortizes it; convergence is then *sampled* every K iterations
        (counts become upper bounds, same semantics as
        :func:`solve_lasso_batch_blocked`).  K=1 checks every iteration.

    Returns (z, iters, done) exactly like :func:`solve_lasso_batch`.
    """
    M, N = A.shape
    B = Bmat.shape[0]
    dtype = A.dtype
    gamma = (1.0 / jnp.asarray(Lf)).astype(dtype)  # scalar: shared A
    thr = jnp.broadcast_to((gamma * jnp.asarray(lam)).astype(dtype), (B,))
    K = iter_block

    hi = jax.lax.Precision.HIGHEST

    def step_fn(X):
        R = jnp.matmul(X, A.T, precision=hi) - Bmat          # (B, M)  MXU
        G = jnp.matmul(R, A, precision=hi)                   # (B, N)  MXU
        Y = X - gamma * G
        Z = jnp.sign(Y) * jnp.maximum(jnp.abs(Y) - thr[:, None], 0.0)
        return Z, jnp.max(jnp.abs(X - Z), axis=1)

    def fista_k(x, z_prev, t):
        def one(_, c):
            x, z_prev, t, _res = c
            t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
            z, res = step_fn(x)
            beta = ((t - 1) / t_new)[:, None]
            x_new = z + beta * (z - z_prev)
            return (x_new, z, t_new, res)

        return jax.lax.fori_loop(
            0, K, one,
            (x, z_prev, t, jnp.zeros((B,), dtype)),
        )

    x0 = jnp.zeros((B, N), dtype)
    z0, res0 = step_fn(x0)
    done0 = res0 / gamma <= tol
    t1 = (1 + jnp.sqrt(5.0)) / 2 * jnp.ones((B,), dtype)
    init = (jnp.asarray(1, jnp.int32), z0, z0, t1, done0,
            jnp.ones((B,), jnp.int32))

    def cond(c):
        return (c[0] < maxit) & jnp.logical_not(jnp.all(c[4]))

    def body(c):
        k, x, z_prev, t, done, iters = c
        xn, zn, tn, res = fista_k(x, z_prev, t)
        keep = done[:, None]
        x_new = jnp.where(keep, x, xn)
        z_new = jnp.where(keep, z_prev, zn)
        t_new = jnp.where(done, t, tn)
        k = k + K
        newly_done = res / gamma <= tol
        iters = jnp.where(done, iters, k)
        return (k, x_new, z_new, t_new, done | newly_done, iters)

    k, x, z, t, done, iters = jax.lax.while_loop(cond, body, init)
    iters = jnp.minimum(jnp.where(done, iters, k), maxit)
    return z, iters, done
