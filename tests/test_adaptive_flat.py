"""Flattened batched adaptive FB/FISTA: exact per-lane parity with the
single-problem adaptive driver at one oracle evaluation per loop trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.parallel import batched_adaptive_fb, batched_adaptive_fista
from proxtpu.prox import LeastSquaresLoss, NormL1

TOL = 1e-6
B, M, N = 5, 8, 12


def problems(dtype=jnp.float64):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, M, N)), dtype)
    b = jnp.asarray(rng.standard_normal((B, M)), dtype)
    lam = jnp.asarray(
        0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", np.asarray(A),
                                      np.asarray(b))), axis=1), dtype)
    return A, b, lam


def stacked_fg(A, b, lam):
    f = jax.vmap(LeastSquaresLoss)(A, b)
    g = jax.vmap(NormL1)(lam)
    return f, g


# increase_gamma=1.0 is compared with each side's own cold-start gamma (no
# backtracking boundary-riding, so the 1-ulp cold-start difference between
# two separately-jitted programs never flips a trial).  The regret rule
# (increase_gamma>1) deliberately rides the acceptance boundary — every
# trial is knife-edge — so both sides get the SAME concrete gamma0; with it
# the trajectories (hundreds of accepts and halvings) match bit-for-bit.
CASES = [(1.0, None), (1.01, 0.05)]


@pytest.mark.parametrize("increase,gamma0", CASES)
def test_flat_fb_matches_single_driver(increase, gamma0):
    A, b, lam = problems()
    f, g = stacked_fg(A, b, lam)
    x0 = jnp.zeros((B, N), jnp.float64)
    z, iters, done = batched_adaptive_fb(
        f, g, x0, TOL, maxit=5000, increase_gamma=increase,
        gamma0=None if gamma0 is None else jnp.full((B,), gamma0),
    )
    assert bool(jnp.all(done))

    solver = pa.ForwardBackward(tol=TOL, maxit=5000, adaptive=True,
                                increase_gamma=increase)
    for i in range(B):
        x, it = solver(
            x0=jnp.zeros(N, jnp.float64),
            f=LeastSquaresLoss(A[i], b[i]), g=NormL1(lam[i]),
            gamma=gamma0,
        )
        assert it == int(iters[i]), f"lane {i}: {it} != {int(iters[i])}"
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=1e-12
        )


# FISTA's fixed-point residual is non-monotone, so its gamma search can hit
# the acceptance boundary even without the regret rule — pin gamma0 for both
# cases (see comment above CASES).
@pytest.mark.parametrize("increase,gamma0", [(1.0, 0.05), (1.01, 0.05)])
def test_flat_fista_matches_single_driver(increase, gamma0):
    A, b, lam = problems()
    f, g = stacked_fg(A, b, lam)
    x0 = jnp.zeros((B, N), jnp.float64)
    z, iters, done = batched_adaptive_fista(
        f, g, x0, TOL, maxit=5000, increase_gamma=increase,
        gamma0=None if gamma0 is None else jnp.full((B,), gamma0),
    )
    assert bool(jnp.all(done))

    solver = pa.FastForwardBackward(tol=TOL, maxit=5000, adaptive=True,
                                    increase_gamma=increase)
    for i in range(B):
        x, it = solver(
            x0=jnp.zeros(N, jnp.float64),
            f=LeastSquaresLoss(A[i], b[i]), g=NormL1(lam[i]),
            gamma=gamma0,
        )
        assert it == int(iters[i]), f"lane {i}: {it} != {int(iters[i])}"
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=1e-12
        )


def test_flat_fista_strongly_convex_mf():
    """mf > 0 switches the flat machine to the strongly-convex adaptive
    Nesterov sequence — must match FastForwardBackward(adaptive=True, mf=...)
    per lane (the known-spectrum SC lasso of
    test_lasso_small_strongly_convex.jl)."""
    from problems import SC_XSTAR, strongly_convex_lasso

    A, b, lam, x0_np = strongly_convex_lasso(mf=1.0, Lf=10.0)
    Aj = jnp.asarray(A)
    bj = jnp.asarray(b)
    Bn = 3
    Ab = jnp.broadcast_to(Aj, (Bn,) + Aj.shape)
    bb = jnp.broadcast_to(bj, (Bn,) + bj.shape)
    f = jax.vmap(LeastSquaresLoss)(Ab, bb)
    g = jax.vmap(NormL1)(jnp.full((Bn,), lam))
    x0 = jnp.broadcast_to(jnp.asarray(x0_np), (Bn, A.shape[1]))

    z, iters, done = batched_adaptive_fista(
        f, g, x0, 1e-6, maxit=5000, gamma0=jnp.full((Bn,), 0.05), mf=1.0,
    )
    assert bool(jnp.all(done))

    solver = pa.FastForwardBackward(tol=1e-6, maxit=5000, adaptive=True,
                                    mf=1.0)
    x, it = solver(
        x0=jnp.asarray(x0_np), f=LeastSquaresLoss(Aj, bj), g=NormL1(lam),
        gamma=0.05,
    )
    for i in range(Bn):
        assert int(iters[i]) == it
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=1e-12
        )
    np.testing.assert_allclose(np.asarray(z[0]), SC_XSTAR, atol=1e-4)


def test_flat_fb_maxit_cap():
    A, b, lam = problems()
    f, g = stacked_fg(A, b, lam)
    x0 = jnp.zeros((B, N), jnp.float64)
    z, iters, done = batched_adaptive_fb(f, g, x0, 0.0, maxit=7)
    assert not bool(jnp.any(done))
    assert all(int(i) == 7 for i in iters)


def test_flat_fb_nonhalving_reduce_gamma_converges():
    """r5 review: the default trip cap hardcoded log2 (reduce_gamma=0.5)
    and a 64-halving descent allowance — with reduce_gamma=0.9 and the
    regret rule the loop used to hit the cap and return uncommitted
    trial iterates.  The cap now budgets in log(1/reduce_gamma) units."""
    A, b, lam = problems()
    f, g = stacked_fg(A, b, lam)
    x0 = jnp.zeros((B, N), jnp.float64)
    z, iters, done = batched_adaptive_fb(
        f, g, x0, TOL, maxit=5000, reduce_gamma=0.9, increase_gamma=1.1,
        gamma0=jnp.full((B,), 0.05),
    )
    assert bool(jnp.all(done)), np.asarray(done)
    solver = pa.ForwardBackward(tol=TOL, maxit=5000, adaptive=True,
                                reduce_gamma=0.9, increase_gamma=1.1)
    for i in range(B):
        x, it = solver(
            x0=jnp.zeros(N, jnp.float64),
            f=LeastSquaresLoss(A[i], b[i]), g=NormL1(lam[i]), gamma=0.05,
        )
        assert it == int(iters[i]), f"lane {i}: {it} != {int(iters[i])}"
        np.testing.assert_allclose(np.asarray(z[i]), np.asarray(x),
                                   rtol=0, atol=1e-12)
    with pytest.raises(ValueError):
        batched_adaptive_fb(f, g, x0, TOL, maxit=100, reduce_gamma=1.0)
