"""Flattened batched tau-linesearch machines: exact per-lane parity with
the single-problem drivers (counts exact; solutions to batched-vs-single
matmul roundoff, far below tol)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.accel.noaccel import NoAcceleration
from proxtpu.algorithms.panoc import make_panoc_iteration
from proxtpu.ops.linops import MatrixOperator
from proxtpu.parallel import (
    BatchedAlgorithm,
    batched_drls,
    batched_panoc,
    batched_zerofpr,
)
from proxtpu.prox import (
    ElasticNet,
    LogisticLoss,
    NormL1,
    SqrDistance,
    make_least_squares,
)

TOL = 1e-6
B, M, N = 6, 10, 16


def problems(seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((B, M, N)))
    b = jnp.asarray(rng.standard_normal((B, M)))
    lam = jnp.asarray(
        0.1 * np.max(np.abs(np.einsum(
            "bmn,bm->bn", np.asarray(A), np.asarray(b))), axis=1)
    )
    Lf = jnp.asarray(
        [float(np.linalg.norm(np.asarray(A[i]), 2) ** 2) for i in range(B)]
    )
    return A, b, lam, Lf


def assert_parity(z, iters, solver, make_single, atol=1e-8):
    for i in range(B):
        x, it = make_single(solver, i)
        assert it == int(iters[i]), f"lane {i}: {it} != {int(iters[i])}"
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=atol
        )


@pytest.mark.parametrize("max_backtracks", [20, 2])
def test_flat_panoc_quad(max_backtracks):
    """Quadratic-f PANOC (the interpolation shortcut path), including the
    forced tau=0 exhaustion path at max_backtracks=2."""
    A, b, lam, Lf = problems()
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, TOL, maxit=1000,
        max_backtracks=max_backtracks,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOC(tol=TOL, maxit=1000, max_backtracks=max_backtracks)
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]), Lf=Lf[i]),
    )


def test_flat_panoc_nonquad():
    """Non-quadratic f (logistic): the direct-evaluation trial path.

    Long-horizon iteration counts are chaotic for line searches (1-ulp
    differences between differently-structured programs flip knife-edge
    FBE trials, and the trajectories then diverge), so the parity
    contract here is the reference's equivalence-test device: a short
    fixed-length zip against the single driver with tight trajectory
    tolerance, plus converged solutions at physical accuracy."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((B, M, N)) * 0.5)
    lam = jnp.full((B,), 0.05)
    Lf = jnp.asarray(
        [float(np.linalg.norm(np.asarray(A[i]), 2) ** 2) / 4 for i in range(B)]
    )
    f = jax.vmap(LogisticLoss)(jnp.ones((B,)))
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)

    # 15-step zip: flat z after maxit=k equals the single driver's z after
    # k-1 steps (init counts as iteration 1), before chaos can amplify
    singles = []
    for i in range(B):
        it = make_panoc_iteration(x0=jnp.zeros(N), f=LogisticLoss(1.0),
                                  A=A[i], g=NormL1(lam[i]), Lf=Lf[i])
        s = it.init()
        traj = [np.asarray(s.z)]
        for _ in range(14):
            s = it.step(s)
            traj.append(np.asarray(s.z))
        singles.append(traj)
    for k in (1, 5, 10, 15):
        z, iters, _ = batched_panoc(
            f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, 0.0, maxit=k,
        )
        assert all(int(i) == k for i in iters)
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(z[i]), singles[i][k - 1], rtol=0, atol=1e-10
            )

    # full solve: converged, and solutions match the single driver's
    # fixed point at physical (tol-amplified) accuracy
    z, iters, done = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, TOL, maxit=2000,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOC(tol=TOL, maxit=2000)
    for i in range(B):
        x, _ = solver(x0=jnp.zeros(N), f=LogisticLoss(1.0), A=A[i],
                      g=NormL1(lam[i]), Lf=Lf[i])
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=1e-4
        )


def test_flat_panoc_noaccel():
    A, b, lam, Lf = problems(2)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, TOL, maxit=5000,
        directions=NoAcceleration(),
    )
    assert bool(jnp.all(done))
    solver = pa.PANOC(tol=TOL, maxit=5000, directions=NoAcceleration())
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]), Lf=Lf[i]),
    )


def test_flat_panoc_maxit_cap():
    A, b, lam, Lf = problems()
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, 0.0, maxit=7,
    )
    assert not bool(jnp.any(done))
    assert all(int(i) == 7 for i in iters)


@pytest.mark.parametrize("max_backtracks", [20, 3])
def test_flat_zerofpr_lasso(max_backtracks):
    """Flat ZeroFPR vs the single driver on lasso (ZeroFPR has no quad
    shortcut — every trial evaluates directly), incl. tau-exhaustion."""
    A, b, lam, Lf = problems()
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_zerofpr(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, TOL, maxit=1000,
        max_backtracks=max_backtracks,
    )
    assert bool(jnp.all(done))
    solver = pa.ZeroFPR(tol=TOL, maxit=1000, max_backtracks=max_backtracks)
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]), Lf=Lf[i]),
    )


def test_flat_zerofpr_noaccel():
    # tol 1e-4: plain -res directions converge slowly on this problem
    # (the single driver also caps out at tighter tolerances)
    tol = 1e-4
    A, b, lam, Lf = problems(2)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_zerofpr(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, tol, maxit=5000,
        directions=NoAcceleration(),
    )
    assert bool(jnp.all(done))
    solver = pa.ZeroFPR(tol=tol, maxit=5000, directions=NoAcceleration())
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]), Lf=Lf[i]),
    )


def test_flat_zerofpr_nonquad_zip():
    """Short fixed-horizon zip on logistic f (see the PANOC analogue for
    why long-horizon counts are chaotic)."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((B, M, N)) * 0.5)
    lam = jnp.full((B,), 0.05)
    Lf = jnp.asarray(
        [float(np.linalg.norm(np.asarray(A[i]), 2) ** 2) / 4 for i in range(B)]
    )
    f = jax.vmap(LogisticLoss)(jnp.ones((B,)))
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    from proxtpu.algorithms.zerofpr import make_zerofpr_iteration

    singles = []
    for i in range(B):
        it = make_zerofpr_iteration(x0=jnp.zeros(N), f=LogisticLoss(1.0),
                                    A=A[i], g=NormL1(lam[i]), Lf=Lf[i])
        s = it.init()
        traj = [np.asarray(s.xbar)]
        for _ in range(14):
            s = it.step(s)
            traj.append(np.asarray(s.xbar))
        singles.append(traj)
    for k in (1, 5, 15):
        z, iters, _ = batched_zerofpr(
            f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, 0.0, maxit=k,
        )
        assert all(int(i) == k for i in iters)
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(z[i]), singles[i][k - 1], rtol=0, atol=1e-10
            )


@pytest.mark.parametrize("max_backtracks", [20, 2])
def test_flat_panocplus_fixed(max_backtracks):
    from proxtpu.parallel import batched_panocplus

    A, b, lam, Lf = problems()
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_panocplus(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, TOL, maxit=1000,
        max_backtracks=max_backtracks,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOCplus(tol=TOL, maxit=1000, max_backtracks=max_backtracks)
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]), Lf=Lf[i]),
    )


def test_flat_panocplus_adaptive():
    """Adaptive PANOCplus: per-lane gamma shrinking interleaved in the
    flat search, vs the single adaptive driver (gamma0 = alpha/Lf)."""
    from proxtpu.parallel import batched_panocplus

    A, b, lam, Lf = problems(8)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    # start the search from a deliberately too-large gamma so shrinks fire
    gamma0 = 20.0 / Lf
    z, iters, done = batched_panocplus(
        f, Aop, g, jnp.zeros((B, N)), gamma0, TOL, maxit=1000,
        adaptive=True,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOCplus(tol=TOL, maxit=1000, adaptive=True)
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]), gamma=float(gamma0[i])),
    )


def test_flat_panocplus_estimated_gamma():
    """gamma=None: per-lane finite-difference Lipschitz estimate in-graph
    (the factory's lower_bound_smoothness_constant cold start).

    The estimate itself differs from the single driver's by batched-vs-
    single matmul roundoff, and a 1-ulp gamma difference can flip a
    knife-edge trial and fork the trajectory (see the non-quad tests), so
    the contract here is physical: every lane converges, counts are close,
    solutions agree at tol-amplified accuracy."""
    from proxtpu.parallel import batched_panocplus

    A, b, lam, Lf = problems(9)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_panocplus(
        f, Aop, g, jnp.zeros((B, N)), None, TOL, maxit=1000,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOCplus(tol=TOL, maxit=1000)
    for i in range(B):
        x, it = solver(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]))
        assert abs(it - int(iters[i])) <= max(5, it // 10)
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=1e-4
        )


def test_batched_algorithm_routes_panocplus_to_flat():
    from proxtpu.algorithms.panocplus import make_panocplus_iteration
    from proxtpu.kernels.dispatch import match_flat_linesearch

    A, b, lam, Lf = problems(10)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    # both the fixed and the adaptive spelling match
    for kw in (dict(Lf=Lf), dict(adaptive=True, Lf=Lf), {}):
        kwargs = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=A, **kw)
        assert match_flat_linesearch(
            make_panocplus_iteration, kwargs, tol=TOL, maxit=500
        ) is not None, kw

    kwargs = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=A, Lf=Lf)
    auto = BatchedAlgorithm(make_panocplus_iteration, maxit=500, tol=TOL)
    zs, its, done = auto(**kwargs)
    generic = BatchedAlgorithm(
        make_panocplus_iteration, maxit=500, tol=TOL, use_kernels=False
    )
    zg, itg, dg = generic(**{**kwargs, "A": jax.vmap(MatrixOperator)(A)})
    assert bool(jnp.all(done)) and bool(jnp.all(dg))
    np.testing.assert_array_equal(np.asarray(its), np.asarray(itg))
    np.testing.assert_allclose(
        np.asarray(zs), np.asarray(zg), rtol=0, atol=1e-8
    )


def drls_c_per_lane(gamma, Lf, beta=0.5, lam=1.0):
    """Per-lane factory default c = beta * drls_C(convex f, no mf)."""
    from proxtpu.algorithms.drls import drls_C
    from proxtpu.prox import SqrNormL2

    return jnp.asarray([
        beta * drls_C(SqrNormL2(), None, float(Lf[i]), float(gamma[i]), lam)
        for i in range(B)
    ])


@pytest.mark.parametrize("max_backtracks", [20, 2])
def test_flat_drls_quad(max_backtracks):
    """Quadratic-f DRLS (prox-interpolation shortcut, ``drls.jl:172-184``),
    incl. the forced tau=0 exhaustion path."""
    A, b, lam, Lf = problems()
    f = jax.vmap(lambda Ai, bi: make_least_squares(Ai, bi))(A, b)
    g = jax.vmap(NormL1)(lam)
    gamma = 0.95 / Lf
    z, iters, done = batched_drls(
        f, g, jnp.zeros((B, N)), gamma, 1.0, drls_c_per_lane(gamma, Lf),
        TOL, maxit=1000, max_backtracks=max_backtracks,
    )
    assert bool(jnp.all(done))
    solver = pa.DRLS(tol=TOL, maxit=1000, max_backtracks=max_backtracks)
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=make_least_squares(A[i], b[i]),
                       g=NormL1(lam[i]), Lf=Lf[i]),
    )


def test_flat_drls_nonquad():
    """Non-quadratic prox-accessible f (ElasticNet): the direct prox trial
    path, with explicit gamma/c (no Lf derivation)."""
    from proxtpu.prox import Translate

    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.standard_normal((B, N)))
    _, _, lam, _ = problems(5)
    f = jax.vmap(lambda ti: Translate(ElasticNet(0.3, 1.0), ti))(t)
    g = jax.vmap(NormL1)(lam)
    z, iters, done = batched_drls(
        f, g, jnp.ones((B, N)), 0.8, 1.0, 0.01, TOL, maxit=2000,
    )
    assert bool(jnp.all(done))
    solver = pa.DRLS(tol=TOL, maxit=2000, gamma=0.8, c=0.01)
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.ones(N), f=Translate(ElasticNet(0.3, 1.0), t[i]),
                       g=NormL1(lam[i])),
    )


def test_flat_drls_noaccel():
    A, b, lam, Lf = problems(6)
    f = jax.vmap(lambda Ai, bi: make_least_squares(Ai, bi))(A, b)
    g = jax.vmap(NormL1)(lam)
    gamma = 0.95 / Lf
    z, iters, done = batched_drls(
        f, g, jnp.zeros((B, N)), gamma, 1.0, drls_c_per_lane(gamma, Lf),
        TOL, maxit=5000, directions=NoAcceleration(),
    )
    assert bool(jnp.all(done))
    solver = pa.DRLS(tol=TOL, maxit=5000, directions=NoAcceleration())
    assert_parity(
        z, iters, solver,
        lambda s, i: s(x0=jnp.zeros(N), f=make_least_squares(A[i], b[i]),
                       g=NormL1(lam[i]), Lf=Lf[i]),
    )


def test_batched_algorithm_routes_drls_to_flat():
    from proxtpu.algorithms.drls import make_drls_iteration
    from proxtpu.kernels.dispatch import match_flat_linesearch

    A, b, lam, Lf = problems(7)
    f = jax.vmap(lambda Ai, bi: make_least_squares(Ai, bi))(A, b)
    g = jax.vmap(NormL1)(lam)
    kwargs = dict(x0=jnp.zeros((B, N)), f=f, g=g, Lf=Lf)
    assert match_flat_linesearch(
        make_drls_iteration, kwargs, tol=TOL, maxit=500
    ) is not None
    # Nesterov directions fall back to the generic driver
    assert match_flat_linesearch(
        make_drls_iteration,
        {**kwargs, "directions": pa.NesterovExtrapolation(
            pa.FixedNesterovSequence())},
        tol=TOL, maxit=500,
    ) is None

    auto = BatchedAlgorithm(make_drls_iteration, maxit=500, tol=TOL)
    zs, its, done = auto(**kwargs)
    generic = BatchedAlgorithm(
        make_drls_iteration, maxit=500, tol=TOL, use_kernels=False
    )
    zg, itg, dg = generic(**kwargs)
    assert bool(jnp.all(done)) and bool(jnp.all(dg))
    np.testing.assert_array_equal(np.asarray(its), np.asarray(itg))
    np.testing.assert_allclose(
        np.asarray(zs), np.asarray(zg), rtol=0, atol=1e-8
    )


def test_batched_algorithm_routes_panoc_to_flat():
    """BatchedAlgorithm auto-routes fixed-stepsize batched PANOC to the
    flat machine, with the same results as the forced generic driver."""
    A, b, lam, Lf = problems(3)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)

    from proxtpu.kernels.dispatch import match_flat_linesearch

    kwargs = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=A, Lf=Lf)
    assert match_flat_linesearch(
        make_panoc_iteration, kwargs, tol=TOL, maxit=500
    ) is not None
    # adaptive PANOC and ZeroFPR route to their two-mode flat machines;
    # a custom stop/solution still falls back to the generic driver
    from proxtpu.algorithms.zerofpr import make_zerofpr_iteration

    for fac in (make_panoc_iteration, make_zerofpr_iteration):
        assert match_flat_linesearch(
            fac, {**kwargs, "adaptive": True}, tol=TOL, maxit=500,
        ) is not None
    assert match_flat_linesearch(
        make_panoc_iteration, kwargs, tol=TOL, maxit=500,
        stop=lambda it, tol, s: it.default_stopping_criterion(tol, s),
    ) is None

    auto = BatchedAlgorithm(make_panoc_iteration, maxit=500, tol=TOL)
    zs, its, done = auto(**kwargs)
    generic = BatchedAlgorithm(
        make_panoc_iteration, maxit=500, tol=TOL, use_kernels=False
    )
    zg, itg, dg = generic(**{**kwargs, "A": jax.vmap(MatrixOperator)(A)})
    assert bool(jnp.all(done)) and bool(jnp.all(dg))
    np.testing.assert_array_equal(np.asarray(its), np.asarray(itg))
    np.testing.assert_allclose(
        np.asarray(zs), np.asarray(zg), rtol=0, atol=1e-8
    )


def test_batched_algorithm_routes_zerofpr_to_flat():
    from proxtpu.algorithms.zerofpr import make_zerofpr_iteration
    from proxtpu.kernels.dispatch import match_flat_linesearch

    A, b, lam, Lf = problems(4)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    kwargs = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=A, Lf=Lf)
    assert match_flat_linesearch(
        make_zerofpr_iteration, kwargs, tol=TOL, maxit=500
    ) is not None

    auto = BatchedAlgorithm(make_zerofpr_iteration, maxit=500, tol=TOL)
    zs, its, done = auto(**kwargs)
    generic = BatchedAlgorithm(
        make_zerofpr_iteration, maxit=500, tol=TOL, use_kernels=False
    )
    zg, itg, dg = generic(**{**kwargs, "A": jax.vmap(MatrixOperator)(A)})
    assert bool(jnp.all(done)) and bool(jnp.all(dg))
    np.testing.assert_array_equal(np.asarray(its), np.asarray(itg))
    np.testing.assert_allclose(
        np.asarray(zs), np.asarray(zg), rtol=0, atol=1e-8
    )


@pytest.mark.parametrize("accel", ["anderson", "broyden"])
def test_flat_panoc_alternative_quasi_newton(accel):
    """Anderson / Broyden directions conform to the same
    init_state/update/apply protocol as L-BFGS, so they ride the flat
    machine too — per-lane count and solution parity with the single
    driver (reference exercises the full accel matrix on the line-search
    family, ``test_lasso_small.jl``/DRLS configs)."""
    from proxtpu.accel.anderson import AndersonAcceleration
    from proxtpu.accel.broyden import Broyden

    directions = (
        AndersonAcceleration(5) if accel == "anderson" else Broyden()
    )
    A, b, lam, Lf = problems(seed=2)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    z, iters, done = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), 0.95 / Lf, TOL, maxit=1000,
        directions=directions,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOC(tol=TOL, maxit=1000, directions=directions)
    # unlike L-BFGS (pure dot/axpy, exact parity), Anderson's pinv and
    # Broyden's dense-H rank-1 updates lower differently batched vs single
    # (batched-LAPACK rounding); the dense-H recursions amplify that
    # chaotically, so trajectories genuinely diverge in LENGTH (Broyden:
    # up to ~2x, measured) while converging to the same fixed point
    # (solution gaps ~5e-7 at tol 1e-6) — assert the guarantees: both
    # converged, same solution, count within a small multiple
    for i in range(B):
        x, it = solver(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                       g=NormL1(lam[i]), Lf=Lf[i], adaptive=False)
        r = int(iters[i]) / it
        assert 1 / 2.5 <= r <= 2.5, f"lane {i}: {it} vs {int(iters[i])}"
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=2e-5
        )


@pytest.mark.parametrize("machine", ["panoc", "zerofpr", "panocplus",
                                     "drls", "adaptive_fista"])
def test_blocked_flat_machines_bit_exact(machine):
    """check_every=K on the flat machines is EXACT (the bodies fully freeze
    inactive lanes, so blocking only amortizes the per-while-trip cost):
    per-lane counts AND solutions must be bit-identical to K=1."""
    from proxtpu.algorithms.fast_forward_backward import (  # noqa: F401
        make_fast_forward_backward_iteration,
    )
    from proxtpu.ops.linops import IdentityOperator
    from proxtpu.parallel import batched_panocplus
    from proxtpu.parallel.adaptive_batch import batched_adaptive_fista
    from proxtpu.prox import LeastSquaresLoss

    A, b, lam, Lf = problems(3)
    f = jax.vmap(LeastSquaresLoss)(A, b)
    g = NormL1(lam)
    x0 = jnp.zeros((B, N))
    gam = 0.95 / Lf
    fid = jax.vmap(lambda _: IdentityOperator())(jnp.arange(B))

    if machine == "adaptive_fista":
        run = lambda ce: batched_adaptive_fista(
            f, g, x0, 1e-5, maxit=3000, check_every=ce
        )
    elif machine == "drls":
        fls = jax.vmap(make_least_squares)(A, b)
        cc = jnp.full((B,), -np.inf)
        run = lambda ce: batched_drls(
            fls, g, x0, 1.0 / Lf, jnp.ones((B,)), cc, 1e-5, maxit=300,
            check_every=ce,
        )
    else:
        fn = {"panoc": batched_panoc, "zerofpr": batched_zerofpr,
              "panocplus": batched_panocplus}[machine]
        run = lambda ce: fn(f, fid, g, x0, gam, 1e-5, maxit=300,
                            check_every=ce)

    z1, k1, d1 = run(1)
    z8, k8, d8 = run(8)
    assert bool(jnp.all(d1))
    assert np.array_equal(np.asarray(k1), np.asarray(k8))
    assert np.array_equal(np.asarray(d1), np.asarray(d8))
    assert np.array_equal(np.asarray(z1), np.asarray(z8))


def test_batched_algorithm_check_every_reaches_flat_machines():
    """BatchedAlgorithm(check_every=K) must thread K into the flat
    trial/commit runners (dispatch route), keeping exact counts."""
    from proxtpu.prox import LeastSquaresLoss

    A, b, lam, Lf = problems(4)
    f = jax.vmap(LeastSquaresLoss)(A, b)
    g = NormL1(lam)
    kw = dict(x0=jnp.zeros((B, N)), f=f, g=g, Lf=Lf, adaptive=False)
    s1 = BatchedAlgorithm(make_panoc_iteration, maxit=300, tol=1e-5)
    s8 = BatchedAlgorithm(make_panoc_iteration, maxit=300, tol=1e-5,
                          check_every=8)
    z1, k1, d1 = s1(**kw)
    z8, k8, d8 = s8(**kw)
    assert np.array_equal(np.asarray(k1), np.asarray(k8))
    assert np.array_equal(np.asarray(z1), np.asarray(z8))


def test_blocked_flat_machines_validate_inputs():
    """check_every < 1 must raise (fori(0,0) would silently skip the whole
    solve), and an explicit trip_cap cannot combine with blocking (the cap
    is only checked at block boundaries, breaking exactness)."""
    from proxtpu.ops.linops import IdentityOperator
    from proxtpu.prox import LeastSquaresLoss

    A, b, lam, Lf = problems(5)
    f = jax.vmap(LeastSquaresLoss)(A, b)
    g = NormL1(lam)
    x0 = jnp.zeros((B, N))
    gam = 0.95 / Lf
    fid = jax.vmap(lambda _: IdentityOperator())(jnp.arange(B))
    with pytest.raises(ValueError, match="check_every"):
        batched_panoc(f, fid, g, x0, gam, 1e-5, maxit=50, check_every=0)
    with pytest.raises(ValueError, match="trip_cap"):
        batched_panoc(f, fid, g, x0, gam, 1e-5, maxit=50,
                      trip_cap=10, check_every=8)


@pytest.mark.parametrize("gamma_mult", [10.0, 1.0])
def test_flat_panoc_adaptive_quad(gamma_mult):
    """Adaptive flat PANOC on quadratic f: per-lane gamma decisions,
    counts, and solutions match the single PANOC(adaptive=True) driver
    exactly (gamma_mult=10 forces real backtracking; 1.0 accepts the
    initial gamma immediately)."""
    A, b, lam, Lf = problems()
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    gamma0 = gamma_mult * 0.95 / Lf
    z, iters, done = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), gamma0, TOL, maxit=1000,
        adaptive=True,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOC(tol=TOL, maxit=1000)
    for i in range(B):
        x, k = solver(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                      g=NormL1(lam[i]), gamma=float(gamma0[i]),
                      adaptive=True)
        assert int(k) == int(iters[i]), (i, k, iters[i])
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=1e-9
        )


def test_flat_panoc_adaptive_nonquad_zip():
    """Non-quadratic adaptive PANOC: short fixed-horizon zip at 1e-11
    trajectory accuracy (long-horizon counts are knife-edge chaotic, same
    discipline as the fixed machines), then full solves at physical
    accuracy; check_every blocking stays bit-exact."""
    from proxtpu.algorithms.panoc import make_panoc_iteration

    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((B, M, N)) * 0.5)
    lam = jnp.full((B,), 0.05)
    Lf = jnp.asarray(
        [float(np.linalg.norm(np.asarray(A[i]), 2) ** 2) / 4
         for i in range(B)]
    )
    f = jax.vmap(LogisticLoss)(jnp.ones((B,)))
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    gamma0 = 8.0 * 0.95 / Lf

    singles = []
    for i in range(B):
        it = make_panoc_iteration(
            x0=jnp.zeros(N), f=LogisticLoss(1.0), A=A[i], g=NormL1(lam[i]),
            gamma=float(gamma0[i]), adaptive=True,
        )
        s = it.init()
        traj = [np.asarray(s.z)]
        for _ in range(14):
            s = it.step(s)
            traj.append(np.asarray(s.z))
        singles.append(traj)
    for k in (1, 5, 15):
        z, iters, _ = batched_panoc(
            f, Aop, g, jnp.zeros((B, N)), gamma0, 0.0, maxit=k,
            adaptive=True,
        )
        assert all(int(i) == k for i in iters)
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(z[i]), singles[i][k - 1], rtol=0, atol=1e-10
            )

    z, iters, done = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), gamma0, TOL, maxit=2000,
        adaptive=True,
    )
    assert bool(jnp.all(done))
    solver = pa.PANOC(tol=TOL, maxit=2000)
    for i in range(B):
        x, _ = solver(x0=jnp.zeros(N), f=LogisticLoss(1.0), A=A[i],
                      g=NormL1(lam[i]), gamma=float(gamma0[i]),
                      adaptive=True)
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=2e-4
        )

    z8, it8, d8 = batched_panoc(
        f, Aop, g, jnp.zeros((B, N)), gamma0, TOL, maxit=2000,
        adaptive=True, check_every=8,
    )
    assert np.array_equal(np.asarray(iters), np.asarray(it8))
    assert np.array_equal(np.asarray(z), np.asarray(z8))


def test_flat_panoc_adaptive_cold_start_dispatched():
    """gamma=None adaptive PANOC (the driver's Lipschitz cold start) must
    route through BatchedAlgorithm to the adaptive flat machine and match
    single driver counts on the quadratic path."""
    from proxtpu.kernels.dispatch import match_flat_linesearch

    A, b, lam, Lf = problems(7)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    kw = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=Aop, adaptive=True)
    assert match_flat_linesearch(
        make_panoc_iteration, kw, tol=TOL, maxit=1000
    ) is not None
    zs, iters, done = BatchedAlgorithm(
        make_panoc_iteration, maxit=1000, tol=TOL
    )(**kw)
    assert bool(jnp.all(done))
    solver = pa.PANOC(tol=TOL, maxit=1000)
    for i in range(B):
        x, k = solver(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                      g=NormL1(lam[i]), adaptive=True)
        assert abs(int(k) - int(iters[i])) <= 1, (i, k, iters[i])
        np.testing.assert_allclose(
            np.asarray(zs[i]), np.asarray(x), rtol=0, atol=1e-6
        )


@pytest.mark.parametrize("gamma_mult", [10.0, 1.0])
def test_flat_zerofpr_adaptive_quad(gamma_mult):
    """Adaptive flat ZeroFPR: exact per-lane parity with the single
    ZeroFPR(adaptive=True) driver on quadratic f (10x-hot gamma start
    forces real backtracking); blocking stays bit-exact."""
    A, b, lam, Lf = problems()
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    gamma0 = gamma_mult * 0.95 / Lf
    z, iters, done = batched_zerofpr(
        f, Aop, g, jnp.zeros((B, N)), gamma0, TOL, maxit=1000,
        adaptive=True,
    )
    assert bool(jnp.all(done))
    solver = pa.ZeroFPR(tol=TOL, maxit=1000)
    for i in range(B):
        x, k = solver(x0=jnp.zeros(N), f=SqrDistance(b[i]), A=A[i],
                      g=NormL1(lam[i]), gamma=float(gamma0[i]),
                      adaptive=True)
        assert int(k) == int(iters[i]), (i, k, iters[i])
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=1e-9
        )
    z8, it8, d8 = batched_zerofpr(
        f, Aop, g, jnp.zeros((B, N)), gamma0, TOL, maxit=1000,
        adaptive=True, check_every=8,
    )
    assert np.array_equal(np.asarray(iters), np.asarray(it8))
    assert np.array_equal(np.asarray(z), np.asarray(z8))


def test_flat_zerofpr_adaptive_nonquad_and_dispatch():
    """Non-quadratic adaptive ZeroFPR: short-horizon zip + full-solve
    physical accuracy, and the cold-start (gamma=None) BatchedAlgorithm
    route lands on the flat machine with driver-matching counts."""
    from proxtpu.algorithms.zerofpr import make_zerofpr_iteration
    from proxtpu.kernels.dispatch import match_flat_linesearch

    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((B, M, N)) * 0.5)
    lam = jnp.full((B,), 0.05)
    Lf = jnp.asarray(
        [float(np.linalg.norm(np.asarray(A[i]), 2) ** 2) / 4
         for i in range(B)]
    )
    f = jax.vmap(LogisticLoss)(jnp.ones((B,)))
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)
    gamma0 = 8.0 * 0.95 / Lf

    singles = []
    for i in range(B):
        it = make_zerofpr_iteration(
            x0=jnp.zeros(N), f=LogisticLoss(1.0), A=A[i], g=NormL1(lam[i]),
            gamma=float(gamma0[i]), adaptive=True,
        )
        s = it.init()
        traj = [np.asarray(s.xbar)]
        for _ in range(14):
            s = it.step(s)
            traj.append(np.asarray(s.xbar))
        singles.append(traj)
    for k in (1, 5, 15):
        z, iters, _ = batched_zerofpr(
            f, Aop, g, jnp.zeros((B, N)), gamma0, 0.0, maxit=k,
            adaptive=True,
        )
        assert all(int(i) == k for i in iters)
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(z[i]), singles[i][k - 1], rtol=0, atol=1e-10
            )

    z, iters, done = batched_zerofpr(
        f, Aop, g, jnp.zeros((B, N)), gamma0, TOL, maxit=2000,
        adaptive=True,
    )
    assert bool(jnp.all(done))
    solver = pa.ZeroFPR(tol=TOL, maxit=2000)
    for i in range(B):
        x, _ = solver(x0=jnp.zeros(N), f=LogisticLoss(1.0), A=A[i],
                      g=NormL1(lam[i]), gamma=float(gamma0[i]),
                      adaptive=True)
        np.testing.assert_allclose(
            np.asarray(z[i]), np.asarray(x), rtol=0, atol=2e-4
        )

    # cold-start dispatch route
    kw = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=Aop, adaptive=True)
    assert match_flat_linesearch(
        make_zerofpr_iteration, kw, tol=TOL, maxit=2000
    ) is not None
    zs, its, dn = BatchedAlgorithm(
        make_zerofpr_iteration, maxit=2000, tol=TOL
    )(**kw)
    assert bool(jnp.all(dn))
    for i in (0, B - 1):
        x, k = solver(x0=jnp.zeros(N), f=LogisticLoss(1.0), A=A[i],
                      g=NormL1(lam[i]), adaptive=True)
        assert abs(int(k) - int(its[i])) <= 2, (i, k, its[i])
        np.testing.assert_allclose(
            np.asarray(zs[i]), np.asarray(x), rtol=0, atol=2e-4
        )


def test_dispatch_preserves_driver_semantics_on_edge_kwargs():
    """Two dispatch-parity regressions (review repros): explicit
    adaptive=False with no stepsize runs FIXED estimated gamma (generic
    driver), and a user-explicit backtrack_limit truncates the gamma
    search — both must bypass the adaptive flat machines."""
    from proxtpu.kernels.dispatch import match_flat_linesearch

    A, b, lam, Lf = problems(9)
    f = jax.vmap(SqrDistance)(b)
    g = jax.vmap(NormL1)(lam)
    Aop = jax.vmap(MatrixOperator)(A)

    # explicit adaptive=False + no gamma/Lf -> no flat match
    kw1 = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=Aop, adaptive=False)
    assert match_flat_linesearch(
        make_panoc_iteration, kw1, tol=1e-6, maxit=300
    ) is None
    z_d, k_d, _ = BatchedAlgorithm(
        make_panoc_iteration, maxit=300, tol=1e-6
    )(**kw1)
    z_g, k_g, _ = BatchedAlgorithm(
        make_panoc_iteration, maxit=300, tol=1e-6, use_kernels=False
    )(**kw1)
    assert np.array_equal(np.asarray(k_d), np.asarray(k_g))

    # user-explicit backtrack_limit -> no flat match, truncation honored
    gamma0 = 100.0 * 0.95 / Lf
    kw2 = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=Aop, adaptive=True,
               gamma=gamma0, backtrack_limit=2)
    assert match_flat_linesearch(
        make_panoc_iteration, kw2, tol=1e-6, maxit=300
    ) is None
    z_d, k_d, _ = BatchedAlgorithm(
        make_panoc_iteration, maxit=300, tol=1e-6
    )(**kw2)
    z_g, k_g, _ = BatchedAlgorithm(
        make_panoc_iteration, maxit=300, tol=1e-6, use_kernels=False
    )(**kw2)
    assert np.array_equal(np.asarray(k_d), np.asarray(k_g))

    # without the explicit limit the flat route still fires
    kw3 = dict(x0=jnp.zeros((B, N)), f=f, g=g, A=Aop, adaptive=True,
               gamma=gamma0)
    assert match_flat_linesearch(
        make_panoc_iteration, kw3, tol=1e-6, maxit=300
    ) is not None
