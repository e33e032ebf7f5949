"""On-device trace recording (``run_recorded`` / ``run_loop_recorded``).

The jit-native counterpart of the reference's iterator combinators
(``tee``/``sample``, ``src/utilities/iteration_tools.jl:44-100``) and of the
collect-the-iterates pattern (``docs/src/guide/getting_started.jl:146-152``):
history buffers live in the while-loop carry, so parity is checked against
the eager ``states()`` generator, which IS the reference execution model.
"""

import jax
import jax.numpy as jnp
import numpy as np

import proxtpu as pa
from proxtpu.algorithms.core import states
from proxtpu.prox import NormL1, make_least_squares
from proxtpu.utils.tree import tree_inf_norm

from problems import LASSO_A, LASSO_B, LASSO_XSTAR, as_dtype


def setup(dtype=jnp.float64):
    A = as_dtype(LASSO_A, dtype)
    b = as_dtype(LASSO_B, dtype)
    Lf = float(np.linalg.norm(LASSO_A, 2) ** 2)
    lam = 0.1 * float(jnp.max(jnp.abs(A.T @ b)))
    return make_least_squares(A, b), NormL1(lam), Lf


def residual(it, k, s):
    return tree_inf_norm(s.res) / s.gamma


def eager_residuals(solver, n, **kw):
    iteration = solver.make_iteration(**kw)
    out = []
    for k, s in enumerate(states(iteration, max_states=n), start=1):
        out.append(float(residual(iteration, k, s)))
    return np.array(out)


def test_recorded_matches_plain_run_and_eager_states():
    fA, g, Lf = setup()
    kw = dict(x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf)
    solver = pa.FastForwardBackward(tol=1e-8, maxit=500)

    x_plain, it_plain = solver(**kw)
    x_rec, it_rec, tr = solver.run_recorded(residual, **kw)

    # recording must not perturb the solve
    assert int(it_rec) == it_plain
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x_plain))
    np.testing.assert_allclose(
        np.asarray(x_rec), LASSO_XSTAR, atol=1e-6
    )

    # every-iteration trace == the eager states() stream, exactly
    assert int(tr.count) == it_plain
    got = np.asarray(tr.values)[: int(tr.count)]
    want = eager_residuals(solver, it_plain, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # padding beyond count is NaN
    assert np.all(np.isnan(np.asarray(tr.values)[int(tr.count):]))


def test_record_every_samples_the_right_iterations():
    fA, g, Lf = setup()
    kw = dict(x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf)
    solver = pa.FastForwardBackward(tol=1e-8, maxit=500)
    every = 10

    _, it, tr = solver.run_recorded(residual, record_every=every, **kw)
    n = int(it) // every
    assert int(tr.count) == n

    eager = eager_residuals(solver, int(it), **kw)
    got = np.asarray(tr.valid())
    # slot j holds iteration (j+1)*every, i.e. eager index (j+1)*every - 1
    np.testing.assert_allclose(got, eager[every - 1 :: every][:n], rtol=1e-12)


def test_record_whole_iterates_pytree():
    fA, g, Lf = setup()
    kw = dict(x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf)
    solver = pa.FastForwardBackward(tol=1e-6, maxit=300)

    def rec(it, k, s):
        return {"x": s.x, "res_norm": tree_inf_norm(s.res)}

    x, it, tr = solver.run_recorded(rec, **kw)
    n = int(tr.count)
    xs = np.asarray(tr.values["x"])
    assert xs.shape == (300, 5)
    # the final recorded iterate is the state the solution was read from
    iteration = solver.make_iteration(**kw)
    last = None
    for s in states(iteration, max_states=n):
        last = s
    np.testing.assert_allclose(xs[n - 1], np.asarray(last.x), rtol=1e-12)
    assert np.all(np.isnan(xs[n:]))
    assert np.asarray(tr.values["res_norm"]).shape == (300,)


def test_recorded_is_jittable_end_to_end():
    fA, g, Lf = setup()
    solver = pa.PANOC(tol=1e-7, maxit=200)

    @jax.jit
    def solve(x0):
        return solver.run_recorded(
            residual, record_every=5, x0=x0, f=fA, g=g, Lf=Lf
        )

    x, it, tr = solve(jnp.zeros(5, jnp.float64))
    assert int(tr.count) == int(it) // 5
    vals = np.asarray(tr.values)[: int(tr.count)]
    assert np.all(np.isfinite(vals))
    np.testing.assert_allclose(np.asarray(x), LASSO_XSTAR, atol=1e-5)


def test_batched_recorded_matches_per_lane_single_runs():
    from proxtpu.parallel import batch_problems, batched_run_recorded
    from proxtpu.algorithms import make_fast_forward_backward_iteration

    rng = np.random.default_rng(7)
    problems = []
    for k in range(4):
        A = jnp.asarray(rng.standard_normal((8, 12)))
        b = jnp.asarray(rng.standard_normal(8))
        lam = (0.05 + 0.1 * k) * float(jnp.max(jnp.abs(A.T @ b)))
        Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
        problems.append(dict(
            x0=jnp.zeros(12, jnp.float64), f=make_least_squares(A, b),
            g=NormL1(lam), Lf=Lf,
        ))
    iteration = batch_problems(make_fast_forward_backward_iteration, problems)

    maxit, tol, every = 2000, 1e-6, 5
    xs, iters, done, tr = batched_run_recorded(
        iteration, maxit, tol, residual, record_every=every
    )
    assert bool(jnp.all(done))
    vals = np.asarray(tr.values)  # (slots, B)
    assert vals.shape == (maxit // every, 4)
    assert int(tr.count) == int(np.max(np.asarray(iters))) // every

    solver = pa.FastForwardBackward(tol=tol, maxit=maxit)
    for i, kw in enumerate(problems):
        x1, it1, tr1 = solver.run_recorded(residual, record_every=every, **kw)
        assert int(it1) == int(iters[i])
        n1 = int(tr1.count)
        lane = vals[:, i]
        single = np.asarray(tr1.values)
        # lane curve == single-problem curve over the lane's live prefix
        np.testing.assert_allclose(lane[:n1], single[:n1], rtol=0, atol=1e-12)
        # after the lane converges it freezes: the curve plateaus at the
        # frozen (converged) state's residual, which passed the criterion
        plateau = lane[n1 : int(tr.count)]
        if plateau.size:
            assert np.all(plateau == plateau[0])
            assert plateau[0] <= tol
        np.testing.assert_allclose(
            np.asarray(xs[i]), np.asarray(x1), rtol=0, atol=1e-12
        )
    # beyond the global count everything is NaN padding
    assert np.all(np.isnan(vals[int(tr.count):]))


def test_batched_algorithm_run_recorded_linesearch():
    """BatchedAlgorithm.run_recorded takes the generic driver and injects
    the bounded line-search lowering, so PANOC records out of the box."""
    from proxtpu.parallel import BatchedAlgorithm, stack_iterations
    from proxtpu.algorithms import make_panoc_iteration

    fA, g, Lf = setup()
    alg = BatchedAlgorithm(make_panoc_iteration, maxit=200, tol=1e-7)
    lams = [0.5, 1.0, 2.0]
    xs, iters, done, tr = alg.run_recorded(
        residual,
        record_every=2,
        x0=jnp.zeros((3, 5), jnp.float64),
        f=fA, g=NormL1(jnp.asarray(lams) * g.lam), Lf=Lf,
    )
    assert bool(jnp.all(done))
    vals = np.asarray(tr.values)
    assert vals.shape == (100, 3)
    live = vals[: int(tr.count)]
    # every lane's curve ends at (or, for the slowest lane — whose final
    # sample can land one step before its stop fires — near) tolerance
    assert np.all(live[-1] <= 1e-5)
    assert np.all(live[-1] < live[0])


def test_recorded_resume_continues_slots():
    fA, g, Lf = setup()
    kw = dict(x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf)
    solver = pa.FastForwardBackward(tol=1e-8, maxit=500)

    _, it_full, tr_full = solver.run_recorded(residual, **kw)

    iteration = solver.make_iteration(**kw)
    snap = None
    for s in states(iteration, max_states=50):
        snap = s
    _, it_res, tr_res = solver.run_recorded(
        residual, resume_from=snap, resume_iters=50, **kw
    )
    assert int(it_res) == int(it_full)
    full = np.asarray(tr_full.values)
    res = np.asarray(tr_res.values)
    # resumed run writes slots 49.. (iterations 50..); earlier slots unwritten
    np.testing.assert_allclose(
        res[49 : int(it_res)], full[49 : int(it_full)], rtol=1e-12
    )
    assert np.all(np.isnan(res[:49]))
