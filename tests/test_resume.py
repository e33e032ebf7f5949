"""Checkpoint/resume: a solve resumed from a captured state must reach the
same solution, and the state round-trips through serialization (the carry is
a plain pytree — SURVEY.md §5)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

import proxtpu as pa
from proxtpu.algorithms.core import states
from proxtpu.prox import NormL1, make_least_squares

from problems import LASSO_A, LASSO_B, LASSO_XSTAR, as_dtype


def setup():
    A = as_dtype(LASSO_A, jnp.float64)
    b = as_dtype(LASSO_B, jnp.float64)
    lam = 0.1 * float(jnp.max(jnp.abs(A.T @ b)))
    Lf = float(np.linalg.norm(LASSO_A, 2) ** 2)
    return make_least_squares(A, b), NormL1(lam), Lf


def test_resume_reaches_same_solution():
    fA, g, Lf = setup()
    solver = pa.FastForwardBackward(tol=1e-8)
    x_full, it_full = solver(x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf)

    # run 50 states eagerly, capture, then resume the jitted driver from it
    iteration = solver.make_iteration(
        x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf
    )
    snapshot = None
    for k, s in enumerate(states(iteration, max_states=50), start=1):
        snapshot = s

    x_res, it_res = solver(
        resume_from=snapshot, x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf
    )
    np.testing.assert_allclose(np.asarray(x_res), np.asarray(x_full), atol=1e-8)
    # resumed run needs ~50 fewer iterations
    assert it_res <= it_full - 40


def test_orbax_checkpoint_roundtrip(tmp_path):
    from proxtpu.utils.checkpoint import load_state, save_state

    fA, g, Lf = setup()
    solver = pa.FastForwardBackward(tol=1e-8)
    iteration = solver.make_iteration(
        x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf
    )
    snapshot = None
    for s in states(iteration, max_states=30):
        snapshot = s
    path = str(tmp_path / "ckpt")
    save_state(path, snapshot)
    restored = load_state(path, like=iteration.init())
    x1, it1 = solver(resume_from=snapshot, x0=jnp.zeros(5, jnp.float64),
                     f=fA, g=g, Lf=Lf)
    x2, it2 = solver(resume_from=restored, x0=jnp.zeros(5, jnp.float64),
                     f=fA, g=g, Lf=Lf)
    assert it1 == it2
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=0)


def test_state_pickle_roundtrip():
    fA, g, Lf = setup()
    solver = pa.FastForwardBackward(tol=1e-8)
    iteration = solver.make_iteration(
        x0=jnp.zeros(5, jnp.float64), f=fA, g=g, Lf=Lf
    )
    snapshot = None
    for s in states(iteration, max_states=20):
        snapshot = s

    blob = pickle.dumps(jax.tree.map(np.asarray, snapshot))
    restored = jax.tree.map(jnp.asarray, pickle.loads(blob))
    x1, it1 = solver(resume_from=snapshot, x0=jnp.zeros(5, jnp.float64),
                     f=fA, g=g, Lf=Lf)
    x2, it2 = solver(resume_from=restored, x0=jnp.zeros(5, jnp.float64),
                     f=fA, g=g, Lf=Lf)
    assert it1 == it2
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=0)
