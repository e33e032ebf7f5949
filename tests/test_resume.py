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


def test_batched_run_segments_parity_and_resume(tmp_path):
    """Segmented batched run == batched_run_loop exactly (same _chunk_loop
    core), snapshots round-trip through save_state/load_state, and a run
    resumed from a mid-flight snapshot finishes with identical results."""
    import jax
    import numpy as np
    import pytest

    from proxtpu.algorithms.fast_forward_backward import (
        make_fast_forward_backward_iteration,
    )
    from proxtpu.parallel import batched_run_loop, batched_run_segments
    from proxtpu.prox import LeastSquaresLoss, NormL1
    from proxtpu.utils.checkpoint import load_state, save_state

    rng = np.random.default_rng(13)
    B, M, N = 8, 20, 32
    A = jnp.asarray(rng.standard_normal((B, M, N)) / np.sqrt(M))
    b = jnp.asarray(rng.standard_normal((B, M)))
    lam = jnp.asarray(0.1 * np.max(np.abs(np.einsum(
        "bmn,bm->bn", np.asarray(A), np.asarray(b))), axis=1))
    Lf = jnp.asarray(
        [float(np.linalg.norm(np.asarray(A[i]), 2) ** 2) for i in range(B)]
    )
    iteration = make_fast_forward_backward_iteration(
        x0=jnp.zeros((B, N)), f=jax.vmap(LeastSquaresLoss)(A, b),
        g=NormL1(lam), Lf=Lf,
    )

    xs0, it0, d0 = batched_run_loop(iteration, 3000, 1e-6)
    snaps = []
    xs1, it1, d1 = batched_run_segments(
        iteration, 3000, 1e-6, segment=64, callback=snaps.append,
    )
    assert bool(jnp.all(d1))
    assert np.array_equal(np.asarray(it0), np.asarray(it1))
    # cross-driver solutions agree to compilation-level roundoff (the
    # chunk core is inlined into batched_run_loop's own jit, so fusion
    # differs); within the segmented driver parity is bitwise (below)
    np.testing.assert_allclose(
        np.asarray(xs0), np.asarray(xs1), rtol=0, atol=1e-12
    )
    assert len(snaps) >= 2  # multi-segment run

    # persist a mid-flight snapshot and resume from disk
    mid = snaps[1]
    path = str(tmp_path / "ckpt")
    save_state(path, mid)
    restored = load_state(path, like=mid)
    assert int(restored["k"]) == int(mid["k"])
    xs2, it2, d2 = batched_run_segments(
        iteration, 3000, 1e-6, segment=64, resume=restored,
    )
    assert bool(jnp.all(d2))
    assert np.array_equal(np.asarray(it1), np.asarray(it2))
    np.testing.assert_array_equal(np.asarray(xs1), np.asarray(xs2))

    with pytest.raises(ValueError, match="segment"):
        batched_run_segments(iteration, 100, 1e-6, segment=0)
