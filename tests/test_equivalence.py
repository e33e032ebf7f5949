"""Algorithm-equivalence tests (``test/problems/test_equivalence.jl``):
run two iterations zipped for 10 steps and assert state equality — pins the
algebra of the generalized algorithms to their textbook special cases.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.algorithms import (
    make_douglas_rachford_iteration,
    make_drls_iteration,
    make_forward_backward_iteration,
    make_panoc_iteration,
    make_panocplus_iteration,
)
from proxtpu.prox import NormL1, SqrDistance, make_least_squares

from problems import LASSO_A, LASSO_B, as_dtype

DTYPES = [jnp.float32, jnp.float64]


def setup(dtype):
    A = as_dtype(LASSO_A, dtype)
    b = as_dtype(LASSO_B, dtype)
    lam = 0.1 * float(np.max(np.abs(np.asarray(A.T @ b))))
    Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    return A, b, lam, Lf


@pytest.mark.parametrize("dtype", DTYPES)
def test_dr_equals_drls(dtype):
    """DR == DRLS(no-accel, lambda=1, c=-Inf, max_backtracks=1)."""
    A, b, lam, Lf = setup(dtype)
    f = make_least_squares(A, b)
    g = NormL1(lam)
    x0 = jnp.zeros(5, dtype)
    gamma = 10.0 / Lf

    dr = make_douglas_rachford_iteration(f=f, g=g, x0=x0, gamma=gamma)
    drls = make_drls_iteration(
        f=f, g=g, x0=x0, gamma=gamma, lam=1.0, c=-jnp.inf,
        max_backtracks=1, directions=pa.NoAcceleration(),
    )
    s1, s2 = dr.init(), drls.init()
    for _ in range(10):
        np.testing.assert_allclose(
            np.asarray(s1.x), np.asarray(s2.xbar), rtol=2e-5 if dtype == jnp.float32 else 1e-12
        )
        s1, s2 = dr.step(s1), drls.step(s2)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fb_equals_panoc(dtype):
    """FB == PANOC(no-accel, max_backtracks=1)."""
    A, b, lam, Lf = setup(dtype)
    f = SqrDistance(b)
    fx = pa.AutoDifferentiable(lambda x: 0.5 * jnp.sum((A @ x - b) ** 2))
    g = NormL1(lam)
    x0 = jnp.zeros(5, dtype)
    gamma = 0.95 / Lf

    fb = make_forward_backward_iteration(f=fx, g=g, x0=x0, gamma=gamma)
    panoc = make_panoc_iteration(
        f=f, A=A, g=g, x0=x0, gamma=gamma, max_backtracks=1,
        directions=pa.NoAcceleration(),
    )
    s1, s2 = fb.init(), panoc.init()
    for _ in range(10):
        np.testing.assert_allclose(
            np.asarray(s1.z), np.asarray(s2.z), rtol=2e-5 if dtype == jnp.float32 else 1e-12
        )
        s1, s2 = fb.step(s1), panoc.step(s2)


@pytest.mark.parametrize("dtype", DTYPES)
def test_panoc_equals_panocplus(dtype):
    """PANOC == PANOCplus on a globally smooth problem."""
    A, b, lam, Lf = setup(dtype)
    f = SqrDistance(b)
    g = NormL1(lam)
    x0 = jnp.zeros(5, dtype)
    gamma = 0.95 / Lf

    panoc = make_panoc_iteration(f=f, A=A, g=g, x0=x0, gamma=gamma)
    pplus = make_panocplus_iteration(f=f, A=A, g=g, x0=x0, gamma=gamma)
    s1, s2 = panoc.init(), pplus.init()
    for _ in range(10):
        np.testing.assert_allclose(
            np.asarray(s1.z), np.asarray(s2.z), rtol=1e-4 if dtype == jnp.float32 else 1e-10
        )
        s1, s2 = panoc.step(s1), pplus.step(s2)
