"""Elastic net — Davis-Yin and the 5-config AFBA matrix.

Mirrors ``test/problems/test_elasticnet.jl``: the same 4x5 data, the same
hardcoded solution, the same (theta, mu) sweep with iteration budgets that
fence the AFBA default-stepsize engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NormL1, SqrNormL2, Translate

from problems import ENET_XSTAR, LASSO_A, LASSO_B, as_dtype

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def setup(dtype):
    A = as_dtype(LASSO_A, dtype)
    b = as_dtype(LASSO_B, dtype)
    reg1 = NormL1(1.0)
    reg2 = SqrNormL2(1.0)
    loss = Translate(SqrNormL2(1.0), -b)  # h(u) = ||u - b||^2 / 2
    cost = pa.AutoDifferentiable(
        lambda x: 0.5 * jnp.real(jnp.vdot(A @ x - b, A @ x - b))
    )
    Lf = float(np.linalg.norm(np.asarray(LASSO_A), 2) ** 2)
    x_star = as_dtype(ENET_XSTAR, dtype)
    return A, b, reg1, reg2, loss, cost, Lf, x_star


@pytest.mark.parametrize("dtype", DTYPES)
def test_davis_yin(dtype):
    A, b, reg1, reg2, loss, cost, Lf, x_star = setup(dtype)
    n = A.shape[1]
    x0 = jnp.zeros(n, dtype)
    solver = pa.DavisYin(tol=1e-6)
    x, it = solver(x0=x0, f=cost, g=reg1, h=reg2, Lf=Lf)
    assert x.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-3
    assert it <= 140

    # random initial iterate
    rng = np.random.default_rng(0)
    x0 = as_dtype(rng.standard_normal(n), dtype)
    x, it = solver(x0=x0, f=cost, g=reg1, h=reg2, Lf=Lf)
    assert x.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-3


AFBA_PARAMS = [(2, 0, 130), (1, 1, 2000), (0, 1, 320), (0, 0, 194), (1, 0, 130)]


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("theta,mu,maxit", AFBA_PARAMS)
def test_afba(dtype, theta, mu, maxit):
    A, b, reg1, reg2, loss, cost, Lf, x_star = setup(dtype)
    m, n = A.shape
    x0 = jnp.zeros(n, dtype)
    y0 = jnp.zeros(m, dtype)
    solver = pa.AFBA(theta=theta, mu=mu, tol=1e-6)
    (x, y), it = solver(x0=x0, y0=y0, f=reg2, g=reg1, h=loss, L=A, beta_f=1)
    assert x.dtype == jnp.dtype(dtype)
    assert y.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-4
    assert it <= maxit


@pytest.mark.parametrize("theta,mu,maxit", AFBA_PARAMS)
def test_afba_random_start(theta, mu, maxit):
    dtype = jnp.float64
    A, b, reg1, reg2, loss, cost, Lf, x_star = setup(dtype)
    m, n = A.shape
    rng = np.random.default_rng(1)
    x0 = as_dtype(rng.standard_normal(n), dtype)
    y0 = as_dtype(rng.standard_normal(m), dtype)
    solver = pa.AFBA(theta=theta, mu=mu, tol=1e-6)
    (x, y), it = solver(x0=x0, y0=y0, f=reg2, g=reg1, h=loss, L=A, beta_f=1)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-4
