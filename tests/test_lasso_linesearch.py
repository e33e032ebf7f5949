"""Lasso small — line-search family (ZeroFPR / PANOC / PANOCplus / DR / DRLS).

Mirrors the corresponding testsets of ``test/problems/test_lasso_small.jl``
(lines 135-283): same solution oracle, same iteration fences per
acceleration strategy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NormL1, SqrDistance, make_least_squares

from problems import LASSO_A, LASSO_B, LASSO_XSTAR, as_dtype

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]
TOL = 1e-4


def setup(dtype):
    A = as_dtype(LASSO_A, dtype)
    b = as_dtype(LASSO_B, dtype)
    lam = 0.1 * float(np.max(np.abs(np.asarray(A.conj().T @ b))))
    f = SqrDistance(b)  # f(u) = ||u - b||^2/2, used with A (like the ref's f_autodiff)
    fA_prox = make_least_squares(A, b)
    g = NormL1(lam)
    Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    x_star = as_dtype(LASSO_XSTAR, dtype)
    x0 = jnp.zeros(A.shape[1], dtype)
    return A, b, f, fA_prox, g, Lf, x_star, x0


def check(x, it, x_star, dtype, budget, tol=TOL):
    assert x.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= tol
    assert it < budget


@pytest.mark.parametrize("dtype", DTYPES)
def test_zerofpr_fixed(dtype):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    x, it = pa.ZeroFPR(tol=TOL)(x0=x0, f=f, A=A, g=g, Lf=Lf)
    check(x, it, x_star, dtype, 20)


@pytest.mark.parametrize("dtype", DTYPES)
def test_zerofpr_adaptive(dtype):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    x, it = pa.ZeroFPR(adaptive=True, tol=TOL)(x0=x0, f=f, A=A, g=g)
    check(x, it, x_star, dtype, 20)


@pytest.mark.parametrize("dtype", DTYPES)
def test_panoc_fixed(dtype):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    x, it = pa.PANOC(tol=TOL)(x0=x0, f=f, A=A, g=g, Lf=Lf)
    check(x, it, x_star, dtype, 20)


@pytest.mark.parametrize("dtype", DTYPES)
def test_panoc_adaptive(dtype):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    x, it = pa.PANOC(adaptive=True, tol=TOL)(x0=x0, f=f, A=A, g=g)
    check(x, it, x_star, dtype, 20)


@pytest.mark.parametrize("dtype", DTYPES)
def test_panocplus_fixed(dtype):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    x, it = pa.PANOCplus(tol=TOL)(x0=x0, f=f, A=A, g=g, Lf=Lf)
    check(x, it, x_star, dtype, 20)


@pytest.mark.parametrize("dtype", DTYPES)
def test_panocplus_adaptive(dtype):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    x, it = pa.PANOCplus(adaptive=True, tol=TOL)(x0=x0, f=f, A=A, g=g)
    check(x, it, x_star, dtype, 20)


@pytest.mark.parametrize("dtype", DTYPES)
def test_douglas_rachford(dtype):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    y, it = pa.DouglasRachford(gamma=10.0 / Lf, tol=TOL)(x0=x0, f=fA_prox, g=g)
    check(y, it, x_star, dtype, 30)


DRLS_ACCELS = [
    (pa.LBFGS(5), 17),
    (pa.Broyden(), 19),
    (pa.AndersonAcceleration(5), 12),
    (pa.NesterovExtrapolation(pa.FixedNesterovSequence()), 36),
    (pa.NesterovExtrapolation(pa.SimpleNesterovSequence()), 36),
]


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("accel,budget", DRLS_ACCELS,
                         ids=["lbfgs", "broyden", "anderson", "nes-fixed", "nes-simple"])
def test_drls(dtype, accel, budget):
    A, b, f, fA_prox, g, Lf, x_star, x0 = setup(dtype)
    z, it = pa.DRLS(tol=10 * TOL, directions=accel)(x0=x0, f=fA_prox, g=g, Lf=Lf)
    check(z, it, x_star, dtype, budget, tol=10 * TOL)
