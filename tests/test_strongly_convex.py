"""Strongly convex lasso — SFISTA, FISTA(mf), DRLS(mf) and friends.

Mirrors ``test/problems/test_lasso_small_strongly_convex.jl``: a 5x5 operator
with known spectrum (mf=1, Lf=10), exact solution by construction, and tight
iteration fences that exercise the strong-convexity-aware paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NormL1, make_least_squares

from problems import SC_XSTAR, as_dtype, strongly_convex_lasso

MF, LF = 1.0, 10.0
TOL = 1e-4

DTYPES = [jnp.float32, jnp.float64]


def setup(dtype):
    A_np, b_np, lam, x0_np = strongly_convex_lasso(MF, LF)
    A = as_dtype(A_np, dtype)
    b = as_dtype(b_np, dtype)
    fA = pa.AutoDifferentiable(
        lambda x: 0.5 * jnp.real(jnp.vdot(A @ x - b, A @ x - b))
    )
    fA_prox = make_least_squares(A, b)
    g = NormL1(lam)
    x_star = as_dtype(SC_XSTAR, dtype)
    x0 = as_dtype(x0_np, dtype)
    return fA, fA_prox, g, x_star, x0


def check(x, it, x_star, dtype, budget, tol=TOL):
    assert x.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= tol
    assert it < budget


@pytest.mark.parametrize("dtype", DTYPES)
def test_sfista(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.SFISTA(tol=TOL)
    y, it = solver(x0=x0, f=fA, g=g, Lf=LF, mf=MF)
    assert y.dtype == jnp.dtype(dtype)
    # reference checks 2-norm here (test_lasso_small_strongly_convex.jl:60)
    assert float(jnp.linalg.norm(y - x_star)) <= TOL
    assert it < 40


@pytest.mark.parametrize("dtype", DTYPES)
def test_sfista_aipp_termination(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.SFISTA(tol=1e-6, maxit=200)
    y, it = solver(x0=x0, f=fA, g=g, Lf=LF, mf=MF, termination_type="AIPP")
    assert float(jnp.linalg.norm(y - x_star)) <= 1e-2


@pytest.mark.parametrize("dtype", DTYPES)
def test_forward_backward(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.ForwardBackward(tol=TOL)
    y, it = solver(x0=x0, f=fA, g=g, Lf=LF)
    check(y, it, x_star, dtype, 110)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_mf(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL)
    y, it = solver(x0=x0, f=fA, g=g, Lf=LF, mf=MF)
    check(y, it, x_star, dtype, 35)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_constant_extrapolation(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL)
    y, it = solver(
        x0=x0, f=fA, g=g, gamma=1 / LF, mf=MF,
        extrapolation_sequence=pa.ConstantNesterovSequence(MF, 1 / LF),
    )
    check(y, it, x_star, dtype, 35)


@pytest.mark.parametrize("dtype", DTYPES)
def test_drls_mf(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.DRLS(tol=TOL)
    v, it = solver(x0=x0, f=fA_prox, g=g, mf=MF)
    check(v, it, x_star, dtype, 14)


@pytest.mark.parametrize("dtype", DTYPES)
def test_panoc(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.PANOC(tol=TOL)
    y, it = solver(x0=x0, f=fA, g=g, Lf=LF)
    check(y, it, x_star, dtype, 45)


@pytest.mark.parametrize("dtype", DTYPES)
def test_panocplus(dtype):
    fA, fA_prox, g, x_star, x0 = setup(dtype)
    solver = pa.PANOCplus(tol=TOL)
    y, it = solver(x0=x0, f=fA, g=g, Lf=LF)
    check(y, it, x_star, dtype, 45)
