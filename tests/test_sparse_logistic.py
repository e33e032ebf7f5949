"""Sparse logistic regression — adaptive-stepsize solvers on a nonquadratic
smooth term.

Mirrors ``test/problems/test_sparse_logistic_small.jl``: same 4x5 data, the
hardcoded solution, and the adaptive gamma-backtracking paths (no Lf is ever
supplied; ZeroFPR/PANOC/PANOCplus compose f with the operator A).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NormL1

from problems import LASSO_A, LASSO_B, LOGREG_XSTAR, as_dtype

DTYPES = [jnp.float32, jnp.float64]
TOL = 1e-6


def logistic_loss(u):
    # labels all one; softplus(-u) = log(1 + exp(-u)), numerically stable
    return jnp.sum(jax.nn.softplus(-u))


def setup(dtype):
    A = as_dtype(LASSO_A, dtype)
    b = as_dtype(LASSO_B, dtype)
    f = pa.AutoDifferentiable(lambda u: logistic_loss(u - b))
    fA = pa.AutoDifferentiable(lambda x: logistic_loss(A @ x - b))
    g = NormL1(0.1)
    x_star = as_dtype(LOGREG_XSTAR, dtype)
    x0 = jnp.zeros(A.shape[1], dtype)
    return A, f, fA, g, x_star, x0


def check(x, it, x_star, dtype, budget):
    assert x.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-4
    assert it < budget


@pytest.mark.parametrize("dtype", DTYPES)
def test_forward_backward_adaptive(dtype):
    A, f, fA, g, x_star, x0 = setup(dtype)
    solver = pa.ForwardBackward(tol=TOL, adaptive=True)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 1100)


@pytest.mark.parametrize("dtype", DTYPES)
def test_forward_backward_adaptive_regret(dtype):
    A, f, fA, g, x_star, x0 = setup(dtype)
    solver = pa.ForwardBackward(tol=TOL, adaptive=True, increase_gamma=1.01)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 500)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_adaptive(dtype):
    A, f, fA, g, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL, adaptive=True)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 500)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_adaptive_regret(dtype):
    A, f, fA, g, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL, adaptive=True, increase_gamma=1.01)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 200)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize(
    "solver_name,budget", [("ZeroFPR", 25), ("PANOC", 50), ("PANOCplus", 50)]
)
def test_linesearch_adaptive(dtype, solver_name, budget):
    A, f, fA, g, x_star, x0 = setup(dtype)
    solver = getattr(pa, solver_name)(tol=TOL, adaptive=True)
    x, it = solver(x0=x0, f=f, A=A, g=g)
    check(x, it, x_star, dtype, budget)
