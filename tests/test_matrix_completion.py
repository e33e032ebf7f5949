"""Low-rank matrix completion via nuclear-norm-regularized FISTA.

    minimize  1/2 ||P_Omega(X - M)||_F^2 + lam ||X||_*

A new workload family (matrix-valued iterates, SVD-based prox) exercising
the framework's shape-genericity: the iterate is a 2-D array, the smooth
term is a masked quadratic, and the prox runs an on-device SVD.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NuclearNorm, proxclass


@proxclass
class MaskedQuadratic:
    """f(X) = ||mask * (X - M)||_F^2 / 2 with hand gradient."""

    mask: object
    M: object

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, X):
        r = self.mask * (X - self.M)
        return 0.5 * jnp.sum(r * r)

    def value_and_gradient(self, X):
        r = self.mask * (X - self.M)
        return 0.5 * jnp.sum(r * r), r


def test_nuclear_norm_prox_math():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((6, 4)))
    g = NuclearNorm(0.5)
    Z, val = g.prox(X, 1.0)
    s_x = np.linalg.svd(np.asarray(X), compute_uv=False)
    s_z = np.linalg.svd(np.asarray(Z), compute_uv=False)
    np.testing.assert_allclose(s_z, np.maximum(s_x - 0.5, 0), atol=1e-10)
    np.testing.assert_allclose(float(val), 0.5 * s_z.sum(), rtol=1e-10)
    np.testing.assert_allclose(float(g(Z)), 0.5 * s_z.sum(), rtol=1e-10)


def test_matrix_completion_recovers_low_rank():
    rng = np.random.default_rng(1)
    m, n, r = 20, 15, 2
    M_true = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    mask = (rng.random((m, n)) < 0.6).astype(np.float64)  # 60% observed

    f = MaskedQuadratic(jnp.asarray(mask), jnp.asarray(M_true))
    g = NuclearNorm(0.1)
    solver = pa.FastForwardBackward(tol=1e-7, maxit=5000)
    X, it = solver(x0=jnp.zeros((m, n)), f=f, g=g, Lf=1.0)
    assert it < 5000

    X_np = np.asarray(X)
    # unobserved entries recovered from the low-rank structure
    err = np.linalg.norm((1 - mask) * (X_np - M_true)) / np.linalg.norm(
        (1 - mask) * M_true
    )
    assert err < 0.15
    # the solution is (numerically) low-rank
    s = np.linalg.svd(X_np, compute_uv=False)
    assert s[2] / s[0] < 0.05


def test_matrix_completion_panoc():
    """PANOC with L-BFGS over a matrix iterate (ring buffers flatten 2-D)."""
    rng = np.random.default_rng(2)
    m, n, r = 12, 10, 2
    M_true = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    mask = (rng.random((m, n)) < 0.7).astype(np.float64)

    f = MaskedQuadratic(jnp.asarray(mask), jnp.asarray(M_true))
    g = NuclearNorm(0.1)
    X1, it1 = pa.PANOC(tol=1e-8, maxit=2000)(
        x0=jnp.zeros((m, n)), f=f, g=g, Lf=1.0
    )
    X2, it2 = pa.FastForwardBackward(tol=1e-8, maxit=5000)(
        x0=jnp.zeros((m, n)), f=f, g=g, Lf=1.0
    )
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=1e-5)
    assert it1 < it2  # quasi-Newton beats plain FISTA here
