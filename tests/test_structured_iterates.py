"""End-to-end solves over structured (pytree) iterates.

The reference is generic over AbstractArray containers (ArrayPartition,
``test/accel/test_lbfgs.jl:135-166``); the JAX equivalent is pytree
iterates.  Beyond the accel-level pytree tests, these run whole solvers on
tuple-structured variables and check against the equivalent flat solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NormL1, SeparableSum, SqrNormL2, proxclass
from proxtpu.prox.base import value_and_gradient


@proxclass
class SplitQuadratic:
    """f((u, v)) = ||A u + B v - c||^2 / 2 on a tuple iterate."""

    A: object
    B: object
    c: object

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        u, v = x
        r = self.A @ u + self.B @ v - self.c
        return 0.5 * jnp.vdot(r, r).real

    def value_and_gradient(self, x):
        u, v = x
        r = self.A @ u + self.B @ v - self.c
        return 0.5 * jnp.vdot(r, r).real, (self.A.T @ r, self.B.T @ r)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    m, n1, n2 = 10, 4, 6
    A = jnp.asarray(rng.standard_normal((m, n1)))
    B = jnp.asarray(rng.standard_normal((m, n2)))
    c = jnp.asarray(rng.standard_normal(m))
    M = jnp.concatenate([A, B], axis=1)
    Lf = float(np.linalg.norm(np.asarray(M), 2) ** 2)
    return A, B, c, M, Lf


@pytest.mark.parametrize("solver_name", ["ForwardBackward", "FastForwardBackward"])
def test_tuple_iterate_matches_flat(data, solver_name):
    A, B, c, M, Lf = data
    n1, n2 = A.shape[1], B.shape[1]
    lam = 0.1

    f_split = SplitQuadratic(A, B, c)
    g_split = SeparableSum((NormL1(lam), NormL1(lam)))
    solver = getattr(pa, solver_name)(tol=1e-8)
    (u, v), it1 = solver(
        x0=(jnp.zeros(n1), jnp.zeros(n2)), f=f_split, g=g_split, Lf=Lf
    )

    from proxtpu.prox import make_least_squares

    x_flat, it2 = solver(
        x0=jnp.zeros(n1 + n2), f=make_least_squares(M, c), g=NormL1(lam),
        Lf=Lf,
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(u), np.asarray(v)]), np.asarray(x_flat),
        atol=1e-6,
    )
    assert abs(it1 - it2) <= 1


def test_tuple_iterate_panoc_lbfgs(data):
    """PANOC with L-BFGS directions on a tuple iterate (quasi-Newton ring
    buffers flatten/unflatten pytrees internally)."""
    A, B, c, M, Lf = data
    n1, n2 = A.shape[1], B.shape[1]
    f_split = SplitQuadratic(A, B, c)
    g_split = SeparableSum((NormL1(0.1), NormL1(0.1)))
    (u, v), it = pa.PANOC(tol=1e-8)(
        x0=(jnp.zeros(n1), jnp.zeros(n2)), f=f_split, g=g_split, Lf=Lf
    )
    # verify the fixed point directly
    gamma = 0.95 / Lf
    _, (gu, gv) = value_and_gradient(f_split, (u, v))
    zu, _ = NormL1(0.1).prox(u - gamma * gu, gamma)
    zv, _ = NormL1(0.1).prox(v - gamma * gv, gamma)
    res = max(
        float(jnp.max(jnp.abs(u - zu))), float(jnp.max(jnp.abs(v - zv)))
    )
    assert res / gamma <= 1e-6
