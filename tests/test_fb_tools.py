"""FB toolkit unit tests — port of ``test/utilities/test_fb_tools.jl``.

(1) the finite-difference Lipschitz estimate is a true lower bound and
preserves the real dtype; (2) backtracking monotonically shrinks gamma over
random evaluation points (alpha=0.5), in both the while-loop and the
bounded masked modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proxtpu.ops.linops import IdentityOperator
from proxtpu.prox import Quadratic, Zero, prox, value_and_gradient
from proxtpu.utils.fb_tools import (
    backtrack_stepsize,
    f_model,
    lower_bound_smoothness_constant,
)
from proxtpu.utils.tree import tree_map, tree_sub

DTYPES = [jnp.float32, jnp.float64]


def quadratic_fixture(dtype, seed=0):
    rng = np.random.default_rng(seed)
    sv = np.array([0.01, 1.0, 1.0, 1.0, 100.0])
    n = len(sv)
    U, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Q = (U * sv) @ U.T
    q = rng.standard_normal(n)
    f = Quadratic(jnp.asarray(Q, dtype), jnp.asarray(q, dtype))
    return f, float(sv.max()), n


@pytest.mark.parametrize("dtype", DTYPES)
def test_lipschitz_lower_bound(dtype):
    f, Lf, n = quadratic_fixture(dtype)
    rng = np.random.default_rng(1)
    A = IdentityOperator()
    for _ in range(50):
        x = jnp.asarray(rng.standard_normal(n), dtype)
        _, grad = value_and_gradient(f, x)
        Lest = lower_bound_smoothness_constant(f, A, x, grad)
        assert Lest.dtype == jnp.dtype(dtype)
        # true lower bound (up to roundoff at the dtype's precision)
        assert float(Lest) <= Lf * (1 + 1e-4)
        assert float(Lest) > 0


def _candidates(f, g, x, gamma):
    f_x, grad = value_and_gradient(f, x)
    y = tree_map(lambda xl, gl: xl - gamma * gl, x, grad)
    z, g_z = prox(g, y, gamma)
    return f_x, grad, y, z, g_z, tree_sub(x, z)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("max_backtracks", [None, 40])
def test_backtracking_monotone_gamma(dtype, max_backtracks):
    """gamma never increases across successive backtracking calls from
    random points, starting from a deliberately too-large 10/Lest
    (``test_fb_tools.jl:28-46``); final gamma is strictly smaller."""
    f, Lf, n = quadratic_fixture(dtype)
    g = Zero()
    rng = np.random.default_rng(2)
    A = IdentityOperator()

    x0 = jnp.asarray(rng.standard_normal(n), dtype)
    _, grad0 = value_and_gradient(f, x0)
    Lest = lower_bound_smoothness_constant(f, A, x0, grad0)
    gamma_init = 10.0 / float(Lest)
    gamma = jnp.asarray(gamma_init, dtype)

    for _ in range(50):
        x = jnp.asarray(rng.standard_normal(n), dtype)
        f_x, grad, y, z, g_z, res = _candidates(f, g, x, gamma)
        bt = backtrack_stepsize(
            gamma, f, A, g, x, f_x, grad, y, z, g_z, res,
            alpha=0.5, max_backtracks=max_backtracks,
        )
        assert float(bt.gamma) <= float(gamma) + 1e-12
        gamma = bt.gamma

    assert float(gamma) < gamma_init
    # the accepted gamma satisfies the model inequality at the last point
    f_Az_upp = f_model(f_x, grad, bt.res, 0.5 / bt.gamma)
    eps = float(jnp.finfo(dtype).eps)
    assert float(bt.f_Az) <= float(f_Az_upp) + 10 * eps * (
        1 + abs(float(bt.f_Az))
    )


@pytest.mark.parametrize("dtype", DTYPES)
def test_bounded_equals_while_mode(dtype):
    """One backtracking call: the bounded masked mode reproduces the
    while-loop result bit-for-bit when T covers the search."""
    f, Lf, n = quadratic_fixture(dtype)
    g = Zero()
    rng = np.random.default_rng(3)
    A = IdentityOperator()
    x = jnp.asarray(rng.standard_normal(n), dtype)
    gamma = jnp.asarray(5.0 / Lf, dtype)  # too large -> must backtrack
    f_x, grad, y, z, g_z, res = _candidates(f, g, x, gamma)
    bt1 = backtrack_stepsize(gamma, f, A, g, x, f_x, grad, y, z, g_z, res)
    bt2 = backtrack_stepsize(gamma, f, A, g, x, f_x, grad, y, z, g_z, res,
                             max_backtracks=40)
    assert float(bt1.gamma) == float(bt2.gamma)
    np.testing.assert_array_equal(np.asarray(bt1.z), np.asarray(bt2.z))
    assert float(bt1.gamma) < float(gamma)
