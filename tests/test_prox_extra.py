"""Extended prox library: Huber, simplex/ball projections, SumPositive.

Each prox is validated against the variational definition
``z = argmin_u f(u) + ||u - x||^2 / (2 gamma)`` by (a) closed-form /
numpy-reference projections and (b) the first-order optimality check that
no random perturbation decreases the prox objective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proxtpu.prox import (
    HuberLoss,
    IndBallL1,
    IndBallL2,
    IndSimplex,
    SumPositive,
)

DTYPES = [jnp.float32, jnp.float64]


def prox_objective(f, u, x, gamma):
    return float(f(u)) + float(jnp.sum((u - x) ** 2)) / (2 * gamma)


def assert_prox_optimal(f, x, gamma, z, trials=50, scale=1e-3):
    """No random feasible perturbation may beat the prox point."""
    base = prox_objective(f, z, x, gamma)
    rng = np.random.default_rng(0)
    for _ in range(trials):
        u = z + jnp.asarray(
            scale * rng.standard_normal(z.shape).astype(np.asarray(z).dtype)
        )
        val = prox_objective(f, u, x, gamma)
        if np.isfinite(val):
            assert val >= base - 1e-6 * (1 + abs(base))


@pytest.mark.parametrize("dtype", DTYPES)
def test_huber_gradient_and_prox(dtype):
    f = HuberLoss(rho=1.0, mu=2.0)
    rng = np.random.default_rng(1)
    for scale in (0.1, 3.0):  # quadratic and linear regions
        x = jnp.asarray(scale * rng.standard_normal(7), dtype)
        v, g = f.value_and_gradient(x)
        v_ad, g_ad = jax.value_and_grad(lambda u: f(u))(x)
        np.testing.assert_allclose(float(v), float(v_ad), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-4)
        z, f_z = f.prox(x, 0.7)
        np.testing.assert_allclose(float(f_z), float(f(z)), rtol=1e-5)
        assert_prox_optimal(f, x, 0.7, z)


@pytest.mark.parametrize("dtype", DTYPES)
def test_simplex_projection(dtype):
    f = IndSimplex(1.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(10), dtype)
    z, v = f.prox(x, 1.0)
    z_np = np.asarray(z, np.float64)
    assert abs(z_np.sum() - 1.0) < 1e-5
    assert (z_np >= 0).all()
    assert float(v) == 0.0
    # matches the classic sort-based reference implementation
    u = np.sort(np.asarray(x, np.float64))[::-1]
    css = np.cumsum(u) - 1.0
    k = np.max(np.nonzero(u - css / np.arange(1, 11) > 0)[0]) + 1
    tau = css[k - 1] / k
    np.testing.assert_allclose(
        z_np, np.maximum(np.asarray(x, np.float64) - tau, 0), atol=1e-5
    )
    # feasible point is a fixed point
    e = jnp.zeros(10, dtype).at[3].set(1.0)
    z2, _ = f.prox(e, 1.0)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(e), atol=1e-6)
    assert float(f(e)) == 0.0
    assert float(f(x)) == np.inf


@pytest.mark.parametrize("dtype", DTYPES)
def test_ball_l2(dtype):
    f = IndBallL2(2.0)
    x = jnp.asarray([3.0, 4.0], dtype)  # norm 5 -> project to radius 2
    z, _ = f.prox(x, 1.0)
    np.testing.assert_allclose(np.asarray(z), [1.2, 1.6], rtol=1e-6)
    inside = jnp.asarray([0.5, -0.3], dtype)
    z2, _ = f.prox(inside, 1.0)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(inside), atol=0)
    assert float(f(x)) == np.inf and float(f(inside)) == 0.0


@pytest.mark.parametrize("dtype", DTYPES)
def test_ball_l1(dtype):
    f = IndBallL1(1.0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(8), dtype)
    z, _ = f.prox(x, 1.0)
    z_np = np.asarray(z, np.float64)
    assert np.abs(z_np).sum() <= 1.0 + 1e-5
    assert_prox_optimal(f, x, 1.0, z)
    # signs are preserved
    assert np.all(np.sign(z_np[z_np != 0]) == np.sign(np.asarray(x)[z_np != 0]))
    inside = jnp.asarray([0.2, -0.3, 0.1, 0, 0, 0, 0, 0], dtype)
    z2, _ = f.prox(inside, 1.0)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(inside), atol=0)


@pytest.mark.parametrize("dtype", DTYPES)
def test_sum_positive(dtype):
    f = SumPositive()
    x = jnp.asarray([2.0, 0.5, -1.0, 0.0], dtype)
    z, f_z = f.prox(x, 1.0)
    # positive entries shift down by gamma (to >= 0), negatives untouched
    np.testing.assert_allclose(np.asarray(z), [1.0, 0.0, -1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(float(f_z), 1.0, atol=1e-6)
    assert_prox_optimal(f, x, 1.0, z)


def test_simplex_in_solver():
    """Projected gradient onto the simplex through the public solver API:
    min ||x - c||^2/2 s.t. x in simplex — solution is the projection."""
    import proxtpu as pa
    from proxtpu.prox import SqrDistance

    c = jnp.asarray([0.3, 0.9, -0.2, 0.4], jnp.float64)
    solver = pa.ForwardBackward(tol=1e-10)
    x, it = solver(
        x0=jnp.full(4, 0.25, jnp.float64), f=SqrDistance(c),
        g=IndSimplex(1.0), Lf=1.0,
    )
    z_ref, _ = IndSimplex(1.0).prox(c, 1.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(z_ref), atol=1e-8)
