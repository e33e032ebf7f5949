"""Prox-calculus identities — property tests over the combinator layer.

Pin the algebra the primal-dual stack relies on
(``/root/reference/src/algorithms/primal_dual.jl:187,194`` uses
``convex_conjugate`` proxes every iteration):

* Moreau decomposition: x = prox_{g f}(x) + g * prox_{f*/g}(x/g);
* double conjugation is the identity for the wrapped objects;
* Translate / Postcompose prox rules against their variational definition;
* MoreauEnvelope gradient = (x - prox) / gamma and envelope <= f.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proxtpu.prox import (
    Conjugate,
    ElasticNet,
    HuberLoss,
    IndBallL2,
    MoreauEnvelope,
    NormL1,
    NormL2,
    Postcompose,
    SqrNormL2,
    Translate,
    convex_conjugate,
    prox,
)

FUNCS = [
    NormL1(0.7),
    NormL2(1.3),
    SqrNormL2(2.0),
    ElasticNet(0.5, 1.5),
    IndBallL2(0.8),
    HuberLoss(1.0, 2.0),
]


@pytest.mark.parametrize("f", FUNCS, ids=lambda f: type(f).__name__)
@pytest.mark.parametrize("gamma", [0.3, 1.0, 2.7])
def test_moreau_decomposition(f, gamma):
    """x = prox_{gamma f}(x) + gamma * prox_{gamma^-1 f*}(x / gamma)
    (for gamma=1 this is the familiar prox_f(x) + prox_{f*}(x) = x)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(9))
    z_f, _ = prox(f, x, gamma)
    u, _ = prox(Conjugate(f), x / gamma, 1.0 / gamma)
    np.testing.assert_allclose(
        np.asarray(z_f + gamma * u), np.asarray(x), atol=1e-10
    )


def test_double_conjugate_identity():
    f = NormL1(0.7)
    assert convex_conjugate(convex_conjugate(f)) is f

    from proxtpu.prox import IndZero, Zero

    assert isinstance(convex_conjugate(Zero()), IndZero)
    assert isinstance(convex_conjugate(IndZero()), Zero)
    # SqrNormL2 conjugates to the reciprocal-weight SqrNormL2
    c = convex_conjugate(SqrNormL2(4.0))
    assert isinstance(c, SqrNormL2)
    np.testing.assert_allclose(float(jnp.asarray(c.lam)), 0.25)


def test_conjugate_value_fenchel():
    """The value returned at the conjugate prox point satisfies the Fenchel
    relation f*(z) = <z, u> - f(u) with u the primal prox point."""
    f = NormL2(1.0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(6)) * 3
    z, val = prox(Conjugate(f), x, 1.0)
    # f* of NormL2(1) is the indicator of the unit ball: value must be ~0
    assert abs(float(val)) < 1e-8
    assert float(jnp.linalg.norm(z)) <= 1 + 1e-8


@pytest.mark.parametrize("gamma", [0.4, 1.7])
def test_translate_prox_rule(gamma):
    f = NormL1(0.9)
    t = jnp.asarray([0.3, -1.2, 0.8, 0.0])
    g = Translate(f, t)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(4))
    z, v = prox(g, x, gamma)
    z_direct, _ = prox(f, x + t, gamma)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_direct - t),
                               atol=1e-12)
    np.testing.assert_allclose(float(v), float(g(z)), atol=1e-10)


@pytest.mark.parametrize("a", [0.5, 3.0])
def test_postcompose_prox_rule(a):
    f = NormL1(1.0)
    g = Postcompose(f, a, 0.25)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(5))
    z, v = prox(g, x, 0.8)
    z_direct, _ = prox(f, x, 0.8 * a)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_direct), atol=0)
    np.testing.assert_allclose(float(v), a * float(f(z)) + 0.25, atol=1e-10)


def test_moreau_envelope_gradient_and_bound():
    f = NormL1(1.0)
    env = MoreauEnvelope(f, 0.5)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(7))
    v, grad = env.value_and_gradient(x)
    z, _ = prox(f, x, 0.5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray((x - z) / 0.5),
                               atol=1e-10)
    assert float(v) <= float(f(x)) + 1e-10
    # AD through the envelope agrees with the closed-form gradient
    grad_ad = jax.grad(lambda u: env(u))(x)
    np.testing.assert_allclose(np.asarray(grad_ad), np.asarray(grad),
                               atol=1e-6)


@pytest.mark.parametrize("gamma", [0.4, 1.5])
def test_precompose_orthogonal(gamma):
    """Precompose with an orthogonal Q (mu=1): the prox must equal the
    change-of-variables solution Q^T (prox_{gamma f}(Qx + b) - b)."""
    from proxtpu.prox import Precompose

    rng = np.random.default_rng(7)
    Q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    Q = jnp.asarray(Q)
    b = jnp.asarray(rng.standard_normal(6) * 0.3)
    f = NormL1(0.7)
    g = Precompose(f, Q, 1.0, b)
    x = jnp.asarray(rng.standard_normal(6))
    z, v = prox(g, x, gamma)
    zf, _ = prox(f, Q @ x + b, gamma)
    np.testing.assert_allclose(np.asarray(z), np.asarray(Q.T @ (zf - b)),
                               atol=1e-6)
    np.testing.assert_allclose(float(v), float(g(z)), atol=1e-6)
    # variational optimality among perturbations
    obj = lambda u: float(g(u)) + float(jnp.sum((u - x) ** 2)) / (2 * gamma)
    base = obj(z)
    for _ in range(15):
        d = jnp.asarray(rng.standard_normal(6))
        assert obj(z + 0.05 * d) >= base - 1e-8 * (1 + abs(base))


def test_precompose_tight_frame_and_gradient():
    """Wide tight frame L (rows of an orthogonal matrix, scaled): L L* =
    mu I with mu = c^2; prox satisfies the variational definition and the
    closed-form gradient matches AD for smooth f."""
    from proxtpu.prox import Precompose, SqrNormL2

    rng = np.random.default_rng(8)
    Q, _ = np.linalg.qr(rng.standard_normal((9, 9)))
    c = 1.7
    L = jnp.asarray(c * Q[:4])          # (4, 9), L L^T = c^2 I_4
    mu = c * c
    f = NormL1(0.5)
    g = Precompose(f, L, mu)
    x = jnp.asarray(rng.standard_normal(9))
    gamma = 0.9
    z, v = prox(g, x, gamma)
    np.testing.assert_allclose(float(v), float(g(z)), atol=1e-6)
    obj = lambda u: float(g(u)) + float(jnp.sum((u - x) ** 2)) / (2 * gamma)
    base = obj(z)
    for _ in range(25):
        d = jnp.asarray(rng.standard_normal(9))
        assert obj(z + 0.03 * d) >= base - 1e-8 * (1 + abs(base))
    # smooth chain rule: grad (f o L) = L^T grad f(Lx + b)
    h = Precompose(SqrNormL2(1.3), L, mu, 0.2)
    val, grad = h.value_and_gradient(x)
    val_ad, grad_ad = jax.value_and_grad(lambda u: h(u))(x)
    np.testing.assert_allclose(float(val), float(val_ad), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ad),
                               rtol=1e-5, atol=1e-6)
