"""Graphical lasso (sparse inverse covariance) — the NegLogDet prox family.

    minimize_{Theta > 0}  tr(S Theta) - logdet(Theta) + lam * ||Theta||_1,off

solved by Douglas-Rachford splitting over matrix iterates:

* f = Tilt(NegLogDet(1), S)      (prox = eigendecomposition shift, keeps
  every iterate inside the PD cone),
* g = NormL1(lam * (1 - I))      (weighted l1: off-diagonal entries only).

The reference has no graphical-lasso test, but its ecosystem provides the
pieces (ProximalOperators LogBarrier-on-matrices / weighted NormL1 /
Tilt); this family exercises them end-to-end with an oracle-free KKT
certificate:  at the solution, S - Theta^{-1} + lam * G = 0 with
G in the subdifferential of ||.||_1,off, i.e.

* diagonal:        (S - Theta^{-1})_ii = 0,
* nonzero offdiag: (S - Theta^{-1})_ij = -lam * sign(Theta_ij),
* zero offdiag:    |(S - Theta^{-1})_ij| <= lam.

Also pins the NegLogDet / IndStiefel / IndBinary / CrossEntropy /
PointwiseMinimum primitives directly (the matrix-leaf members that do not
fit the vector property sweep in test_prox_properties.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import (
    CrossEntropy,
    IndBinary,
    IndStiefel,
    NegLogDet,
    NormL1,
    PointwiseMinimum,
    IndPoint,
    Tilt,
    value_and_gradient,
)


def _sparse_spd_problem(n, seed, density=0.12):
    """Random sparse precision matrix + exact covariance as S."""
    rng = np.random.default_rng(seed)
    P = np.zeros((n, n))
    idx = rng.random((n, n)) < density
    vals = rng.uniform(0.3, 0.8, (n, n)) * np.sign(rng.standard_normal((n, n)))
    P[idx] = vals[idx]
    P = (P + P.T) / 2
    np.fill_diagonal(P, 0.0)
    # diagonal dominance => PD
    np.fill_diagonal(P, np.abs(P).sum(axis=1) + 0.5)
    S = np.linalg.inv(P)
    S = (S + S.T) / 2
    return jnp.asarray(P), jnp.asarray(S)


def _solve_glasso(S, lam, gamma=0.5, tol=1e-9, maxit=4000):
    n = S.shape[0]
    offdiag = lam * (1.0 - jnp.eye(n, dtype=S.dtype))
    f = Tilt(NegLogDet(1.0), S)
    g = NormL1(offdiag)
    x0 = jnp.eye(n, dtype=S.dtype)
    theta, it = pa.DouglasRachford(gamma=gamma, tol=tol, maxit=maxit)(
        x0=x0, f=f, g=g
    )
    return theta, it


@pytest.mark.parametrize("dtype", [jnp.float64])
def test_graphical_lasso_kkt(dtype):
    n, lam = 12, 0.08
    _, S = _sparse_spd_problem(n, seed=3)
    S = S.astype(dtype)
    theta, it = _solve_glasso(S, lam)
    assert it < 4000

    theta = (theta + theta.T) / 2
    w = jnp.linalg.eigvalsh(theta)
    assert float(w.min()) > 0  # PD iterate

    grad = S - jnp.linalg.inv(theta)  # gradient of the smooth part
    eye = np.eye(n, dtype=bool)
    gnp = np.asarray(grad)
    tnp = np.asarray(theta)

    # KKT, entrywise (tolerances scale with the DR fixed-point tol)
    assert np.max(np.abs(gnp[eye])) < 1e-6
    off = ~eye
    nz = off & (np.abs(tnp) > 1e-7)
    z = off & (np.abs(tnp) <= 1e-7)
    if nz.any():
        np.testing.assert_allclose(
            gnp[nz], -lam * np.sign(tnp[nz]), atol=1e-6
        )
    assert np.max(np.abs(gnp[z])) <= lam + 1e-6
    # the penalty actually bites: some off-diagonals are exactly sparse
    assert z.any() and nz.any()


def test_graphical_lasso_recovers_support():
    """With S the EXACT covariance of a sparse precision and a small lam,
    the estimate's largest off-diagonal entries sit on the true support."""
    n, lam = 10, 0.02
    P, S = _sparse_spd_problem(n, seed=7)
    theta, _ = _solve_glasso(S, lam, tol=1e-10)
    tnp = np.asarray((theta + theta.T) / 2)
    Pnp = np.asarray(P)
    off = ~np.eye(n, dtype=bool)
    true_support = off & (np.abs(Pnp) > 1e-12)
    est = np.abs(tnp)[off]
    thr = est.max() * 0.25
    picked = off & (np.abs(tnp) > thr)
    # every confidently-picked edge is a true edge
    assert np.all(true_support[picked])


def test_graphical_lasso_batched_matches_loop():
    """vmapped graphical-lasso DR == per-instance loop (the library's
    batched-vs-loop contract on a matrix-iterate, eigh-prox family)."""
    n, lam, B = 8, 0.05, 4
    Ss = jnp.stack(
        [_sparse_spd_problem(n, seed=10 + i)[1] for i in range(B)]
    )
    offdiag = lam * (1.0 - jnp.eye(n))
    gamma, iters = 0.5, 600

    def run(S):
        f = Tilt(NegLogDet(1.0), S)
        g = NormL1(offdiag)
        it = pa.DouglasRachfordIteration(
            f=f, g=g, x0=jnp.eye(n), gamma=gamma
        )
        s = it.init()

        def body(_, st):
            return it.step(st)

        return jax.lax.fori_loop(0, iters, body, s).y

    batched = jax.vmap(run)(Ss)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(run(Ss[i])), atol=1e-10
        )


# ---------------------------------------------------------------------------
# matrix-leaf / domain-restricted primitives not covered by the vector sweep


def test_neglogdet_prox_variational():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6))
    X = jnp.asarray((A + A.T) / 2)
    mu, gamma = 1.3, 0.7
    Z, v = NegLogDet(mu).prox(X, gamma)
    w = jnp.linalg.eigvalsh(Z)
    assert float(w.min()) > 0
    # stationarity: (X - Z)/gamma = -mu * Z^{-1}
    np.testing.assert_allclose(
        np.asarray(X), np.asarray(Z - gamma * mu * jnp.linalg.inv(Z)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        float(v), float(-mu * jnp.sum(jnp.log(w))), rtol=1e-12
    )
    # value: +inf outside the PD cone, finite inside
    assert np.isinf(float(NegLogDet(mu)(X - 10 * jnp.eye(6))))
    assert np.isfinite(float(NegLogDet(mu)(Z)))


def test_neglogdet_dtype_preserved():
    X = jnp.eye(5, dtype=jnp.float32) * 2.0
    Z, v = NegLogDet(0.5).prox(X, 0.3)
    assert Z.dtype == jnp.float32
    # eigenvalues of prox at w=2: (2 + sqrt(4 + 4*0.3*0.5))/2
    expect = (2 + np.sqrt(4 + 4 * 0.3 * 0.5)) / 2
    np.testing.assert_allclose(np.asarray(Z), expect * np.eye(5), rtol=1e-6)


def test_ind_stiefel_projection():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((7, 3)))
    Z, v = IndStiefel().prox(X, 1.0)
    np.testing.assert_allclose(
        np.asarray(Z.T @ Z), np.eye(3), atol=1e-12
    )
    assert float(v) == 0.0
    assert float(IndStiefel()(Z)) == 0.0
    assert np.isinf(float(IndStiefel()(X)))
    # nearest-point property vs random Stiefel points
    dist = float(jnp.linalg.norm(X - Z))
    for _ in range(20):
        Q, _ = np.linalg.qr(rng.standard_normal((7, 3)))
        assert float(jnp.linalg.norm(X - jnp.asarray(Q))) >= dist - 1e-10


def test_ind_binary():
    z, v = IndBinary(-1.0, 2.0).prox(jnp.asarray([0.4, 0.6, -3.0, 5.0]), 0.5)
    np.testing.assert_array_equal(np.asarray(z), [-1.0, 2.0, -1.0, 2.0])
    assert float(v) == 0.0
    assert float(IndBinary(-1.0, 2.0)(z)) == 0.0
    assert np.isinf(float(IndBinary(-1.0, 2.0)(jnp.asarray([0.0]))))


def test_cross_entropy_value_and_gradient():
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.uniform(0, 1, 9))
    x = jnp.asarray(rng.uniform(0.1, 0.9, 9))
    ce = CrossEntropy(b)
    v, g = value_and_gradient(ce, x)
    expect_v = -np.mean(
        np.asarray(b) * np.log(np.asarray(x))
        + (1 - np.asarray(b)) * np.log1p(-np.asarray(x))
    )
    expect_g = (-(np.asarray(b) / np.asarray(x))
                + (1 - np.asarray(b)) / (1 - np.asarray(x))) / 9
    np.testing.assert_allclose(float(v), expect_v, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), expect_g, rtol=1e-10)


def test_pointwise_minimum_value_and_prox():
    a = jnp.asarray([1.0, -2.0, 0.5])
    pm = PointwiseMinimum((IndPoint(a), IndPoint(-a)))
    # value is the min over members
    assert float(pm(a)) == 0.0
    assert np.isinf(float(pm(0.3 * a)))
    z, v = pm.prox(0.9 * a, 1.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(a))
    z, v = pm.prox(-0.9 * a, 1.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(-a))


def test_ind_graph_projection():
    """IndGraph: (u, v) = P(x, y) satisfies v = A u exactly and is the
    nearest graph point (variational + normal-equation checks)."""
    from proxtpu.prox import IndGraph

    rng = np.random.default_rng(8)
    A = jnp.asarray(rng.standard_normal((6, 4)))
    g = IndGraph(A)
    x = jnp.asarray(rng.standard_normal(4))
    y = jnp.asarray(rng.standard_normal(6))
    (u, v), val = g.prox((x, y), 0.7)
    np.testing.assert_allclose(np.asarray(v), np.asarray(A @ u), atol=1e-12)
    assert float(val) == 0.0
    # normal equations: (I + A^T A) u = x + A^T y
    lhs = np.asarray(u) + np.asarray(A.T @ (A @ u))
    np.testing.assert_allclose(lhs, np.asarray(x + A.T @ y), atol=1e-11)
    # indicator values
    assert float(g((u, v))) == 0.0
    assert np.isinf(float(g((x, y))))
    # nearest-point vs random graph points
    d0 = float(jnp.linalg.norm(x - u) ** 2 + jnp.linalg.norm(y - v) ** 2)
    for _ in range(20):
        w = jnp.asarray(rng.standard_normal(4))
        d = float(jnp.linalg.norm(x - w) ** 2
                  + jnp.linalg.norm(y - A @ w) ** 2)
        assert d >= d0 - 1e-10
    # pytree roundtrip preserves the cached factorization
    leaves, tdef = jax.tree.flatten(g)
    g2 = jax.tree.unflatten(tdef, leaves)
    (u2, v2), _ = g2.prox((x, y), 0.7)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u))


def test_ind_rank_truncation():
    from proxtpu.prox import IndRank

    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.standard_normal((8, 6)))
    Z, val = IndRank(2).prox(X, 1.0)
    s = np.linalg.svd(np.asarray(Z), compute_uv=False)
    assert np.sum(s > 1e-10) == 2
    assert float(val) == 0.0
    assert float(IndRank(2)(Z)) == 0.0
    assert np.isinf(float(IndRank(2)(X)))
    # Eckart-Young: the truncation is the nearest rank-2 matrix
    U, S, Vh = np.linalg.svd(np.asarray(X), full_matrices=False)
    best = (U[:, :2] * S[:2]) @ Vh[:2]
    np.testing.assert_allclose(np.asarray(Z), best, atol=1e-12)


def test_neg_entropy_prox():
    from proxtpu.prox import NegEntropy

    rng = np.random.default_rng(10)
    lam, gamma = 0.8, 0.6
    f = NegEntropy(lam)
    x = jnp.asarray(np.concatenate([
        rng.standard_normal(6) * 3, [-50.0, 1e4, 1e-6, 0.0]]))
    z, val = f.prox(x, gamma)
    z_np = np.asarray(z)
    assert np.all(z_np > 0)
    # stationarity: gamma*lam*(log z + 1) + z - x = 0
    res = gamma * lam * (np.log(z_np) + 1) + z_np - np.asarray(x)
    np.testing.assert_allclose(res, 0, atol=1e-9 * (1 + np.abs(z_np).max()))
    np.testing.assert_allclose(
        float(val), lam * np.sum(z_np * np.log(z_np)), rtol=1e-10
    )
    # value: 0 log 0 = 0, negatives are infeasible
    assert float(f(jnp.zeros(3))) == 0.0
    assert np.isinf(float(f(jnp.asarray([-0.1, 0.5, 0.2]))))
