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


# ---------------------------------------------------------------------------
# round-3 additions: NormL0, HingeLoss, IndBallLinf, IndHalfspace, IndPSD


@pytest.mark.parametrize("dtype", DTYPES)
def test_norml0_hard_threshold(dtype):
    from proxtpu.prox import NormL0

    lam, gamma = 0.8, 0.5
    f = NormL0(lam)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(64), dtype)
    z, f_z = f.prox(x, gamma)
    thr = np.sqrt(2 * gamma * lam)
    expect = np.where(np.abs(np.asarray(x)) > thr, np.asarray(x), 0.0)
    np.testing.assert_allclose(np.asarray(z), expect)
    np.testing.assert_allclose(float(f_z), lam * np.count_nonzero(expect))
    # per-coordinate the prox picks the cheaper of {keep, kill}
    keep_cost = lam  # objective cost of a kept nonzero
    kill_cost = np.asarray(x) ** 2 / (2 * gamma)
    better_kill = kill_cost < keep_cost
    assert np.all((np.asarray(z) == 0) == (better_kill | (np.asarray(x) == 0)))


@pytest.mark.parametrize("dtype", DTYPES)
def test_hinge_loss_prox(dtype):
    from proxtpu.prox import HingeLoss

    rng = np.random.default_rng(8)
    y = jnp.asarray(np.sign(rng.standard_normal(32)).astype(np.float64), dtype)
    x = jnp.asarray(2.0 * rng.standard_normal(32), dtype)
    mu, gamma = 1.5, 0.6
    f = HingeLoss(y, mu)
    v = float(f(x))
    np.testing.assert_allclose(
        v, mu * np.sum(np.maximum(0, 1 - np.asarray(y) * np.asarray(x))),
        rtol=1e-5,
    )
    z, f_z = f.prox(x, gamma)
    np.testing.assert_allclose(float(f_z), float(f(z)), rtol=1e-5)
    # separable scalar brute force on a fine grid
    for i in range(0, 32, 5):
        grid = np.linspace(-6, 6, 240001)
        obj = mu * gamma * np.maximum(0, 1 - float(y[i]) * grid) \
            + 0.5 * (grid - float(x[i])) ** 2
        np.testing.assert_allclose(
            float(z[i]), grid[np.argmin(obj)], atol=1e-4
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64, jnp.complex64])
def test_ind_ball_linf(dtype):
    from proxtpu.prox import IndBallLinf

    r = 0.7
    f = IndBallLinf(r)
    rng = np.random.default_rng(9)
    x = rng.standard_normal(24)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        x = x + 1j * rng.standard_normal(24)
    x = jnp.asarray(x, dtype)
    z, _ = f.prox(x, 1.0)
    assert float(jnp.max(jnp.abs(z))) <= r * (1 + 1e-6)
    assert float(f(z)) == 0.0
    # projection: each entry scaled onto the radius-r disk
    xa = np.asarray(x)
    expect = xa * np.minimum(1.0, r / np.maximum(np.abs(xa), 1e-30))
    np.testing.assert_allclose(np.asarray(z), expect, atol=1e-6)
    # idempotent
    z2, _ = f.prox(z, 1.0)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-7)


@pytest.mark.parametrize("dtype", DTYPES)
def test_ind_halfspace(dtype):
    from proxtpu.prox import IndHalfspace

    rng = np.random.default_rng(10)
    a = jnp.asarray(rng.standard_normal(16), dtype)
    b = 0.3
    f = IndHalfspace(a, b)
    x = jnp.asarray(rng.standard_normal(16) + 1.0, dtype)
    z, _ = f.prox(x, 1.0)
    aa, xa = np.asarray(a), np.asarray(x)
    t = max(0.0, (float(aa @ xa) - b) / float(aa @ aa))
    np.testing.assert_allclose(np.asarray(z), xa - t * aa, atol=1e-6)
    assert float(f(z)) == 0.0
    # interior points are fixed
    x_in = jnp.asarray(-np.abs(rng.standard_normal(16)) * np.sign(aa), dtype)
    if float(np.asarray(a) @ np.asarray(x_in)) <= b:
        z_in, _ = f.prox(x_in, 2.0)
        np.testing.assert_allclose(np.asarray(z_in), np.asarray(x_in))


@pytest.mark.parametrize("dtype", DTYPES)
def test_ind_psd(dtype):
    from proxtpu.prox import IndPSD

    f = IndPSD()
    rng = np.random.default_rng(11)
    S = rng.standard_normal((6, 6))
    X = jnp.asarray((S + S.T) / 2, dtype)
    Z, _ = f.prox(X, 1.0)
    w = np.linalg.eigvalsh(np.asarray(Z))
    assert w.min() >= -1e-5
    assert float(f(Z)) == 0.0
    # numpy oracle: eigen clamp
    wX, V = np.linalg.eigh(np.asarray(X))
    expect = (V * np.maximum(wX, 0)) @ V.T
    np.testing.assert_allclose(np.asarray(Z), expect, atol=1e-5)
    # Frobenius-nearest: no random PSD matrix is closer to X
    d_star = np.linalg.norm(np.asarray(X) - expect)
    for _ in range(20):
        R = rng.standard_normal((6, 6))
        P = R @ R.T / 6 + expect * rng.random()
        assert np.linalg.norm(np.asarray(X) - P) >= d_star - 1e-6


@pytest.mark.parametrize("dtype", DTYPES)
def test_ind_sphere_l2(dtype):
    from proxtpu.prox import IndSphereL2

    r = 1.5
    f = IndSphereL2(r)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal(9), dtype)
    z, _ = f.prox(x, 1.0)
    np.testing.assert_allclose(float(jnp.linalg.norm(z)), r, rtol=1e-5)
    assert float(f(z)) == 0.0
    # radial projection: z parallel to x
    cos = float(jnp.vdot(z, x) / (jnp.linalg.norm(z) * jnp.linalg.norm(x)))
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)
    # singularity convention: 0 -> r*e_1 (deterministic, on the sphere)
    z0, _ = f.prox(jnp.zeros(9, dtype), 1.0)
    np.testing.assert_allclose(float(jnp.linalg.norm(z0)), r, rtol=1e-5)
    assert float(z0[0]) > 0


@pytest.mark.parametrize("dtype", DTYPES)
def test_log_barrier(dtype):
    from proxtpu.prox import LogBarrier

    mu, gamma = 0.7, 0.4
    f = LogBarrier(mu)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal(12), dtype)  # mixed signs
    z, f_z = f.prox(x, gamma)
    assert float(jnp.min(z)) > 0  # prox lands strictly inside the domain
    np.testing.assert_allclose(float(f_z), float(f(z)), rtol=1e-5)
    # stationarity of the prox objective: z - x - gamma*mu/z = 0
    resid = np.asarray(z - x - gamma * mu / z)
    np.testing.assert_allclose(resid, 0.0, atol=1e-5)
    # gradient matches AD
    xp = jnp.asarray(0.5 + rng.random(12), dtype)
    v, g = f.value_and_gradient(xp)
    v_ad, g_ad = jax.value_and_grad(lambda u: f(u))(xp)
    np.testing.assert_allclose(float(v), float(v_ad), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), rtol=1e-4)
    # infeasible point evaluates to +inf
    assert not np.isfinite(float(f(x))) or bool(jnp.all(x > 0))


def test_ind_sphere_multi_leaf_zero_convention():
    """Projecting a multi-leaf zero iterate must land ON the sphere
    (e_1 in the first leaf only), not at radius r*sqrt(num_leaves)."""
    from proxtpu.prox import IndSphereL2

    r = 2.0
    f = IndSphereL2(r)
    z, fz = f.prox((jnp.zeros(6), jnp.zeros(6)), 1.0)
    total = float(jnp.sqrt(sum(jnp.sum(l * l) for l in z)))
    np.testing.assert_allclose(total, r, rtol=1e-6)
    assert float(f(z)) == 0.0
    assert float(z[0][0]) > 0 and float(jnp.max(jnp.abs(z[1]))) == 0.0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64, jnp.complex64])
def test_norm_linf(dtype):
    """NormLinf prox via Moreau: (i) hand oracle on a small real vector,
    (ii) the Moreau identity x = prox_{g f}(x) + g*prox_{f*/g}(x/g) with
    f* = Ind_{B1(lam)}, (iii) optimality among perturbations, complex-safe."""
    from proxtpu.prox import IndBallL1, NormLinf

    lam, gamma = 0.8, 1.5
    f = NormLinf(lam)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(9), dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        x = x + 1j * jnp.asarray(rng.standard_normal(9), jnp.float32)
    z, fz = f.prox(x, gamma)
    assert z.dtype == x.dtype
    # value consistency
    np.testing.assert_allclose(
        float(fz), lam * float(jnp.max(jnp.abs(z))), rtol=1e-5
    )
    # Moreau identity against the independent l1-ball projection
    p, _ = IndBallL1(gamma * lam).prox(x, gamma)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(x - p), rtol=1e-6, atol=1e-6
    )
    # prox point minimizes f(u) + ||u - x||^2/(2 gamma) among perturbations
    obj = lambda u: float(f(u)) + float(
        jnp.sum(jnp.abs(u - x) ** 2).real
    ) / (2 * gamma)
    base = obj(z)
    for _ in range(20):
        d = jnp.asarray(rng.standard_normal(9), jnp.float32).astype(dtype)
        assert obj(z + 0.05 * d) >= base - 1e-5 * (1 + abs(base))
    # hand oracle: small max-element pull-down
    xs = jnp.asarray([3.0, -1.0, 0.5], jnp.float32)
    zs, _ = NormLinf(1.0).prox(xs, 0.5)
    # only the max coordinate moves, down by gamma*lam (others below it)
    np.testing.assert_allclose(np.asarray(zs), [2.5, -1.0, 0.5], atol=1e-6)


def test_ind_soc():
    """Second-order cone projection: inside -> identity, polar -> 0,
    outside -> ((t+||v||)/2)(1, v/||v||); plus variational optimality."""
    from proxtpu.prox import IndSOC

    f = IndSOC()
    inside = jnp.asarray([2.0, 1.0, 1.0])           # ||v||=sqrt(2) <= 2
    z, _ = f.prox(inside, 1.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(inside), atol=0)
    assert float(f(z)) == 0.0
    polar = jnp.asarray([-3.0, 1.0, 0.0])           # ||v||=1 <= 3 = -t
    z, _ = f.prox(polar, 1.0)
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=0)
    out = jnp.asarray([0.0, 3.0, 4.0])              # ||v||=5 > 0
    z, _ = f.prox(out, 1.0)
    np.testing.assert_allclose(np.asarray(z), [2.5, 1.5, 2.0], atol=1e-6)
    assert float(f(z)) == 0.0
    # projection is the closest feasible point
    rng = np.random.default_rng(0)
    d0 = float(jnp.sum((z - out) ** 2))
    for _ in range(30):
        p = z + 0.1 * jnp.asarray(rng.standard_normal(3))
        if np.isfinite(float(f(p))):
            assert float(jnp.sum((p - out) ** 2)) >= d0 - 1e-8


def test_norm_l1_plus_l2():
    """Sparse-group-lasso prox = block-soft o soft, checked against the
    variational definition."""
    from proxtpu.prox import NormL1, NormL2, NormL1plusL2

    lam1, lam2, gamma = 0.4, 0.9, 0.7
    f = NormL1plusL2(lam1, lam2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(10))
    z, v = f.prox(x, gamma)
    u, _ = NormL1(lam1).prox(x, gamma)
    z2, _ = NormL2(lam2).prox(u, gamma)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=0)
    np.testing.assert_allclose(float(v), float(f(z)), rtol=1e-6)
    obj = lambda w: float(f(w)) + float(jnp.sum((w - x) ** 2)) / (2 * gamma)
    base = obj(z)
    for _ in range(25):
        d = jnp.asarray(rng.standard_normal(10))
        assert obj(z + 0.03 * d) >= base - 1e-8 * (1 + abs(base))


def test_ind_ball_l0():
    """Top-k hard projection keeps the k largest magnitudes."""
    from proxtpu.prox import IndBallL0

    x = jnp.asarray([0.5, -3.0, 1.5, 0.1, -2.0, 0.0])
    z, _ = IndBallL0(2).prox(x, 1.0)
    np.testing.assert_allclose(
        np.asarray(z), [0, -3.0, 0, 0, -2.0, 0], atol=0
    )
    f = IndBallL0(2)
    assert float(f(z)) == 0.0
    assert not np.isfinite(float(f(x)))
    # jit + 2-D leaf
    z2 = jax.jit(lambda u: IndBallL0(3).prox(u, 1.0)[0])(x.reshape(2, 3))
    assert int(jnp.sum(z2 != 0)) == 3


def test_dist_l2():
    """lam*dist_C prox: partial move toward the projection, full
    projection once within gamma*lam of the set."""
    from proxtpu.prox import DistL2, IndBallL2

    f = DistL2(IndBallL2(1.0), 2.0)      # dist to the unit ball, lam=2
    x = jnp.asarray([3.0, 0.0, 0.0])     # dist = 2, projection = e1
    v = float(f(x))
    np.testing.assert_allclose(v, 4.0, rtol=1e-6)
    z, fz = f.prox(x, 0.5)               # step = min(1, 1/2): halfway
    np.testing.assert_allclose(np.asarray(z), [2.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(fz), 2.0 * 1.0, rtol=1e-6)  # dist(z)=1
    z, fz = f.prox(x, 5.0)               # gamma*lam = 10 >= dist: project
    np.testing.assert_allclose(np.asarray(z), [1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(fz), 0.0, atol=1e-7)


def test_sqr_hinge_loss():
    """Squared hinge: closed-form prox satisfies smooth stationarity
    z - x + gamma * grad f(z) = 0, and value_and_gradient matches AD."""
    from proxtpu.prox import SqrHingeLoss

    rng = np.random.default_rng(2)
    y = jnp.asarray(np.sign(rng.standard_normal(8)))
    x = jnp.asarray(rng.standard_normal(8))
    mu, gamma = 0.7, 0.9
    f = SqrHingeLoss(y, mu)
    v, g = f.value_and_gradient(x)
    v_ad, g_ad = jax.value_and_grad(lambda u: f(u))(x)
    np.testing.assert_allclose(float(v), float(v_ad), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-6)
    z, fz = f.prox(x, gamma)
    _, gz = f.value_and_gradient(z)
    np.testing.assert_allclose(
        np.asarray(z - x + gamma * gz), 0.0, atol=1e-6
    )
    np.testing.assert_allclose(float(fz), float(f(z)), rtol=1e-6)


def test_capped_simplex_projection():
    """Bisection projection onto {0<=s<=1, sum s = k}: hand oracles and
    closest-feasible-point optimality."""
    from proxtpu.prox import IndCappedSimplex

    f = IndCappedSimplex(2)
    # already feasible
    x = jnp.asarray([1.0, 0.6, 0.4, 0.0])
    z, _ = f.prox(x, 1.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-12)
    assert float(f(z)) == 0.0
    # clear top-2 separation projects to the 2-hot vertex
    z, _ = f.prox(jnp.asarray([5.0, 4.0, 0.1, -3.0]), 1.0)
    np.testing.assert_allclose(np.asarray(z), [1, 1, 0, 0], atol=1e-9)
    # optimality: closest feasible point
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.standard_normal(8))
    z, _ = f.prox(y, 1.0)
    assert float(f(z)) == 0.0
    d0 = float(jnp.sum((z - y) ** 2))
    for _ in range(40):
        # random feasible point: projection of a random vector
        p, _ = f.prox(jnp.asarray(rng.standard_normal(8)), 1.0)
        assert float(jnp.sum((p - y) ** 2)) >= d0 - 1e-9


def test_sum_largest_and_maximum():
    """SumLargest prox via Moreau: value oracle, variational optimality,
    and the k=1 Maximum alias."""
    from proxtpu.prox import Maximum, SumLargest

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(9))
    lam, gamma, k = 0.7, 0.8, 3
    f = SumLargest(k, lam)
    np.testing.assert_allclose(
        float(f(x)),
        lam * float(np.sum(np.sort(np.asarray(x))[-k:])),
        rtol=1e-6,
    )
    z, v = f.prox(x, gamma)
    np.testing.assert_allclose(float(v), float(f(z)), rtol=1e-6)
    obj = lambda u: float(f(u)) + float(jnp.sum((u - x) ** 2)) / (2 * gamma)
    base = obj(z)
    for _ in range(30):
        d = jnp.asarray(rng.standard_normal(9))
        assert obj(z + 0.03 * d) >= base - 1e-8 * (1 + abs(base))
    # Maximum = SumLargest(1); for a well-separated max, the prox pulls
    # only the max coordinate down by gamma*lam
    m = Maximum(1.0)
    zs, _ = m.prox(jnp.asarray([3.0, 1.0, -1.0]), 0.5)
    np.testing.assert_allclose(np.asarray(zs), [2.5, 1.0, -1.0], atol=1e-9)


def test_sqr_hinge_general_y():
    """SqrHingeLoss.prox must be exact for GENERAL y (not just +-1),
    including y=0 coordinates (fixed points): stationarity
    z - x + gamma * grad f(z) = 0 and variational optimality."""
    from proxtpu.prox import SqrHingeLoss

    y = jnp.asarray([2.0, -0.5, 1.0, 0.0])
    x = jnp.asarray([0.3, 1.2, -0.4, 0.7])
    mu, gamma = 0.7, 0.9
    f = SqrHingeLoss(y, mu)
    z, fz = f.prox(x, gamma)
    _, gz = f.value_and_gradient(z)
    np.testing.assert_allclose(
        np.asarray(z - x + gamma * gz), 0.0, atol=1e-12
    )
    # y=0 coordinate is untouched (its loss term is constant)
    assert float(z[3]) == float(x[3])
    obj = lambda u: float(f(u)) + float(jnp.sum((u - x) ** 2)) / (2 * gamma)
    base = obj(z)
    rng = np.random.default_rng(6)
    for _ in range(30):
        d = jnp.asarray(rng.standard_normal(4))
        assert obj(z + 0.05 * d) >= base - 1e-10


def test_capped_simplex_infeasible_k_raises():
    """k outside [1, size] makes the capped simplex empty — the prox must
    raise instead of silently returning an infeasible point."""
    from proxtpu.prox import IndCappedSimplex, SumLargest

    x = jnp.asarray([0.3, 0.1, -0.2, 0.5])
    with np.testing.assert_raises(ValueError):
        IndCappedSimplex(6).prox(x, 1.0)
    with np.testing.assert_raises(ValueError):
        IndCappedSimplex(0).prox(x, 1.0)
    with np.testing.assert_raises(ValueError):
        SumLargest(6, 1.0).prox(x, 1.0)
