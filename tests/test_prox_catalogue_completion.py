"""Tests for the final ProximalOperators.jl catalogue stragglers (round 5):
IndFree, IndNonpositive, IndHyperslab, IndPolyhedral, TotalVariation1D,
PrecomposeDiagonal, Sum, IndBallRank alias.

Oracles: scipy SLSQP on the projection QP (IndHyperslab/IndPolyhedral), an
SLSQP epigraph reformulation of the TV-prox objective (the nonsmooth
objective defeats L-BFGS-B), and the closed-form separable solution for
PrecomposeDiagonal.  Reference semantics follow ProximalOperators.jl
(the function library the reference's tests import — e.g.
/root/reference/test/problems/test_lasso_small.jl:4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from proxtpu.prox import (
    IndBallRank,
    IndFree,
    IndHyperslab,
    IndNonpositive,
    IndPolyhedral,
    IndRank,
    NormL1,
    PrecomposeDiagonal,
    SqrNormL2,
    Sum,
    TotalVariation1D,
    make_least_squares,
    value_and_gradient,
)


def test_ind_free():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(8))
    f = IndFree()
    z, v = f.prox(x, 0.7)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    assert float(v) == 0.0
    assert float(f(x)) == 0.0
    val, g = value_and_gradient(f, x)
    assert float(val) == 0.0
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_ind_nonpositive():
    x = jnp.asarray([-1.0, 2.0, 0.0, -3.5, 0.7])
    g = IndNonpositive()
    z, v = g.prox(x, 1.3)
    np.testing.assert_allclose(
        np.asarray(z), np.minimum(np.asarray(x), 0.0)
    )
    assert float(v) == 0.0
    assert np.isinf(float(g(x)))
    assert float(g(z)) == 0.0


@pytest.mark.parametrize("lo,hi", [(-0.3, 0.5), (-np.inf, 0.2), (0.1, 0.1)])
def test_ind_hyperslab_vs_slsqp(lo, hi):
    rng = np.random.default_rng(3)
    n = 10
    a = rng.standard_normal(n)
    x = rng.standard_normal(n) * 2
    f = IndHyperslab(jnp.asarray(a), lo, hi)
    z, v = f.prox(jnp.asarray(x), 1.0)
    assert float(v) == 0.0
    assert float(f(z)) == 0.0

    cons = []
    if np.isfinite(hi):
        cons.append({"type": "ineq", "fun": lambda u: hi - a @ u})
    if np.isfinite(lo):
        cons.append({"type": "ineq", "fun": lambda u: a @ u - lo})
    r = minimize(
        lambda u: 0.5 * np.sum((u - x) ** 2),
        np.zeros(n),
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-14},
    )
    np.testing.assert_allclose(np.asarray(z), r.x, atol=5e-7)


def test_ind_polyhedral_vs_slsqp():
    rng = np.random.default_rng(7)
    m, n = 6, 10
    A = rng.standard_normal((m, n))
    lo = rng.standard_normal(m) - 2.0
    hi = lo + np.abs(rng.standard_normal(m)) * 1.5
    x = rng.standard_normal(n) * 2
    f = IndPolyhedral(jnp.asarray(A), jnp.asarray(lo), jnp.asarray(hi))
    z, v = f.prox(jnp.asarray(x), 1.0)
    assert float(v) == 0.0
    assert float(f(z)) == 0.0  # returned point is feasible

    cons = [
        {"type": "ineq", "fun": lambda u: hi - A @ u},
        {"type": "ineq", "fun": lambda u: A @ u - lo},
    ]
    r = minimize(
        lambda u: 0.5 * np.sum((u - x) ** 2),
        np.zeros(n),
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-14},
    )
    np.testing.assert_allclose(np.asarray(z), r.x, atol=5e-7)


def test_ind_polyhedral_equality_rows():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((3, 8))
    b = rng.standard_normal(3)
    x = rng.standard_normal(8)
    f = IndPolyhedral(jnp.asarray(A), jnp.asarray(b), jnp.asarray(b))
    z, _ = f.prox(jnp.asarray(x), 1.0)
    np.testing.assert_allclose(A @ np.asarray(z), b, atol=1e-7)
    # affine projection oracle: x - A^T (A A^T)^{-1} (A x - b)
    zo = x - A.T @ np.linalg.solve(A @ A.T, A @ x - b)
    np.testing.assert_allclose(np.asarray(z), zo, atol=1e-6)


def test_ind_polyhedral_interior_point_fixed():
    """A point already inside the polyhedron projects to itself (and the
    early-exit fires, so this is also a 0-iteration path check)."""
    A = jnp.asarray(np.eye(4))
    f = IndPolyhedral(A, -jnp.ones(4), jnp.ones(4))
    x = jnp.asarray([0.1, -0.2, 0.5, 0.0])
    z, _ = f.prox(x, 2.0)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-12)


def test_ind_polyhedral_jit_vmap():
    rng = np.random.default_rng(13)
    A = jnp.asarray(rng.standard_normal((5, 7)))
    lo = jnp.asarray(rng.standard_normal(5) - 1.5)
    hi = lo + 1.0
    f = IndPolyhedral(A, lo, hi)
    X = jnp.asarray(rng.standard_normal((4, 7)))
    Z = jax.jit(jax.vmap(lambda xi: f.prox(xi, 1.0)[0]))(X)
    assert Z.shape == (4, 7)
    for i in range(4):
        zi, _ = f.prox(X[i], 1.0)
        np.testing.assert_allclose(np.asarray(Z[i]), np.asarray(zi),
                                   atol=1e-10)


def _tv_epigraph_oracle(xs, thr):
    """SLSQP on min_u 0.5||u-x||^2 + thr*sum t, |diff(u)| <= t."""
    n = xs.shape[0]
    cons = []
    for i in range(n - 1):
        cons.append(
            {"type": "ineq", "fun": (lambda w, i=i: w[n + i] - (w[i + 1] - w[i]))}
        )
        cons.append(
            {"type": "ineq", "fun": (lambda w, i=i: w[n + i] + (w[i + 1] - w[i]))}
        )
    w0 = np.concatenate([xs, np.abs(np.diff(xs))])
    r = minimize(
        lambda w: 0.5 * np.sum((w[:n] - xs) ** 2) + thr * np.sum(w[n:]),
        w0,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 1000, "ftol": 1e-16},
    )
    return r.x[:n]


@pytest.mark.parametrize("gamma", [0.3, 0.9])
def test_total_variation_1d_vs_epigraph_qp(gamma):
    rng = np.random.default_rng(17)
    n, lam = 15, 0.4
    xs = rng.standard_normal(n)
    tv = TotalVariation1D(lam)
    z, v = tv.prox(jnp.asarray(xs), gamma)
    uo = _tv_epigraph_oracle(xs, gamma * lam)
    np.testing.assert_allclose(np.asarray(z), uo, atol=1e-6)
    np.testing.assert_allclose(
        float(v), lam * np.sum(np.abs(np.diff(np.asarray(z)))), atol=1e-12
    )
    np.testing.assert_allclose(
        float(tv(jnp.asarray(xs))), lam * np.sum(np.abs(np.diff(xs))),
        atol=1e-12,
    )


def test_total_variation_1d_large_lambda_flattens():
    """For thr >= the 'total variation budget', the prox is the mean."""
    xs = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    tv = TotalVariation1D(100.0)
    z, _ = tv.prox(xs, 1.0)
    np.testing.assert_allclose(
        np.asarray(z), float(jnp.mean(xs)) * np.ones(4), atol=1e-6
    )


def test_total_variation_1d_batched_vmap():
    rng = np.random.default_rng(19)
    X = jnp.asarray(rng.standard_normal((3, 12)))
    tv = TotalVariation1D(0.25)
    Z = jax.jit(jax.vmap(lambda xi: tv.prox(xi, 0.7)[0]))(X)
    for i in range(3):
        zi, _ = tv.prox(X[i], 0.7)
        np.testing.assert_allclose(np.asarray(Z[i]), np.asarray(zi),
                                   atol=1e-9)


def test_precompose_diagonal_closed_form():
    rng = np.random.default_rng(23)
    n = 10
    a = rng.standard_normal(n)
    a = np.where(np.abs(a) < 0.3, 0.5, a)
    b, lam, gamma = 0.2, 0.7, 0.8
    x = rng.standard_normal(n)
    pc = PrecomposeDiagonal(NormL1(lam), jnp.asarray(a), b)
    z, f_z = pc.prox(jnp.asarray(x), gamma)
    # separable closed form: w* = soft(a x + b, gamma a^2 lam), u = (w-b)/a
    y = a * x + b
    thr = gamma * a * a * lam
    w = np.sign(y) * np.maximum(np.abs(y) - thr, 0)
    np.testing.assert_allclose(np.asarray(z), (w - b) / a, atol=1e-12)
    np.testing.assert_allclose(float(f_z), lam * np.sum(np.abs(w)),
                               atol=1e-10)
    # gradient chain rule on a smooth precomposition
    pcs = PrecomposeDiagonal(SqrNormL2(1.0), jnp.asarray(a), b)
    v, g = value_and_gradient(pcs, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), a * y, atol=1e-12)
    assert pc.is_convex and not pc.is_generalized_quadratic


def test_sum_smooth_combinator():
    rng = np.random.default_rng(29)
    A = jnp.asarray(rng.standard_normal((6, 10)))
    b = jnp.asarray(rng.standard_normal(6))
    x = jnp.asarray(rng.standard_normal(10))
    f1 = make_least_squares(A, b)
    f2 = SqrNormL2(0.5)
    s = Sum((f1, f2))
    v, g = value_and_gradient(s, x)
    v1, g1 = value_and_gradient(f1, x)
    v2, g2 = value_and_gradient(f2, x)
    np.testing.assert_allclose(float(v), float(v1 + v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g1 + g2),
                               rtol=1e-12)
    assert s.is_convex
    assert s.is_generalized_quadratic  # both terms are quadratic
    assert not hasattr(s, "prox")


def test_ind_ball_rank_alias():
    assert IndBallRank is IndRank


def test_sum_in_solver():
    """Sum as the smooth term of a ForwardBackward solve: least squares
    split into two row blocks must reproduce the full-matrix solve."""
    import proxtpu as pa

    rng = np.random.default_rng(31)
    A = rng.standard_normal((8, 6))
    b = rng.standard_normal(8)
    lam = 0.05
    x0 = jnp.zeros(6)
    Lf = float(np.linalg.norm(A, 2) ** 2)
    f_full = make_least_squares(jnp.asarray(A), jnp.asarray(b))
    f_sum = Sum(
        (
            make_least_squares(jnp.asarray(A[:4]), jnp.asarray(b[:4])),
            make_least_squares(jnp.asarray(A[4:]), jnp.asarray(b[4:])),
        )
    )
    g = NormL1(lam)
    xa, _ = pa.ForwardBackward(tol=1e-9, maxit=5000)(
        x0=x0, f=f_full, g=g, Lf=Lf
    )
    xb, _ = pa.ForwardBackward(tol=1e-9, maxit=5000)(
        x0=x0, f=f_sum, g=g, Lf=Lf
    )
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-7)


def test_total_variation_1d_restart_matches_plain():
    """restart=True (default) reaches the same fixed point as the plain
    dual FGP — parity to the f32/f64 accuracy floor, and both match the
    epigraph-QP oracle."""
    rng = np.random.default_rng(37)
    n, lam, gamma = 20, 0.5, 0.8
    xs = rng.standard_normal(n)
    zr, _ = TotalVariation1D(lam, restart=True).prox(jnp.asarray(xs), gamma)
    zp, _ = TotalVariation1D(lam, restart=False).prox(jnp.asarray(xs), gamma)
    np.testing.assert_allclose(np.asarray(zr), np.asarray(zp), atol=1e-7)
    uo = _tv_epigraph_oracle(xs, gamma * lam)
    np.testing.assert_allclose(np.asarray(zr), uo, atol=1e-6)


def test_ind_polyhedral_prox_output_is_feasible_under_vmap():
    """g(prox-output) must be 0 (not inf) — the indicator's feasibility
    slack sits above the dual solver's attainable accuracy (regression:
    a ~1.2*tol primal violation used to flicker inf at the boundary)."""
    import proxtpu as pa

    rng = np.random.default_rng(41)
    m, n, c = 14, 9, 5
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    C = rng.standard_normal((c, n))
    lo, hi = -0.25 * np.ones(c), 0.25 * np.ones(c)
    Lf = float(np.linalg.norm(A, 2) ** 2)
    g = IndPolyhedral(jnp.asarray(C), jnp.asarray(lo), jnp.asarray(hi))
    solver = pa.FastForwardBackward(tol=1e-8, maxit=5000)
    bs = jnp.asarray(b + 0.3 * rng.standard_normal((3, m)))
    xs, its = jax.vmap(
        lambda bi: solver.run(
            x0=jnp.zeros(n),
            f=make_least_squares(jnp.asarray(A), bi),
            g=g,
            Lf=Lf,
        )
    )(bs)
    for i in range(3):
        assert float(g(xs[i])) == 0.0
        r = C @ np.asarray(xs[i])
        assert np.max(np.maximum(np.maximum(lo - r, r - hi), 0)) < 1e-8


@pytest.mark.parametrize("cls_args", [
    ("poly",), ("tv",),
])
def test_inner_loop_proxes_f32(cls_args):
    """f32 attainability: the inner-loop proxes floor their tolerances at
    a multiple of eps and stay within ~100*eps_f32 of the f64 answer."""
    rng = np.random.default_rng(43)
    if cls_args[0] == "poly":
        A = rng.standard_normal((5, 8))
        lo = rng.standard_normal(5) - 1.5
        hi = lo + 1.0
        x = rng.standard_normal(8) * 2
        f64 = IndPolyhedral(jnp.asarray(A), jnp.asarray(lo), jnp.asarray(hi))
        z64, _ = f64.prox(jnp.asarray(x), 1.0)
        f32 = IndPolyhedral(
            jnp.asarray(A, jnp.float32),
            jnp.asarray(lo, jnp.float32),
            jnp.asarray(hi, jnp.float32),
        )
        z32, _ = f32.prox(jnp.asarray(x, jnp.float32), 1.0)
    else:
        x = rng.standard_normal(24)
        z64, _ = TotalVariation1D(0.4).prox(jnp.asarray(x), 0.7)
        z32, _ = TotalVariation1D(0.4).prox(
            jnp.asarray(x, jnp.float32), 0.7
        )
    assert z32.dtype == jnp.float32
    assert np.max(np.abs(np.asarray(z32, np.float64)
                         - np.asarray(z64))) < 5e-4


def test_ind_polyhedral_zero_row_sum_constraints():
    """Monotonicity constraints x_{i+1} - x_i >= 0 have zero row sums —
    the power-iteration start must not lie in A^T A's null space
    (regression: an all-ones start collapsed the Lipschitz estimate and
    the prox returned NaN)."""
    n = 4
    A = np.zeros((n - 1, n))
    for i in range(n - 1):
        A[i, i], A[i, i + 1] = -1.0, 1.0
    f = IndPolyhedral(
        jnp.asarray(A), jnp.zeros(n - 1), jnp.full(n - 1, np.inf)
    )
    x = jnp.asarray([3.0, 1.0, 2.0, 0.0])
    z, v = f.prox(x, 1.0)
    z = np.asarray(z)
    assert np.all(np.isfinite(z))
    assert np.all(np.diff(z) >= -1e-7)  # monotone (isotonic regression)
    # oracle: pool-adjacent-violators on [3,1,2,0] -> [1.5,1.5,1.5,1.5]?
    # no: PAV gives [2,2,2,0]->... compute via SLSQP
    r = minimize(
        lambda u: 0.5 * np.sum((u - np.asarray(x)) ** 2),
        np.sort(np.asarray(x)),
        constraints=[{"type": "ineq", "fun": lambda u: np.diff(u)}],
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-14},
    )
    np.testing.assert_allclose(z, r.x, atol=1e-6)


def test_ind_hyperslab_one_sided_call_detects_violation():
    """Regression: one-sided slabs (an infinite bound) made the
    feasibility slack infinite, so __call__ returned 0 everywhere."""
    a = jnp.asarray([1.0, 2.0, -1.0])
    f = IndHyperslab(a, -np.inf, 0.2)
    x_bad = jnp.asarray([5.0, 1.0, 2.0])  # <a,x> = 5 > 0.2
    assert np.isinf(float(f(x_bad)))
    x_ok = jnp.asarray([0.0, 0.0, 0.0])
    assert float(f(x_ok)) == 0.0
    # prox output is feasible and detected as such
    z, _ = f.prox(x_bad, 1.0)
    assert float(f(z)) == 0.0


def test_empty_combinators_rejected():
    from proxtpu.prox import PointwiseMinimum

    with pytest.raises(ValueError):
        Sum(())
    with pytest.raises(ValueError):
        PointwiseMinimum(())
