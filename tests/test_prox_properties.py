"""Library-wide prox property sweep.

For every CONVEX proxable function f, prox_gamma(f) must be

* firmly nonexpansive:  ||Px - Py||^2 <= <Px - Py, x - y>  for all x, y;
* variationally optimal: f(u) + ||u-x||^2/(2 gamma) >= f(Px) +
  ||Px-x||^2/(2 gamma) for any u (spot-checked with random perturbations,
  skipping infeasible u for indicators);
* value-consistent: the returned f_z equals f(prox(x)) whenever both are
  finite (indicators may return 0 while f(z) is inf by one ULP of
  feasibility — the prox output is feasible by construction, so we check
  the returned value is 0 there).

These are THE defining properties of a prox operator — any scaling or
sign bug in a prox formula breaks one of them.  Nonconvex members
(NormL0) are excluded from firm nonexpansiveness (it does not hold) but
still checked for variational optimality among perturbations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from proxtpu.prox import (
    CubeNormL2,
    ElasticNet,
    IndBinary,
    IndExpDual,
    IndExpPrimal,
    IndFree,
    IndHyperslab,
    IndPoint,
    IndPolyhedral,
    NegEntropy,
    PointwiseMinimum,
    PrecomposeDiagonal,
    TotalVariation1D,
    Regularize,
    Tilt,
    make_least_squares,
    HingeLoss,
    HuberLoss,
    IndBallL1,
    IndBallL2,
    IndBallLinf,
    IndBox,
    IndHalfspace,
    IndSimplex,
    Linear,
    NormL0,
    NormL1,
    NormL2,
    NormL21,
    NormL1plusL2,
    NormLinf,
    DistL2,
    IndBallL0,
    IndCappedSimplex,
    IndSOC,
    SqrHingeLoss,
    SumLargest,
    SqrDistance,
    SqrNormL2,
    SumPositive,
    Translate,
    is_convex,
)

N = 12
GAMMAS = [0.3, 1.7]


def _functions(rng):
    a = jnp.asarray(rng.standard_normal(N))
    A = jnp.asarray(rng.standard_normal((8, N)) / np.sqrt(8))
    b8 = jnp.asarray(rng.standard_normal(8))
    y = jnp.asarray(np.sign(rng.standard_normal(N)))
    return [
        NormL1(0.4),
        NormL2(0.7),
        NormLinf(0.8),
        NormL21(0.5, axis=0),
        SqrNormL2(1.3),
        ElasticNet(0.5, 1.1),
        Linear(a),
        SqrDistance(a),
        make_least_squares(A, b8, 0.8),
        HuberLoss(1.0, 2.0),
        HingeLoss(y, 1.5),
        SumPositive(),
        Translate(NormL1(0.6), a * 0.1),
        IndBox(-0.5, 0.8),
        IndBallL2(0.9),
        IndBallL1(1.2),
        IndBallLinf(0.6),
        IndSimplex(1.0),
        IndHalfspace(a, 0.2),
        NormL0(0.3),  # nonconvex: optimality-among-perturbations only
        NormL1plusL2(0.3, 0.5),
        IndSOC(),
        DistL2(IndBallL2(0.7), 1.3),
        SqrHingeLoss(y, 0.8),
        IndBallL0(4),  # nonconvex: optimality-among-perturbations only
        IndCappedSimplex(3),
        SumLargest(2, 0.6),
        CubeNormL2(0.5),
        NormL1(jnp.abs(a) * 0.3),  # weighted l1 (array lam)
        Tilt(NormL1(0.4), a * 0.3, 0.1),
        Regularize(NormL1(0.3), 0.8, a * 0.2),
        IndExpPrimal(),  # trailing dim 3: the (12,) iterate splits into 4 cones
        IndExpDual(),
        NegEntropy(0.7),  # domain x >= 0: infeasible perturbations skipped
        IndBinary(-0.5, 1.0),  # nonconvex: optimality-among-perturbations only
        PointwiseMinimum(  # nonconvex (union of two points)
            (IndPoint(a * 0.1), IndPoint(-a * 0.1))
        ),
        IndFree(),
        IndHyperslab(a, -0.4, 0.3),
        IndPolyhedral(A, b8 - 1.0, b8 + 0.5),
        TotalVariation1D(0.3),
        PrecomposeDiagonal(
            NormL1(0.4), jnp.where(jnp.abs(a) < 0.3, 0.5, a), 0.1
        ),
    ]


@pytest.mark.parametrize("gamma", GAMMAS)
def test_prox_properties_sweep(gamma):
    rng = np.random.default_rng(42)
    for f in _functions(rng):
        name = type(f).__name__
        x = jnp.asarray(rng.standard_normal(N))
        yv = jnp.asarray(rng.standard_normal(N))
        if isinstance(f, NormL21):
            x = x.reshape(3, 4)
            yv = yv.reshape(3, 4)
        Px, f_Px = f.prox(x, gamma)
        Py, _ = f.prox(yv, gamma)

        # returned value consistency
        fz = float(f(Px))
        if np.isfinite(fz):
            np.testing.assert_allclose(
                float(f_Px), fz, rtol=1e-5, atol=1e-5,
                err_msg=f"{name}: prox returned value != f(z)",
            )
        else:
            # feasibility roundoff on an indicator: returned value must be 0
            assert float(f_Px) == 0.0, name

        # firm nonexpansiveness (convex only)
        if is_convex(f):
            d = Px - Py
            lhs = float(jnp.sum(jnp.abs(d) ** 2))
            rhs = float(jnp.sum((d * jnp.conj(x - yv)).real))
            assert lhs <= rhs + 1e-6 * (1 + abs(rhs)), (
                f"{name}: not firmly nonexpansive ({lhs} > {rhs})"
            )

        # variational optimality among random perturbations
        base = fz if np.isfinite(fz) else 0.0
        base += float(jnp.sum(jnp.abs(Px - x) ** 2)) / (2 * gamma)
        for scale in (1e-3, 1e-1):
            for _ in range(10):
                u = Px + jnp.asarray(
                    scale * rng.standard_normal(Px.shape)
                )
                fu = float(f(u))
                if not np.isfinite(fu):
                    continue  # infeasible perturbation of an indicator
                val = fu + float(jnp.sum(jnp.abs(u - x) ** 2)) / (2 * gamma)
                assert val >= base - 1e-5 * (1 + abs(base)), (
                    f"{name}: perturbation beats prox ({val} < {base})"
                )
