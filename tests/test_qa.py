"""Static QA — the Aqua.test_all analogue (``test/runtests.jl:18-20``).

Checks the public surface is importable and well-formed: exports resolve,
prox functions round-trip as pytrees, iteration dataclasses are frozen, and
strategy objects are hashable (required for the static half of pytrees).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa


def test_version_matches_pyproject():
    """__version__ and pyproject.toml must agree (they drifted once)."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml")) as fh:
        m = re.search(r'^version = "([^"]+)"', fh.read(), re.M)
    assert m and m.group(1) == pa.__version__


def test_all_algorithm_exports_resolve():
    for name in [
        "ForwardBackward", "FastForwardBackward", "ProximalGradient",
        "FastProximalGradient", "ZeroFPR", "PANOC", "PANOCplus",
        "DouglasRachford", "DRLS", "DavisYin", "LiLin", "SFISTA", "AFBA",
        "VuCondat", "ChambollePock",
    ]:
        solver = getattr(pa, name)(tol=1e-6)
        assert callable(solver)


def test_all_accel_exports_resolve():
    for obj in [
        pa.LBFGS(5), pa.AndersonAcceleration(5), pa.Broyden(),
        pa.NoAcceleration(), pa.NesterovExtrapolation(),
        pa.FixedNesterovSequence(), pa.SimpleNesterovSequence(),
        pa.ConstantNesterovSequence(1.0, 0.1), pa.AdaptiveNesterovSequence(0.0),
    ]:
        hash(obj)  # strategies must be hashable (static pytree halves)


def test_prox_functions_pytree_roundtrip():
    from proxtpu.prox import (
        ElasticNet, IndBox, IndPoint, LeastSquaresLoss, Linear, LogisticLoss,
        NormL1, NormL2, NormL21, Quadratic, SqrDistance, SqrNormL2, Translate,
    )

    x = jnp.arange(4.0)
    A = jnp.eye(4)
    fns = [
        NormL1(0.5), NormL2(0.5), NormL21(0.5), SqrNormL2(2.0),
        ElasticNet(1.0, 2.0), Linear(x), IndBox(-1.0, 1.0), IndPoint(x),
        LeastSquaresLoss(A, x), Quadratic(A, x), LogisticLoss(),
        SqrDistance(x), Translate(NormL1(1.0), x),
    ]
    from proxtpu.prox import (
        HuberLoss, IndBallL1, IndBallL2, IndSimplex, SumPositive,
    )

    fns += [
        HuberLoss(1.0, 2.0), IndSimplex(1.0), IndBallL1(1.0), IndBallL2(1.0),
        SumPositive(),
    ]
    from proxtpu.prox import (
        HingeLoss, IndBallLinf, IndHalfspace, IndPSD, NormL0,
    )

    fns += [
        NormL0(0.5), HingeLoss(jnp.sign(x - 1.5), 1.0), IndBallLinf(1.0),
        IndHalfspace(x, 0.5), IndPSD(),
    ]
    for f in fns:
        leaves, treedef = jax.tree.flatten(f)
        f2 = jax.tree.unflatten(treedef, leaves)
        assert type(f2) is type(f)


def test_iterations_are_frozen():
    it = pa.algorithms.make_forward_backward_iteration(
        x0=jnp.zeros(3), g=pa.Zero(), gamma=1.0
    )
    with pytest.raises(dataclasses.FrozenInstanceError):
        it.gamma = 2.0


def test_factories_reject_unknown_kwargs():
    with pytest.raises(TypeError):
        pa.algorithms.make_forward_backward_iteration(
            x0=jnp.zeros(3), gamma=1.0, not_a_kwarg=1
        )


def test_zero_defaults_solve_trivially():
    # with all-default Zero terms, any x0 is a fixed point immediately
    x, it = pa.ForwardBackward(tol=1e-8)(x0=jnp.ones(4), gamma=1.0)
    np.testing.assert_allclose(np.asarray(x), np.ones(4))
    assert it == 1
