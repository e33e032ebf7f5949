"""Iteration-tool combinators and the oracle-counting wrapper.

Mirrors ``test/utilities/test_iteration_tools.jl`` (halt/tee/sample/
stopwatch/loop semantics) and the ``Counting`` wrapper of
``docs/src/guide/custom_objectives.jl:99-137``.
"""

import jax.numpy as jnp
import numpy as np

import proxtpu as pa
from proxtpu.algorithms.core import states
from proxtpu.prox import NormL1, make_least_squares
from proxtpu.utils.iteration_tools import (
    Counting,
    halt,
    loop,
    sample,
    stopwatch,
    tee,
)

from problems import LASSO_A, LASSO_B, as_dtype


def test_halt_includes_triggering_item():
    out = list(halt(iter(range(10)), lambda x: x >= 3))
    assert out == [0, 1, 2, 3]


def test_tee_side_effects_every_item():
    seen = []
    out = list(tee(iter(range(4)), seen.append))
    assert out == [0, 1, 2, 3]
    assert seen == out


def test_sample_keeps_every_kth():
    assert list(sample(iter(range(1, 11)), 3)) == [3, 6, 9]


def test_stopwatch_monotone():
    ts = [t for t, _ in stopwatch(iter(range(5)))]
    assert all(b >= a for a, b in zip(ts, ts[1:]))
    assert all(t >= 0 for t in ts)


def test_loop_returns_last():
    assert loop(iter(range(7))) == 6
    assert loop(iter([])) is None


def test_counting_through_solver_states():
    A = as_dtype(LASSO_A, jnp.float64)
    b = as_dtype(LASSO_B, jnp.float64)
    lam = 0.1 * float(jnp.max(jnp.abs(A.T @ b)))
    Lf = float(np.linalg.norm(LASSO_A, 2) ** 2)

    cf = Counting(make_least_squares(A, b))
    cg = Counting(NormL1(lam))
    solver = pa.ForwardBackward(tol=1e-6)
    iteration = solver.make_iteration(
        x0=jnp.zeros(5, jnp.float64), f=cf, g=cg, Lf=Lf
    )
    # under jit, counters tick once per traced step: init + step = 2 each
    loop(states(iteration, max_states=10))
    assert cf.gradient_count == 2
    assert cg.prox_count == 2
    cf.reset()
    assert cf.gradient_count == 0


def test_counting_eager_counts_every_call():
    cg = Counting(NormL1(0.5))
    x = jnp.arange(4.0)
    for _ in range(5):
        cg.prox(x, 1.0)
    assert cg.prox_count == 5
    # the wrapped function's internal self-evaluation doesn't tick eval_count
    assert cg.eval_count == 0
    cg(x)
    assert cg.eval_count == 1
