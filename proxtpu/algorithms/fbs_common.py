"""Shared machinery for the f(Ax)+g(x) line-search family
(ZeroFPR / PANOC / PANOCplus): operator-aware initialisation and the
direction-strategy dispatch trio (the ``set_next_direction!`` /
``update_direction_state!`` / ``reset_direction_state!`` protocol of the
reference, e.g. ``src/algorithms/panoc.jl:114-136``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..accel.base import NO_ACCELERATION, QUASI_NEWTON
from ..prox.base import prox, value_and_gradient
from ..utils.fb_tools import lower_bound_smoothness_constant
from ..utils.tree import tree_map, tree_neg, tree_sub, tree_where


def forward_backward_init(f, A, g, x0, gamma, alpha):
    """Common cold start: one matvec+grad, gamma default ``alpha / L_est``
    when unset (``panoc.jl:91-93``), one prox."""
    x = x0
    Ax = A.matvec(x)
    f_Ax, grad_f_Ax = value_and_gradient(f, Ax)
    if gamma is None:
        gamma = alpha / lower_bound_smoothness_constant(f, A, x, grad_f_Ax)
    At_grad_f_Ax = A.rmatvec(grad_f_Ax)
    y = tree_map(lambda xl, gl: xl - gamma * gl, x, At_grad_f_Ax)
    z, g_z = prox(g, y, gamma)
    res = tree_sub(x, z)
    return x, Ax, f_Ax, grad_f_Ax, At_grad_f_Ax, jnp.asarray(gamma), y, z, g_z, res


def next_direction(directions, dstate, v_qn, v_fallback):
    """QuasiNewton: d = -(H @ v_qn); NoAcceleration: d = -v_fallback."""
    if directions.style == QUASI_NEWTON:
        return tree_neg(directions.apply(dstate, v_qn))
    if directions.style == NO_ACCELERATION:
        return tree_neg(v_fallback)
    raise ValueError(
        f"direction style {directions.style!r} not supported by this algorithm"
    )


def update_direction(directions, dstate, s, y):
    if directions.style == QUASI_NEWTON:
        return directions.update(dstate, s, y)
    return dstate


def reset_direction_if(directions, dstate, pred, x):
    """Reset the metric when gamma changed during backtracking
    (``panoc.jl:160-162``) — a traced predicate, so reset via select."""
    if directions.style == QUASI_NEWTON:
        return tree_where(pred, directions.reset(dstate), dstate)
    return dstate
