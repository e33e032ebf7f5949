"""Full-matrix Broyden quasi-Newton updates with Powell regularization.

Port of ``/root/reference/src/accel/broyden.jl``: dense n×n inverse Jacobian
``H`` (initialised to I), updated as

    H += (s - H y) / <s, (1/theta - 1) s + H y> * (s^H H)

with the Powell-type ``theta_bar = 0.2`` damping against singular updates
(``broyden.jl:21-31``).  State is a single dense matrix — fixed shape, so it
jits and vmaps; like the reference, this strategy is meant for moderate n.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..prox.base import proxclass
from .base import QUASI_NEWTON
from .flatten import flatten_like, unflatten_like


class BroydenState(NamedTuple):
    H: jnp.ndarray  # (n, n)


def _sign(x):
    # _sign(0) = 1 (``broyden.jl:19``)
    s = jnp.sign(x)
    return jnp.where(x == 0, jnp.ones_like(s), s)


@proxclass(meta_fields=())
class Broyden:
    theta_bar: object = 0.2

    style = QUASI_NEWTON

    def init_state(self, x):
        flat, _ = flatten_like(x)
        n = flat.shape[0]
        return BroydenState(H=jnp.eye(n, dtype=flat.dtype))

    def reset(self, state):
        return BroydenState(H=jnp.eye(state.H.shape[0], dtype=state.H.dtype))

    def update(self, state, s, y):
        s_flat, _ = flatten_like(s)
        y_flat, _ = flatten_like(y)
        H = state.H
        Hy = H @ y_flat
        sH = s_flat.conj() @ H  # s' H (row vector)
        nrm2 = jnp.real(jnp.vdot(s_flat, s_flat))
        delta = jnp.vdot(Hy, s_flat) / jnp.where(nrm2 == 0, 1, nrm2)
        theta = jnp.where(
            jnp.abs(delta) >= self.theta_bar,
            jnp.ones_like(delta),
            (1 - _sign(delta) * self.theta_bar) / (1 - delta),
        )
        denom = jnp.vdot(s_flat, (1 / theta - 1) * s_flat + Hy)
        H = H + jnp.outer((s_flat - Hy) / denom, sH)
        return BroydenState(H=H)

    def apply(self, state, v):
        v_flat, spec = flatten_like(v)
        return unflatten_like(state.H @ v_flat, spec)
