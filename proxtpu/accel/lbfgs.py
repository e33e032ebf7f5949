"""Limited-memory BFGS as functional fixed-shape state.

Port of ``/root/reference/src/accel/lbfgs.jl``: circular buffers ``s_M/y_M``
of size M, curvature guard ``ys > 0``, initial scaling ``H = ys/yty`` and the
classic two-loop recursion.  The mutable ring buffers become pytrees with a
leading M axis plus traced ``currmem``/``curridx`` counters; the two-loop
recursion is statically unrolled over M (M is small, default 5) with masking,
so the whole operator lives inside a jitted while-loop carry and vmaps over
problem batches.

Like the reference (which supports ``ArrayPartition`` structured vectors,
``test/accel/test_lbfgs.jl:135-166``), iterates may be arbitrary pytrees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..prox.base import proxclass
from ..utils.tree import (
    real_dtype_of,
    tree_map,
    tree_vdot_real,
    tree_where,
)
from .base import QUASI_NEWTON


class LBFGSState(NamedTuple):
    s_M: object  # pytree, leaves (M, *shape)
    y_M: object  # pytree, leaves (M, *shape)
    ys_M: jnp.ndarray  # (M,)
    H: jnp.ndarray  # scalar initial inverse-Hessian scaling
    currmem: jnp.ndarray  # int32
    curridx: jnp.ndarray  # int32


def _slot(tree, idx):
    return tree_map(lambda l: l[idx], tree)


def _set_slot(tree, idx, val):
    return tree_map(lambda buf, v: buf.at[idx].set(v), tree, val)


@proxclass(meta_fields=("mem",))
class LBFGS:
    """L-BFGS direction strategy with memory ``mem`` (reference default
    ``LBFGS(5)``, ``src/algorithms/panoc.jl:51``)."""

    mem: int = 5

    style = QUASI_NEWTON

    def init_state(self, x):
        M = self.mem
        R = real_dtype_of(x)
        return LBFGSState(
            s_M=tree_map(lambda l: jnp.zeros((M,) + l.shape, l.dtype), x),
            y_M=tree_map(lambda l: jnp.zeros((M,) + l.shape, l.dtype), x),
            ys_M=jnp.zeros((M,), R),
            H=jnp.ones((), R),
            currmem=jnp.zeros((), jnp.int32),
            curridx=jnp.zeros((), jnp.int32),
        )

    def reset(self, state):
        return state._replace(
            currmem=jnp.zeros((), jnp.int32),
            curridx=jnp.zeros((), jnp.int32),
            H=jnp.ones_like(state.H),
        )

    def update(self, state, s, y):
        """Push (s, y) if the curvature condition ys > 0 holds
        (``lbfgs.jl:29-49``)."""
        M = self.mem
        ys = tree_vdot_real(s, y)
        accept = ys > 0
        curridx = jnp.where(accept, (state.curridx % M) + 1, state.curridx)
        # reference uses 1-based ring position; store at curridx-1
        slot = curridx - 1
        currmem = jnp.where(accept, jnp.minimum(state.currmem + 1, M), state.currmem)
        yty = tree_vdot_real(y, y)
        H = jnp.where(accept, ys / jnp.where(yty == 0, 1, yty), state.H)
        s_M = tree_where(accept, _set_slot(state.s_M, slot, s), state.s_M)
        y_M = tree_where(accept, _set_slot(state.y_M, slot, y), state.y_M)
        ys_M = jnp.where(accept, state.ys_M.at[slot].set(ys), state.ys_M)
        return LBFGSState(s_M, y_M, ys_M, H, currmem, curridx)

    def apply(self, state, v):
        """d = H v via the two-loop recursion (``lbfgs.jl:62-102``),
        statically unrolled over the memory with masking."""
        M = self.mem
        d = v
        alphas = jnp.zeros((M,), state.ys_M.dtype)
        # loop 1: newest -> oldest
        for i in range(M):
            active = i < state.currmem
            slot = (state.curridx - 1 - i) % M
            ys = state.ys_M[slot]
            s_i = _slot(state.s_M, slot)
            y_i = _slot(state.y_M, slot)
            a = tree_vdot_real(s_i, d) / jnp.where(ys == 0, 1, ys)
            a = jnp.where(active, a, 0)
            alphas = alphas.at[slot].set(a)
            d = tree_map(lambda dl, yl: dl - a * yl, d, y_i)
        d = tree_map(lambda dl: state.H * dl, d)
        # loop 2: oldest -> newest
        for i in range(M):
            active = i < state.currmem
            slot = (state.curridx - state.currmem + i) % M
            ys = state.ys_M[slot]
            s_i = _slot(state.s_M, slot)
            y_i = _slot(state.y_M, slot)
            b = tree_vdot_real(y_i, d) / jnp.where(ys == 0, 1, ys)
            coeff = jnp.where(active, alphas[slot] - b, 0)
            d = tree_map(lambda dl, sl: dl + coeff * sl, d, s_i)
        return d
