"""Flatten/unflatten pytrees to a single vector (for dense-matrix strategies).

Anderson and Broyden maintain dense n-dimensional buffers; like the reference
(which restricts Broyden to ``AbstractVector``, ``src/accel/broyden.jl:54``)
they operate on the raveled iterate.  This is a trace-time-static raveling:
shapes come from the pytree structure, so it is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flatten_like(x):
    leaves, treedef = jax.tree.flatten(x)
    flat = jnp.concatenate([l.reshape(-1) for l in leaves])
    spec = (treedef, [l.shape for l in leaves], [l.size for l in leaves])
    return flat, spec


def unflatten_like(flat, spec):
    treedef, shapes, sizes = spec
    parts, start = [], 0
    for shape, size in zip(shapes, sizes):
        parts.append(jax.lax.dynamic_slice_in_dim(flat, start, size).reshape(shape))
        start += size
    return jax.tree.unflatten(treedef, parts)
