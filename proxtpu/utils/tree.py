"""Pytree-generic vector-space operations.

The reference library (ProximalAlgorithms.jl) is generic over any
``AbstractArray`` container, including structured vectors such as
``RecursiveArrayTools.ArrayPartition`` (exercised at
``test/accel/test_lbfgs.jl:135-166``).  The JAX-native equivalent of that
genericity is the pytree: every algorithm in this package is written against
the helpers below so that iterates, residuals and quasi-Newton buffers can be
arbitrary pytrees of arrays (a single ``jnp.ndarray`` being the common case).

Inner products follow the reference's ``real(dot(a, b))`` convention
(``src/utilities/fb_tools.jl:4``, ``src/accel/lbfgs.jl:33``): the first
argument is conjugated and only the real part is kept, which is the correct
Euclidean inner product for problems over C^n viewed as R^{2n}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_map(fn, *trees):
    return jax.tree.map(fn, *trees)


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(alpha, a):
    """alpha * a with alpha a scalar (traced or concrete)."""
    return jax.tree.map(lambda l: alpha * l, a)


def tree_axpy(alpha, x, y):
    """y + alpha * x."""
    return jax.tree.map(lambda xl, yl: yl + alpha * xl, x, y)


def tree_lincomb(alpha, a, beta, b):
    """alpha*a + beta*b."""
    return jax.tree.map(lambda al, bl: alpha * al + beta * bl, a, b)


def tree_neg(a):
    return jax.tree.map(jnp.negative, a)


def tree_conj(a):
    return jax.tree.map(jnp.conj, a)


def tree_zeros_like(a):
    return jax.tree.map(jnp.zeros_like, a)


def tree_vdot(a, b):
    """<a, b> with the first argument conjugated (like LinearAlgebra.dot)."""
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves[1:], leaves[0])


def tree_vdot_real(a, b):
    """real(<a, b>) — the inner product used throughout the reference."""
    return jnp.real(tree_vdot(a, b))


def tree_dot(a, b):
    """<a, b> without conjugation (used by Broyden's complex updates)."""
    leaves = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.sum(x * y), a, b))
    return sum(leaves[1:], leaves[0])


def tree_norm_sq(a):
    return tree_vdot_real(a, a)


def tree_norm(a):
    return jnp.sqrt(tree_norm_sq(a))


def tree_inf_norm(a):
    """max_i |a_i| over all leaves (norm(x, Inf) in the reference)."""
    leaves = jax.tree.leaves(jax.tree.map(lambda x: jnp.max(jnp.abs(x)), a))
    out = leaves[0]
    for l in leaves[1:]:
        out = jnp.maximum(out, l)
    return out


def tree_where(pred, a, b):
    """Elementwise-broadcast select between whole pytrees (scalar pred)."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_size(a):
    return sum(l.size for l in jax.tree.leaves(a))


def tree_add_scalar(a, c):
    """a .+ c (broadcast add of scalar to every leaf)."""
    return jax.tree.map(lambda l: l + c, a)


def real_dtype_of(a):
    """The real floating dtype underlying a pytree's leaves."""
    leaf = jax.tree.leaves(a)[0]
    return jnp.real(jnp.zeros((), leaf.dtype)).dtype


def eps_of(a):
    """Machine epsilon of the real dtype underlying pytree ``a``."""
    return jnp.finfo(real_dtype_of(a)).eps
