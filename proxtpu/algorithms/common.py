"""Shared helpers for iteration factories: dtype-preserving scalar casting and
derived-default resolution (the ``Base.@kwdef`` derived defaults of the
reference, e.g. ``gamma = Lf === nothing ? nothing : 1/Lf``,
``adaptive = gamma === nothing`` at ``forward_backward.jl:43-44``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.tree import real_dtype_of


def astree(x0):
    return jax.tree.map(jnp.asarray, x0)


def rscalar(v, R):
    """Cast a scalar hyperparameter to the iterate's real dtype (keeps the
    reference's strict eltype-preservation contract)."""
    if v is None:
        return None
    return jnp.asarray(v, R)


def resolve_gamma(gamma, Lf, scale=1.0):
    """gamma = scale / Lf when only Lf is given; None when neither is."""
    if gamma is not None:
        return gamma
    if Lf is not None:
        return scale / jnp.asarray(Lf)
    return None


def real_dtype(x0):
    return real_dtype_of(x0)
