"""Solver-state checkpointing.

The while-loop carry of every algorithm is a plain pytree of arrays
(SURVEY.md §5 — the reference keeps all state in one struct but has no
persistence; here it is free).  Two backends:

* :func:`save_state` / :func:`load_state` — orbax-checkpoint when available
  (async-capable, sharded-array aware: a state sharded over a mesh is saved
  and restored with its shardings), NumPy ``.npz``-style pickle fallback
  otherwise.

Typical use with the driver::

    snapshot = None
    for s in states(iteration, max_states=1000):
        snapshot = s
    save_state("/ckpt/lasso-run", snapshot)
    ...
    s = load_state("/ckpt/lasso-run", like=iteration.init())
    x, it = solver(resume_from=s, **problem)
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_state(path, state):
    """Persist a solver-state pytree to ``path`` (a directory for orbax, a
    file for the pickle fallback)."""
    ocp = _orbax()
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        return path
    with open(path, "wb") as fh:
        pickle.dump(jax.tree.map(np.asarray, state), fh)
    return path


def load_state(path, like=None):
    """Restore a solver-state pytree.

    ``like`` (an example state, e.g. ``iteration.init()``) restores exact
    structure/dtypes/shardings; without it, orbax returns its raw restored
    tree and the fallback returns numpy leaves converted to jax arrays.
    """
    ocp = _orbax()
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        if like is not None:
            def restore_args(l):
                sharding = getattr(l, "sharding", None)
                if sharding is not None and hasattr(l, "dtype"):
                    return ocp.type_handlers.ArrayRestoreArgs(
                        sharding=sharding, dtype=l.dtype
                    )
                return ocp.type_handlers.RestoreArgs()

            restored = ckptr.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(
                    jax.tree.map(restore_args, like)
                ),
            )
            return jax.tree.unflatten(
                jax.tree.structure(like), jax.tree.leaves(restored)
            )
        return ckptr.restore(os.path.abspath(path))
    import jax.numpy as jnp

    with open(path, "rb") as fh:
        raw = pickle.load(fh)
    tree = jax.tree.map(jnp.asarray, raw)
    if like is not None:
        return jax.tree.unflatten(
            jax.tree.structure(like), jax.tree.leaves(tree)
        )
    return tree
