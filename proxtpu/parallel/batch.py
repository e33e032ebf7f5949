"""Scenario batching: solve thousands of problem instances per chip with vmap.

The reference solves one problem per call (SURVEY.md §2.6 — it has no
parallelism of any kind).  On TPU the natural "data parallelism" for this
domain is *scenario batching*: a stacked pytree of problem instances (same
shapes, different data) advanced in lockstep by one vmapped step function, so
every per-problem matvec becomes one big batched MXU matmul.

Per-problem early exit becomes a convergence mask in the while-loop carry:
converged lanes freeze (their state stops changing), the loop runs until all
lanes converge or ``maxit``, and per-lane iteration counts are returned —
exactly equivalent to running each problem alone (tested in
``tests/test_batch.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def stack_iterations(iterations):
    """Stack identically-structured iteration objects into one batched
    iteration (leaves gain a leading batch axis; static fields must agree)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *iterations)


def _freeze(done, old, new):
    """Per-lane select: lanes with done=True keep their old state."""
    def sel(o, n):
        mask = done.reshape(done.shape + (1,) * (n.ndim - done.ndim))
        return jnp.where(mask, o, n)

    return jax.tree.map(sel, old, new)


@partial(jax.jit, static_argnames=("stop", "solution"))
def batched_run_loop(iteration, maxit, tol, stop=None, solution=None):
    """Run a batched iteration until every lane converges (or maxit).

    ``iteration`` is a stacked pytree (leading batch axis on every leaf —
    broadcast shared data with ``jnp.broadcast_to`` or use
    :func:`stack_iterations`).  Returns ``(solutions, iters, done)`` where
    ``iters[i]`` is the iteration count at which lane ``i`` converged
    (``maxit`` cap applies), matching the single-problem driver's count.
    """
    if stop is None:
        stop = lambda it, tol, s: it.default_stopping_criterion(tol, s)
    if solution is None:
        solution = lambda it, s: it.default_solution(s)

    vinit = jax.vmap(lambda it: it.init())
    vstep = jax.vmap(lambda it, s: it.step(s))
    vstop = jax.vmap(lambda it, s: stop(it, tol, s))

    state = vinit(iteration)
    done0 = vstop(iteration, state)
    B = done0.shape[0]
    iters0 = jnp.ones((B,), jnp.int32)

    def cond(carry):
        k, s, done, iters = carry
        return (k < maxit) & jnp.logical_not(jnp.all(done))

    def body(carry):
        k, s, done, iters = carry
        s_new = vstep(iteration, s)
        s = _freeze(done, s, s_new)
        k = k + 1
        newly_done = vstop(iteration, s)
        iters = jnp.where(done, iters, k)
        return (k, s, done | newly_done, iters)

    k, state, done, iters = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), state, done0, iters0)
    )
    iters = jnp.where(done, iters, k)
    return jax.vmap(lambda it, s: solution(it, s))(iteration, state), iters, done


class BatchedAlgorithm:
    """Batched counterpart of :class:`~proxtpu.algorithms.core.IterativeAlgorithm`.

    Construct from a solver factory's iteration maker, call with *stacked*
    problem kwargs (leading batch axis on every array):

        solver = BatchedAlgorithm(make_fast_forward_backward_iteration,
                                  maxit=1000, tol=1e-6)
        xs, iters, done = solver(x0=X0, f=batched_f, g=batched_g, Lf=Lfs)

    Non-batched kwargs are broadcast by the factory itself when scalar.
    """

    def __init__(self, iteration_factory, *, maxit, tol, stop=None,
                 solution=None, **kwargs):
        self.iteration_factory = iteration_factory
        self.maxit = maxit
        self.tol = tol
        self.stop = stop
        self.solution = solution
        self.kwargs = kwargs

    def __call__(self, **kwargs):
        merged = {**self.kwargs, **kwargs}
        iteration = self.iteration_factory(**merged)
        return batched_run_loop(
            iteration, self.maxit, self.tol, stop=self.stop,
            solution=self.solution,
        )


def batch_problems(factory, problem_list):
    """Build a batched iteration from a list of per-problem kwargs dicts
    (each must produce an identically-structured iteration)."""
    return stack_iterations([factory(**kw) for kw in problem_list])
