"""Generic solver driver: jitted while-loop over pure init/step iterations.

TPU-native counterpart of ``IterativeAlgorithm``
(``/root/reference/src/ProximalAlgorithms.jl:58-123``).  The reference's
``for (k, state) in enumerate(iter)`` hot loop becomes a single
``lax.while_loop`` compiled once per problem *shape*; the state is a pytree
carry, stopping criteria are traced predicates, and verbose display goes
through ``jax.debug.print`` so it costs nothing when off.

The two-stage UX is preserved exactly: options at construction
(``solver = ForwardBackward(tol=1e-4)``), problem at call
(``x, it = solver(x0=x0, f=f, g=g, Lf=Lf)``), with call-site kwargs
overriding construction kwargs (``ProximalAlgorithms.jl:114-115``).

Iteration objects are frozen pytree dataclasses: array-valued fields (the
problem data) are traced leaves, booleans/strategies are static.  Each
iteration class provides:

* ``init() -> state`` and ``step(state) -> state`` (pure);
* ``default_stopping_criterion(tol, state)``, ``default_solution(state)``,
  ``default_display(k, state)``.

Because ``init``/``step`` are pure, power users can drive them manually (the
iterator-only usage of ``docs/src/guide/getting_started.jl:136-152``) via
:func:`states`, and whole solves batch with ``vmap`` (see
:mod:`proxtpu.parallel.batch`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _default_stop(iteration, tol, state):
    return iteration.default_stopping_criterion(tol, state)


def _default_solution(iteration, state):
    return iteration.default_solution(state)


def _default_display(k, iteration, state):
    iteration.default_display(k, state)


@partial(
    jax.jit,
    static_argnames=("stop", "solution", "verbose", "freq", "display"),
)
def run_loop(iteration, maxit, tol, stop, solution, verbose, freq, display,
             initial_state=None, k0=1):
    """Run an iteration to convergence; returns (solution, iteration_count).

    Matches the reference loop semantics: the initial state counts as
    iteration 1, and the loop exits as soon as ``k >= maxit`` or the stopping
    criterion holds at state k.

    ``initial_state`` resumes from a previously captured state pytree
    (checkpoint/resume — the reference has none, SURVEY.md §5, but its
    all-state-in-one-struct design makes it natural; here the state is a
    pytree, so it round-trips through orbax/pickle for free).  ``k0`` is the
    iteration number of ``initial_state`` (the count a previous segment
    returned): the counter continues from there, so ``maxit`` bounds the
    *overall* solve and the returned count is the total across segments —
    not per-segment.
    """
    state = iteration.init() if initial_state is None else initial_state

    def cond(carry):
        k, s = carry
        return (k < maxit) & jnp.logical_not(stop(iteration, tol, s))

    def body(carry):
        k, s = carry
        s = iteration.step(s)
        k = k + 1
        if verbose:
            jax.lax.cond(
                k % freq == 0,
                lambda: display(k, iteration, s),
                lambda: None,
            )
        return (k, s)

    k, state = jax.lax.while_loop(
        cond, body, (jnp.asarray(k0, jnp.int32), state)
    )
    if verbose:
        display(k, iteration, state)
    return solution(iteration, state), k


class IterativeAlgorithm:
    """Partial application of an iteration type plus run options.

    ``IterativeAlgorithm(IterCls, maxit=..., tol=..., **iter_kwargs)`` — call
    the result with the remaining problem kwargs to solve.
    """

    def __init__(
        self,
        iteration_factory,
        *,
        maxit,
        tol,
        stop=None,
        solution=None,
        verbose=False,
        freq=100,
        display=None,
        **kwargs,
    ):
        self.iteration_factory = iteration_factory
        self.maxit = maxit
        self.tol = tol
        self.stop = stop or _default_stop
        self.solution = solution or _default_solution
        self.verbose = verbose
        self.freq = freq
        self.display = display or _default_display
        self.kwargs = kwargs

    def make_iteration(self, **kwargs):
        merged = {**self.kwargs, **kwargs}
        return self.iteration_factory(**merged)

    def run(self, resume_from=None, resume_iters=None, **kwargs):
        """Jittable run: returns (solution, iteration count) as arrays.

        ``resume_from`` continues from a captured state pytree (obtain one
        via :func:`states`, or checkpoint the carry with orbax/pickle);
        ``resume_iters`` is the iteration count of that state (e.g. the
        count the previous segment returned) so the counter and the
        ``maxit`` budget span the whole solve, not just this segment."""
        iteration = self.make_iteration(**kwargs)
        return run_loop(
            iteration,
            self.maxit,
            self.tol,
            self.stop,
            self.solution,
            self.verbose,
            self.freq,
            self.display,
            initial_state=resume_from,
            k0=1 if resume_iters is None else resume_iters,
        )

    def __call__(self, resume_from=None, resume_iters=None, **kwargs):
        sol, k = self.run(resume_from=resume_from, resume_iters=resume_iters,
                          **kwargs)
        return sol, int(k)


def states(iteration, max_states=None):
    """Yield successive states eagerly (the power-user iterator path,
    cf. ``docs/src/guide/getting_started.jl:136-152``).

    Each ``step`` is jit-compiled once; states are immutable pytrees, so the
    reference's "don't mutate / don't collect" caveat vanishes.
    """
    init = jax.jit(lambda it: it.init())
    step = jax.jit(lambda it, s: it.step(s))
    state = init(iteration)
    k = 0
    while True:
        yield state
        k += 1
        if max_states is not None and k >= max_states:
            return
        state = step(iteration, state)
