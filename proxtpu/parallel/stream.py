"""Pipelined dispatch of batched solves (the streaming execution model).

The round-5 per-call decomposition of the flagship batched solve
(``benchmarks/streaming_probe.py`` ->
``benchmarks/results_streaming.jsonl``; BASELINE.md "Streaming headline
protocol") found the wall on a tunnel-attached chip is dominated by
per-call host overhead (31.2 ms dispatch + 14.2 ms solution-transfer
fence vs 107 us/iteration of device compute).  JAX dispatch is
asynchronous, so a producer that keeps ``depth`` solves in flight
overlaps one call's host overhead with another's device compute —
committed steady-state record: 3389 p/s fenced-each -> 6867 p/s at
depth 2, identical solutions.

:func:`stream_solve` packages that pattern: it drains an iterable of
problem payloads through a solve callable, keeping up to ``depth`` calls
in flight and yielding results IN ORDER once fenced.

Fencing: ``jax.block_until_ready`` does not block on the axon tunnel
backend (BASELINE.md measurement notes), so completion is proven by a
host transfer.  XLA executables complete atomically — every output
buffer of a call is defined at the same completion event — so
transferring the SMALLEST output leaf (for the batched solvers: the
256-byte per-lane done mask) is a complete fence, and the big
solution arrays stay on device until the consumer touches them.

The reference has no counterpart (its benchmark harness is synchronous,
``/root/reference/benchmark/runbenchmarks.jl:43-76``); this is
TPU-runtime plumbing in the same family as ``check_every`` blocking.
"""

from __future__ import annotations

from collections import deque

import jax
import numpy as np


def _smallest_leaf_fence(out):
    """Block until ``out`` is materialized by host-transferring its
    smallest DEVICE leaf (complete: all outputs of an XLA executable are
    defined by the same completion event).  Host-side leaves (numpy
    arrays, Python scalars) and zero-size arrays are excluded — fencing
    on one would return instantly without any device sync and silently
    void the depth backpressure."""
    leaves = [
        l for l in jax.tree.leaves(out)
        if isinstance(l, jax.Array) and l.size > 0
    ]
    if not leaves:
        return
    np.asarray(min(leaves, key=lambda l: l.nbytes))


def stream_solve(solve, problems, depth=2, fence=_smallest_leaf_fence):
    """Yield ``solve(p)`` for each payload ``p`` in ``problems``, in
    order, with up to ``depth`` additional solves dispatched ahead.

    ``solve`` must be an async-dispatching device function (a jitted
    solver / kernel path); its output pytree is yielded as-is (device
    arrays — transfer only what you consume).  ``depth=2`` is the
    measured sweet spot on the tunnel (committed steady-state record:
    5953 / 6867 / 6791 / 6594 p/s at depth 1/2/4/8,
    ``results_streaming.jsonl`` — beyond 2 buys nothing); ``depth=0``
    degrades to fully synchronous execution.

    ``fence(out)`` blocks until ``out``'s computation finished; the
    default transfers the smallest device-array output leaf.  Pass a
    custom fence to also post-process while the pipeline drains.

    The solve callable must return at least one non-empty ``jax.Array``
    leaf for the default fence to have anything to block on; outputs that
    are entirely host-side make the fence (and the backpressure) a no-op.
    """
    if depth < 0:
        raise ValueError(f"depth must be >= 0, got {depth}")

    def _gen():
        q = deque()
        for p in problems:
            q.append(solve(p))
            if len(q) > depth:
                out = q.popleft()
                fence(out)
                yield out
        while q:
            out = q.popleft()
            fence(out)
            yield out

    # validate at call time, not at first next() (generator semantics
    # would otherwise defer the ValueError far from the call site)
    return _gen()
