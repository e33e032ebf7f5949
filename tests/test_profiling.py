"""Profiling hooks (SURVEY.md §5): the XLA-level additions must actually
produce artifacts — a trace directory TensorBoard can open and a cost
analysis with real FLOP counts — not just run without error."""

import os

import jax.numpy as jnp
import numpy as np

from proxtpu.utils.profiling import compiled_stats, trace


def _solve(x0, A, b, Lf):
    import proxtpu as pa
    from proxtpu.prox import NormL1, make_least_squares

    return pa.ForwardBackward(tol=1e-6, maxit=200).run(
        x0=x0, f=make_least_squares(A, b), g=NormL1(0.1), Lf=Lf
    )


def test_compiled_stats_reports_flops():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((16, 8)))
    b = jnp.asarray(rng.standard_normal(16))
    Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    out = compiled_stats(_solve, jnp.zeros(8), A, b, Lf)
    cost = out["cost_analysis"]
    assert cost.get("flops", 0) > 0
    # XLA's HloCostAnalysis counts the while-loop BODY once (not per
    # iteration), so the bound is one iteration's two 16x8 matvecs
    assert cost["flops"] >= 2 * 16 * 8 * 2
    assert out["memory_analysis"] is not None


def test_trace_writes_profile(tmp_path):
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((16, 8)))
    b = jnp.asarray(rng.standard_normal(16))
    log_dir = os.path.join(str(tmp_path), "prof")
    Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    with trace(log_dir):
        x, it = _solve(jnp.zeros(8), A, b, Lf)
        np.asarray(x)  # force completion inside the trace window
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(log_dir)
        for f in fs
    ]
    assert files, "trace wrote no profile artifacts"
    assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz"))
               for f in files), files
