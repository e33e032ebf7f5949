"""Docs stay runnable: execute the custom-algorithm guide's code block.

The ISTA implementation in ``docs/custom_algorithms.md`` is the template
users copy (parity with the reference's ``custom_algorithms.jl`` guide,
whose code Literate.jl executes in CI); this test extracts the fenced block
and runs it against the lasso oracle, so the guide cannot rot.
"""

import os
import re

import jax.numpy as jnp
import numpy as np

from problems import LASSO_A, LASSO_B, LASSO_XSTAR, lasso_lam, lasso_Lf

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs")


def _first_code_block(path):
    text = open(path).read()
    m = re.search(r"```python\n(.*?)```", text, re.S)
    assert m, f"no python code block in {path}"
    return m.group(1)


def test_custom_algorithm_guide_ista_runs():
    code = _first_code_block(os.path.join(DOCS, "custom_algorithms.md"))
    ns = {}
    exec(compile(code, "custom_algorithms.md", "exec"), ns)

    from proxtpu.prox import NormL1, make_least_squares
    import proxtpu as pa

    A = jnp.asarray(LASSO_A)
    b = jnp.asarray(LASSO_B)
    f = make_least_squares(A, b)
    g = NormL1(lasso_lam())
    gamma = 1.0 / lasso_Lf()
    x0 = jnp.zeros(A.shape[1])

    ista = ns["ISTA"](tol=1e-6, maxit=20_000)
    x, it = ista(x0=x0, f=f, g=g, gamma=gamma)
    assert float(jnp.max(jnp.abs(x - jnp.asarray(LASSO_XSTAR)))) <= 1e-4

    # the guide's ISTA is plain FB with fixed gamma: same counts/solution
    fb = pa.ForwardBackward(tol=1e-6, maxit=20_000)
    x_fb, it_fb = fb(x0=x0, f=f, g=g, gamma=gamma)
    assert it == it_fb
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_fb), atol=1e-10)


def test_getting_started_block_runs():
    code = _first_code_block(os.path.join(DOCS, "getting_started.md"))
    ns = {}
    exec(compile(code, "getting_started.md", "exec"), ns)


def test_sparse_linear_regression_example():
    """The diabetes walkthrough (``sparse_linear_regression.jl:1-80``
    ported): converges, selects a sparse feature subset including the
    canonical bmi/s5/bp trio, and generalizes (test MSE ~1370, well under
    the ~2900 variance of the test labels)."""
    import importlib.util

    import pytest
    pytest.importorskip("sklearn")  # diabetes dataset; not a CI dep

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "sparse_linear_regression.py")
    spec = importlib.util.spec_from_file_location("slr_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)

    assert out["iterations"] < 10_000
    names = {name for name, _ in out["selected"]}
    assert {"bmi", "s5", "bp"} <= names
    assert 1 <= len(names) <= 9  # a strict subset: L1 actually sparsifies
    assert out["test_mse"] < 1600.0


def test_migration_guide_block_runs():
    """The five-minute block of ``migrating_from_proximalalgorithms.md``
    must run verbatim and converge (it is the first thing a reference
    user tries)."""
    code = _first_code_block(
        os.path.join(DOCS, "migrating_from_proximalalgorithms.md"))
    ns = {}
    exec(compile(code, "migrating_from_proximalalgorithms.md", "exec"), ns)
    assert int(ns["iterations"]) < 1000
    # the block's lasso is tests/problems.py's: pin the optimum
    x = np.asarray(ns["solution"])
    assert np.max(np.abs(x - np.asarray(LASSO_XSTAR, np.float64))) <= 1e-4


def test_svm_path_example():
    """The batched SVM lam-path example: all lanes converge, accuracy is
    sensible at small lam, and the ridge path shrinks monotonically."""
    import importlib.util

    path = os.path.join(os.path.dirname(DOCS), "examples", "svm_path.py")
    spec = importlib.util.spec_from_file_location("svm_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()  # asserts all lanes converged internally


def test_multitask_lasso_example():
    """Multi-task lasso on a matrix iterate: joint row selection recovers
    exactly the shared support (true rows >= 3.2 in norm vs <= 0.07 for
    the largest spurious row), deterministically."""
    import importlib.util

    import numpy as np

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "multitask_lasso.py")
    spec = importlib.util.spec_from_file_location("mtl_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert np.array_equal(out["selected"], out["support"])
    assert out["iterations"] < 2000
    out2 = mod.main(verbose=False)
    assert np.array_equal(out["X"], out2["X"])  # deterministic


def test_robust_pca_example():
    """Robust PCA via Davis-Yin on a TUPLE iterate (L, S): recovers the
    true rank, hits every injected sparse corruption with no false
    positives, and the low-rank error is small."""
    import importlib.util

    import numpy as np

    path = os.path.join(os.path.dirname(DOCS), "examples", "robust_pca.py")
    spec = importlib.util.spec_from_file_location("rpca_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert out["rank"] == out["true_rank"]
    assert np.array_equal(out["support_hat"], out["support_true"])
    assert out["iterations"] < 5000


def test_graphical_lasso_example():
    """Graphical lasso via DR on the NegLogDet/Tilt/weighted-NormL1
    stack: KKT certificate holds at every block, the iterate is PD, and
    the lam path has zero false-positive edges on the exact-covariance
    problem."""
    import importlib.util

    import numpy as np

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "graphical_lasso.py")
    spec = importlib.util.spec_from_file_location("glasso_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert out["iterations"] < 3000
    assert out["kkt_diag"] < 1e-6 and out["kkt_nz"] < 1e-6
    assert out["kkt_zero_bound_ok"]
    assert out["min_eig"] > 0
    assert all(fp == 0 for _, _, _, fp in out["path"])
    # the path actually sweeps sparsity: densest > sparsest
    assert out["path"][0][1] > out["path"][-1][1] >= 0


def test_phase_retrieval_example():
    """Complex nonconvex phase retrieval: adaptive ZeroFPR recovers the
    signal (up to global phase) from a spectral init in far fewer
    iterations than fixed-step gradient descent."""
    import importlib.util

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "phase_retrieval.py")
    spec = importlib.util.spec_from_file_location("pr_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert out["rel_error"] < 1e-6
    assert out["iterations"] < 200
    assert out["iterations"] < out["iterations_gd"] / 10


def test_leading_eigenvector_example():
    """Sphere-constrained nonconvex PANOC finds the leading eigenvector
    (Rayleigh quotient matches lam_max to 1e-8, alignment ~1)."""
    import importlib.util

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "leading_eigenvector.py")
    spec = importlib.util.spec_from_file_location("eig_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert abs(out["rayleigh"] - out["lam_max"]) <= 1e-8 * (
        1 + abs(out["lam_max"])
    )
    assert out["align"] > 1 - 1e-6
    assert out["iterations"] < 500


def test_portfolio_cvar_example():
    """Minimum-CVaR portfolio via Chambolle-Pock + SumLargest: converges,
    beats the equal-weight CVaR decisively, stays on the simplex, and no
    feasible perturbation improves the objective."""
    import importlib.util

    import numpy as np

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "portfolio_cvar.py")
    spec = importlib.util.spec_from_file_location("cvar_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    w = out["weights"]
    assert out["iterations"] < 50_000
    assert np.all(w >= -1e-8) and abs(np.sum(w) - 1) < 1e-6
    assert out["cvar_opt"] < out["cvar_equal_weight"] - 0.01
    # optimality: random simplex-feasible perturbations cannot beat it
    from proxtpu.prox import IndSimplex

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    proj = lambda v: np.asarray(IndSimplex(1.0).prox(jnp.asarray(v), 1.0)[0])
    R, k, n = out["R"], out["k"], len(w)
    cvar = lambda ww: float(np.mean(np.sort(-np.asarray(R) @ ww)[-k:]))
    base = cvar(w)
    for _ in range(30):
        p = proj(w + 0.02 * rng.standard_normal(n))
        assert cvar(p) >= base - 1e-6


def test_convergence_curves_example():
    """On-device recording example: all three solvers agree on the
    minimizer, the quasi-Newton solvers need far fewer iterations than
    FISTA, and every recorded curve ends at/below tolerance."""
    import importlib.util

    import numpy as np

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "convergence_curves.py")
    spec = importlib.util.spec_from_file_location("curves_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert out["ZeroFPR"]["it"] < out["FISTA"]["it"]
    assert out["PANOC"]["it"] < out["FISTA"]["it"]
    for r in out.values():
        assert r["curve"][-1] <= mod.TOL
        assert len(r["curve"]) == r["it"]


def test_reference_tolerances_example():
    """The precision warm-starting walkthrough: every path point reaches
    the f64 criterion at tol=1e-8 (recomputed on the host) and the
    support shrinks monotonically-ish along the decreasing-lam path."""
    import importlib.util

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "reference_tolerances.py")
    spec = importlib.util.spec_from_file_location("rt_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert out["worst_residual"] <= 1.05e-8
    nnz = out["nnz"]
    # lam decreases along the path -> support grows (weakly, modulo ties)
    assert nnz[-1] >= nnz[0]
    assert out["xs"].dtype == np.float64


def test_tv1d_denoising_example():
    """Batched TV1D denoising: one vmapped prox call lifts SNR by >6 dB
    on piecewise-constant signals."""
    import importlib.util

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "tv1d_denoising.py")
    spec = importlib.util.spec_from_file_location("tv1d_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert out["snr_denoised"] > out["snr_noisy"] + 6.0


def test_isotonic_regression_example():
    """Monotone-constrained fits via IndPolyhedral: both solves produce
    monotone solutions and isotonic averaging beats the raw noise."""
    import importlib.util

    path = os.path.join(os.path.dirname(DOCS), "examples",
                        "isotonic_regression.py")
    spec = importlib.util.spec_from_file_location("iso_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(verbose=False)
    assert out["monotone"] and out["monotone_general"]
    assert out["mse_vs_truth"] < out["mse_noisy"]
    assert out["iterations"] < 5000
