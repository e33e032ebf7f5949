"""Example: Gaussian phase retrieval — complex, nonconvex, quasi-Newton.

min_x  f(x) = 1/(4m) * sum_i (|<a_i, x>|^2 - b_i)^2      (x complex)

Recover a complex signal from intensity-only measurements — smooth but
NONCONVEX and only *locally* Lipschitz (quartic).  Demonstrates:

* complex iterates end-to-end: the AD seam follows the Wirtinger
  convention, so ``jax.grad`` of the real-valued intensity loss IS the
  descent direction — no hand gradient needed;
* the classic spectral initialization feeding a solver;
* why the line-search family earns its keep on nonconvex problems:
  adaptive ZeroFPR (L-BFGS directions + gamma backtracking) solves in
  ~66 iterations where fixed-step gradient descent needs ~2,500 — and
  fixed-step *accelerated* schemes (LiLin) can diverge outright on a
  quartic, whose curvature grows without bound away from the signal
  (the reference's own ``li_lin.jl`` carries a
  "TODO: backtrack gamma" for exactly this);
* success measured up to the inherent global-phase ambiguity.

    python examples/phase_retrieval.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from proxtpu.algorithms import ForwardBackward, ZeroFPR
from proxtpu.prox import AutoDifferentiable


def phase_dist(x, x_true):
    """Distance up to global phase: min_phi ||x - e^{i phi} x_true||."""
    inner = np.vdot(np.asarray(x_true), np.asarray(x))
    phase = inner / max(abs(inner), 1e-30)
    return float(np.linalg.norm(np.asarray(x) - phase * np.asarray(x_true)))


def main(verbose=True):
    prev_x64 = jax.config.read("jax_enable_x64")
    jax.config.update("jax_enable_x64", True)
    try:
        return _main(verbose)
    finally:
        jax.config.update("jax_enable_x64", prev_x64)


def _main(verbose):
    rng = np.random.default_rng(3)
    n, m = 32, 6 * 32
    x_true = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    A = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)))
    A /= np.sqrt(2)
    b = np.abs(A @ x_true) ** 2
    A_j = jnp.asarray(A, jnp.complex128)
    b_j = jnp.asarray(b, jnp.float64)

    def intensity_loss(x):
        r = jnp.abs(A_j @ x) ** 2 - b_j
        return jnp.sum(r * r) / (4 * m)

    f = AutoDifferentiable(intensity_loss)

    # spectral initialization: leading eigenvector of (1/m) sum b_i a_i a_i^H,
    # scaled to the signal energy sqrt(mean(b))
    Y = (A.conj().T * b) @ A / m
    w, V = np.linalg.eigh(Y)
    x0 = jnp.asarray(V[:, -1] * np.sqrt(b.mean()), jnp.complex128)
    gamma0 = 1.0 / (6.0 * float(w[-1]))  # local curvature scale near init

    x, it = ZeroFPR(tol=1e-9, maxit=2000)(
        x0=x0, f=f, adaptive=True, gamma=gamma0,
    )
    x_gd, it_gd = ForwardBackward(tol=1e-9, maxit=20_000)(
        x0=x0, f=f, Lf=6.0 * float(w[-1]),
    )

    d0 = phase_dist(x0, x_true)
    d = phase_dist(x, x_true)
    rel = d / np.linalg.norm(x_true)
    if verbose:
        print(f"spectral-init distance: {d0:.4f}")
        print(f"ZeroFPR (adaptive, L-BFGS): {int(it)} iterations, "
              f"distance {d:.2e} (relative {rel:.2e})")
        print(f"gradient descent (fixed step): {int(it_gd)} iterations, "
              f"distance {phase_dist(x_gd, x_true):.2e}")
    return {
        "iterations": int(it), "iterations_gd": int(it_gd),
        "rel_error": rel, "init_dist": d0,
    }


if __name__ == "__main__":
    main()
