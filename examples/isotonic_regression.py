"""Example: isotonic (monotone) regression via the polyhedral projection.

    minimize  1/2 ||A x - b||^2   subject to  x_1 <= x_2 <= ... <= x_n

The monotonicity constraints are the polyhedron {D x >= 0} with the
forward-difference matrix D (whose rows sum to zero — the case the
projection's Lipschitz estimator must survive, see
``IndPolyhedral``'s power-iteration notes).  With A = I this is
classical isotonic regression (pool-adjacent-violators territory); with
a general A it is shape-constrained least squares, which PAV cannot do
— but a proximal splitting does it with a one-line objective change.

    python examples/isotonic_regression.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import proxtpu as pa
from proxtpu.prox import IndPolyhedral, make_least_squares


def main(verbose=True):
    rng = np.random.default_rng(0)
    n = 40
    truth = np.sort(np.cumsum(rng.standard_normal(n) * 0.3))
    y = truth + 0.5 * rng.standard_normal(n)

    D = np.zeros((n - 1, n))
    for i in range(n - 1):
        D[i, i], D[i, i + 1] = -1.0, 1.0
    mono = IndPolyhedral(
        jnp.asarray(D), jnp.zeros(n - 1), jnp.full(n - 1, np.inf)
    )

    # A = I: classical isotonic regression
    x, it = pa.ForwardBackward(tol=1e-8, maxit=5000)(
        x0=jnp.zeros(n),
        f=make_least_squares(jnp.asarray(np.eye(n)), jnp.asarray(y)),
        g=mono,
        Lf=1.0,
    )
    x = np.asarray(x)

    # shape-constrained least squares: a general design matrix
    m = 60
    A = rng.standard_normal((m, n)) / np.sqrt(m)
    b = A @ truth + 0.1 * rng.standard_normal(m)
    Lf = float(np.linalg.norm(A, 2) ** 2)
    xg, itg = pa.FastForwardBackward(tol=1e-8, maxit=10000)(
        x0=jnp.zeros(n),
        f=make_least_squares(jnp.asarray(A), jnp.asarray(b)),
        g=mono,
        Lf=Lf,
    )
    xg = np.asarray(xg)

    out = {
        "iterations": int(it),
        "iterations_general": int(itg),
        "monotone": bool(np.all(np.diff(x) >= -1e-7)),
        "monotone_general": bool(np.all(np.diff(xg) >= -1e-7)),
        "mse_vs_truth": float(np.mean((x - truth) ** 2)),
        "mse_noisy": float(np.mean((y - truth) ** 2)),
    }
    if verbose:
        print(f"isotonic fit:  {out['iterations']} iterations, "
              f"monotone={out['monotone']}")
        print(f"general A fit: {out['iterations_general']} iterations, "
              f"monotone={out['monotone_general']}")
        print(f"MSE noisy {out['mse_noisy']:.4f} -> isotonic "
              f"{out['mse_vs_truth']:.4f}")
    return out


if __name__ == "__main__":
    main()
