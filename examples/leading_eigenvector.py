"""Example: leading eigenvector as sphere-constrained nonconvex PANOC.

max_x  x' Q x / 2   s.t. ||x|| = 1
  ==  min_x  f(x) = -x' Q x / 2  +  IndSphereL2(1)(x)

The sphere is NONCONVEX — exactly the problem class PANOC/ZeroFPR handle
(smooth f + prox-accessible nonconvex g, ``panoc.jl``).  The prox of the
sphere indicator is radial projection, so each iteration is a projected
quasi-Newton step on the manifold; the fixed points of the FB map are
exactly the eigenvectors, and descent selects the leading one from a
generic start.

    python examples/leading_eigenvector.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from proxtpu.algorithms import PANOC
from proxtpu.prox import IndSphereL2, Quadratic


def main(verbose=True):
    rng = np.random.default_rng(5)
    n = 64
    S = rng.standard_normal((n, n))
    Q = jnp.asarray((S + S.T) / 2)

    w, V = np.linalg.eigh(np.asarray(Q))
    Lf = float(np.max(np.abs(w)))

    x0 = jnp.asarray(rng.standard_normal(n))
    x0 = x0 / jnp.linalg.norm(x0)

    x, it = PANOC(tol=1e-10, maxit=2000)(
        x0=x0, f=Quadratic(-Q, jnp.zeros(n)), g=IndSphereL2(1.0), Lf=Lf,
        adaptive=False,
    )

    rayleigh = float(x @ (Q @ x))
    v_top = V[:, -1]
    align = abs(float(np.asarray(x) @ v_top))
    if verbose:
        print(f"iterations: {int(it)}")
        print(f"Rayleigh quotient: {rayleigh:.10f}  (lam_max {w[-1]:.10f})")
        print(f"|<x, v_max>| = {align:.10f}")
    return {"iterations": int(it), "rayleigh": rayleigh,
            "lam_max": float(w[-1]), "align": align}


if __name__ == "__main__":
    main()
