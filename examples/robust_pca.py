"""Example: robust PCA — split a matrix into low-rank + sparse parts.

min_{L,S}  1/2 ||L + S - M||_F^2 + lam_L ||L||_* + lam_S ||S||_1

Three things this demonstrates at once:

* a TUPLE iterate (L, S) — every solver is generic over pytrees, so the
  three-term Davis-Yin splitting runs on the product space unchanged;
* the bring-your-own-gradient seam: the coupling term f(L,S) is a tiny
  custom smooth object with a hand-written `value_and_gradient`
  (reference seam: ``test/runtests.jl:6-16``);
* `SeparableSum` routing each prox to its block (nuclear-norm SVD
  shrinkage on L, soft-thresholding on S).

    python examples/robust_pca.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from proxtpu.algorithms import DavisYin
from proxtpu.prox import NormL1, NuclearNorm, SeparableSum, Zero, proxclass


@proxclass
class CouplingLoss:
    """f(L, S) = 1/2 ||L + S - M||_F^2 with a hand gradient (Lf = 2)."""

    M: object

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        L, S = x
        r = L + S - self.M
        return jnp.sum(r * r) / 2

    def value_and_gradient(self, x):
        L, S = x
        r = L + S - self.M
        return jnp.sum(r * r) / 2, (r, r)


def main(verbose=True):
    rng = np.random.default_rng(0)
    m, n, r, p_sparse = 60, 50, 4, 0.05
    U = rng.standard_normal((m, r)) / np.sqrt(m)
    V = rng.standard_normal((r, n))
    L_true = (U @ V).astype(np.float32) * 3.0
    S_true = np.zeros((m, n), np.float32)
    mask = rng.random((m, n)) < p_sparse
    S_true[mask] = 2.0 * np.sign(rng.standard_normal(mask.sum()))
    M = jnp.asarray(L_true + S_true)

    lam_L = 0.25
    lam_S = 0.06
    g = SeparableSum((NuclearNorm(lam_L), Zero()))   # low-rank block
    h = SeparableSum((Zero(), NormL1(lam_S)))        # sparse block

    solver = DavisYin(tol=1e-6, maxit=5000)
    (L, S), it = solver(
        x0=(jnp.zeros((m, n), jnp.float32), jnp.zeros((m, n), jnp.float32)),
        f=CouplingLoss(M), g=g, h=h, Lf=2.0,
    )

    sv = np.linalg.svd(np.asarray(L), compute_uv=False)
    # true singular values are >= 16, the largest shrinkage leak ~0.3
    rank = int((sv > 0.05 * sv[0]).sum())
    supp_hat = np.abs(np.asarray(S)) > 0.2
    tp = (supp_hat & mask).sum()
    if verbose:
        print(f"iterations: {int(it)}")
        print(f"recovered rank: {rank} (true {r})")
        print(f"sparse support: {supp_hat.sum()} nonzeros, "
              f"{tp}/{mask.sum()} true corruptions hit")
        rel = float(jnp.linalg.norm(L - jnp.asarray(L_true))
                    / np.linalg.norm(L_true))
        print(f"relative low-rank error: {rel:.4f}")
    return {
        "iterations": int(it), "rank": rank, "true_rank": r,
        "support_hat": supp_hat, "support_true": mask,
        "L": np.asarray(L), "S": np.asarray(S),
    }


if __name__ == "__main__":
    main()
