"""Example: total-variation image denoising with Chambolle-Pock.

    minimize  1/2 ||x - y||^2 + lam * ||grad x||_{2,1}

with the implicit 2-D forward-difference operator — no dense matrix is ever
materialized; the operator's matvec/adjoint are stencil ops and the default
stepsizes use its known norm bound ||L||^2 <= 8.

    python examples/tv_denoise.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import proxtpu as pa
from proxtpu.ops.linops import Grad2DOperator
from proxtpu.prox import NormL21, SqrDistance


def main():
    rng = np.random.default_rng(0)
    H = W = 64
    clean = np.zeros((H, W))
    clean[16:48, 16:48] = 1.0
    clean[32:, :] += 0.5
    noisy = jnp.asarray(clean + 0.15 * rng.standard_normal((H, W)))

    L = Grad2DOperator((H, W))
    solver = pa.ChambollePock(tol=1e-5, maxit=20_000)
    (x, _), it = solver(
        x0=jnp.zeros_like(noisy),
        y0=jnp.zeros((2, H, W)),
        g=SqrDistance(noisy),
        h=NormL21(0.12, axis=0),
        L=L,
    )

    def psnr(u):
        mse = float(jnp.mean((u - jnp.asarray(clean)) ** 2))
        return 10 * np.log10(jnp.max(jnp.asarray(clean)) ** 2 / mse)

    print(f"converged in {it} iterations")
    print(f"PSNR noisy:    {psnr(noisy):6.2f} dB")
    print(f"PSNR denoised: {psnr(x):6.2f} dB")


if __name__ == "__main__":
    main()
