"""Batched TV-denoising throughput (the north star's second workload family).

Vmapped Chambolle-Pock over a batch of images: per iteration two stencil
applications (the implicit 2-D gradient and its adjoint), two proxes and the
theta-overrelaxation — all elementwise/VPU work batched across images.

    python benchmarks/tv_bench.py

Prints one JSON line: images/s to the FPR tolerance, with per-image
iteration counts from the per-lane convergence masks.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
H = W = 64
LAM = 0.12
TOL = 1e-4
MAXIT = 5000


def main():
    import jax
    import jax.numpy as jnp

    from proxtpu.algorithms.primal_dual import make_chambolle_pock_iteration
    from proxtpu.ops.linops import Grad2DOperator
    from proxtpu.parallel.batch import batched_run_loop
    from proxtpu.prox import NormL21, SqrDistance

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    clean = np.zeros((BATCH, H, W), np.float32)
    clean[:, H // 4 : 3 * H // 4, W // 4 : 3 * W // 4] = 1.0
    noisy = jnp.asarray(
        clean + 0.15 * rng.standard_normal((BATCH, H, W)).astype(np.float32)
    )

    iteration = jax.vmap(
        lambda y: make_chambolle_pock_iteration(
            x0=jnp.zeros((H, W), jnp.float32),
            y0=jnp.zeros((2, H, W), jnp.float32),
            g=SqrDistance(y),
            h=NormL21(LAM, axis=0),
            L=Grad2DOperator((H, W)),
        )
    )(noisy)

    def solve():
        sols, iters, done = batched_run_loop(iteration, MAXIT, TOL)
        xs, duals = sols
        return np.asarray(xs), np.asarray(iters), np.asarray(done)

    xs, iters, done = solve()  # compile + warm (host fence via np.asarray)
    t0 = time.perf_counter()
    xs, iters, done = solve()
    dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "batched_tv_denoise_images_per_sec",
                "value": round(BATCH / dt, 2),
                "unit": f"images/s ({H}x{W}, CP to FPR {TOL}, batch={BATCH},"
                f" {platform})",
                "mean_it": round(float(iters.mean()), 1),
                "all_done": bool(done.all()),
            }
        )
    )


if __name__ == "__main__":
    main()
