"""Fused-kernel vs XLA sweep across workload shapes (TPU).

For each (batch, m, n) shape: solve the batch to tol with the fused Pallas
step and with the pure-XLA step, report problems/s for both (host-transfer
fenced — block_until_ready does not block on the axon backend).

    python benchmarks/kernel_sweep.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    (256, 200, 400),
    (64, 512, 1024),
    (1024, 64, 128),
]
TOL = 1e-5
MAXIT = 3000


def gen(batch, m, n):
    rng = np.random.default_rng(0)
    As = (rng.standard_normal((batch, m, n)) / np.sqrt(m)).astype(np.float32)
    bs = rng.standard_normal((batch, m)).astype(np.float32)
    lams = (0.1 * np.max(np.abs(np.einsum("bmn,bm->bn", As, bs)), axis=1)).astype(np.float32)
    Lfs = np.array(
        [np.linalg.norm(As[i], 2) ** 2 for i in range(batch)], np.float32
    )
    return As, bs, lams, Lfs


def main():
    import jax
    import jax.numpy as jnp

    from proxtpu.kernels.lasso import solve_lasso_batch

    for B, m, n in SHAPES:
        As, bs, lams, Lfs = gen(B, m, n)
        A, b = jnp.asarray(As), jnp.asarray(bs)
        lam, Lf = jnp.asarray(lams), jnp.asarray(Lfs)
        row = {"batch": B, "m": m, "n": n}
        for key, use_kernel in [("kernel_pps", True), ("xla_pps", False)]:
            z, it, d = solve_lasso_batch(
                A, b, lam, Lf, TOL, maxit=MAXIT, use_kernel=use_kernel
            )
            _ = np.asarray(z)  # warm
            t0 = time.perf_counter()
            z, it, d = solve_lasso_batch(
                A, b, lam, Lf, TOL, maxit=MAXIT, use_kernel=use_kernel
            )
            _ = np.asarray(z)
            dt = time.perf_counter() - t0
            row[key] = round(B / dt, 1)
            row["mean_it"] = round(float(np.asarray(it).mean()), 1)
            row["all_done"] = bool(np.asarray(d).all())
        row["speedup"] = round(row["kernel_pps"] / row["xla_pps"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
