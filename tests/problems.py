"""Shared test problems — the reference's behavioral oracles.

Data and 16-digit solutions are transcribed from the reference tests
(``test/problems/test_lasso_small.jl:17-42`` and friends); they are *data*,
not code, and pin our solvers to the same fixed points.
"""

import jax.numpy as jnp
import numpy as np

# 4x5 lasso instance (test_lasso_small.jl:17-23)
LASSO_A = np.array(
    [
        [1.0, -2.0, 3.0, -4.0, 5.0],
        [2.0, -1.0, 0.0, -1.0, 3.0],
        [-1.0, 0.0, 4.0, -3.0, 2.0],
        [-1.0, -1.0, -1.0, 1.0, 3.0],
    ]
)
LASSO_B = np.array([1.0, 2.0, 3.0, 4.0])

# x_star to 16 digits (test_lasso_small.jl:42)
LASSO_XSTAR = np.array(
    [
        -3.877278911564627e-01,
        0.0,
        0.0,
        2.174149659863943e-02,
        6.168435374149660e-01,
    ]
)


def lasso_lam(dtype=np.float64):
    A = LASSO_A.astype(dtype)
    b = LASSO_B.astype(dtype)
    return 0.1 * np.max(np.abs(A.conj().T @ b))


def lasso_Lf(dtype=np.float64):
    return float(np.linalg.norm(LASSO_A.astype(np.float64), 2) ** 2)


# elastic net solution (test_elasticnet.jl:33)
ENET_XSTAR = np.array(
    [-0.6004983388704322, 0.0, 0.0, 0.195182724252491, 0.764119601328903]
)

# sparse logistic solution (test_sparse_logistic_small.jl:33)
LOGREG_XSTAR = np.array([0.0, 0.0, 2.114635341704963e-01, 0.0, 2.845881348733116e00])


def as_dtype(arr, dtype):
    return jnp.asarray(np.asarray(arr).astype(dtype))
