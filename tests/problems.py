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

# strongly convex lasso construction (test_lasso_small_strongly_convex.jl:14-44)
SC_XSTAR = np.array(
    [
        0.8466800540711814,
        0.17674262101590932,
        -0.4987234606672925,
        0.5531315167924573,
        -0.14739365562631113,
    ]
)
SC_W = np.array(
    [
        0.15823052457732423,
        0.6874613398393697,
        0.9357764685973888,
        0.05863707298785681,
        0.49087050154723844,
    ]
)
SC_B = np.array(
    [
        [0.6997086717991196, 0.37124544422925876, 0.31840520080247225,
         0.20097960566711592, 0.038329117953706526],
        [0.1134636504826555, 0.8273912343075426, 0.8997522727456534,
         0.9821118072706589, 0.9100659142463259],
        [0.9701886480567284, 0.42825250593295605, 0.6952640061565183,
         0.9699979632534245, 0.6106722979088736],
        [0.4442755181780246, 0.4641748710746476, 0.9716060376558348,
         0.5951146731055232, 0.5699044913634803],
        [0.6681510415197733, 0.35423403325449887, 0.28461925562068024,
         0.15941152427241456, 0.6499046326711716],
    ]
)


def strongly_convex_lasso(mf=1.0, Lf=10.0):
    """Build the known-spectrum strongly convex lasso instance
    (A with eigenvalues in [sqrt(mf), sqrt(Lf)]^2, b chosen so SC_XSTAR is
    the exact solution via the subgradient optimality condition)."""
    lam = (mf + Lf) / 2
    d = np.sqrt(mf) + (np.sqrt(Lf) - np.sqrt(mf)) * SC_W
    d[0] = np.sqrt(mf)
    d[-1] = np.sqrt(Lf)
    Q, _ = np.linalg.qr(SC_B)
    A = Q @ np.diag(d) @ Q.T
    b = A @ SC_XSTAR + lam * np.linalg.solve(A.T, np.sign(SC_XSTAR))
    x0 = np.linalg.solve(A, b)
    return A, b, lam, x0


# sparse logistic solution (test_sparse_logistic_small.jl:33)
LOGREG_XSTAR = np.array([0.0, 0.0, 2.114635341704963e-01, 0.0, 2.845881348733116e00])


def as_dtype(arr, dtype):
    return jnp.asarray(np.asarray(arr).astype(dtype))
