"""Linear programs solved to ~machine precision via splitting methods.

Mirrors ``test/problems/test_linear_programs.jl``: a fixed 8x10 LP with known
primal/dual solution, solved by AFBA, Vu-Condat, Chambolle-Pock (with the
stacked [A; I] operator + SlicedSeparableSum) and Davis-Yin (IndAffine
projection); asserts primal/dual feasibility and complementarity at 1000*tol.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import (
    IndNonnegative,
    IndPoint,
    Linear,
    SlicedSeparableSum,
    make_ind_affine,
)

X_STAR = np.array(
    [0.03606099647643202, 0.6641306619990367, 0.14689326835593086,
     0.8616058527226432, 0.6518888386753204, 0.0, 0.0, 0.0, 0.0, 0.0]
)
S_STAR = np.array(
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.7652088547602296, 0.5474850582278736,
     0.6291635905927829, 0.5505791259743739, 0.2787959059899776]
)
Y_STAR = np.array(
    [-0.18584225497010673, 1.0289179383971105, -0.5464276767930338,
     0.6916826379378143, 0.0052105118567898154, -1.3874339670318891,
     2.6448648322602337, 0.4436510755789434]
)
A_LP = np.array([
    [0.9670566934980286, 0.3533472582831891, -0.2819205403663176,
     -0.3071751292615649, -0.008197151577028876, 1.9968628487924958,
     -1.3978028828102382, -0.10109443461339453, 0.3540170332321368,
     -0.5983697948494805],
    [-0.08643002247762153, 1.0822796020885652, -0.8133412010128359,
     0.5073579509595517, -0.2793798574957181, -0.3437059320143032,
     -0.10596751644319548, 0.8296541102523696, -0.28406001552384064,
     0.33566140783820164],
    [-0.6474810505335304, 1.2524424221527595, 0.7261766049639965,
     0.6930548839308885, 0.9064585656428545, 0.5197152355759463,
     1.3746077918877961, 1.5289983684262054, 0.9258506062644877,
     -1.3774011601531342],
    [0.8725430405646543, 1.1911309824177332, -0.7221185305116811,
     0.44324697589700257, -0.15551892138880116, -0.5167033349322372,
     -1.4774045165687548, -0.8670756465083638, -1.4024841888738206,
     0.296570674868075],
    [0.5252662593900623, -0.6817132148621747, 0.37446015899900237,
     0.4180282147408251, -0.8405436435394317, -1.742941478155391,
     -0.06419427972299957, 0.43910205564784205, 1.0643883425210827,
     2.3063869854427335],
    [-0.7148913270640012, -0.769028546306448, -1.059257097999333,
     -0.6795170119545777, -0.0498976886779524, -1.2392107698826862,
     -0.4415384005606088, -1.058758868936871, -0.108504245219676,
     -0.5576550366602419],
    [-1.208388774142618, -0.15206129387542855, 2.311520055340236,
     0.8043266793420988, -0.5692874893454578, 1.1246423711381501,
     0.5335942753441769, 2.6595405998250876, 0.09162292399585106,
     0.3749905036072034],
    [-0.2300660921924555, -0.7014271654627467, -0.20170532145095504,
     -0.02503019691724233, -2.2191605023268512, 0.9110653907470295,
     1.8238644805628141, -1.1908921287611471, 0.12168786553115268,
     0.17399181994853638],
])

M, N = A_LP.shape
B_LP = A_LP @ X_STAR
C_LP = A_LP.T @ Y_STAR + S_STAR

DTYPES = [jnp.float32, jnp.float64]


def assert_lp_solution(c, A, b, x, y, tol):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    assert -np.min(np.minimum(0.0, x)) <= tol  # x >= 0
    assert np.linalg.norm(A @ x - b) <= tol  # Ax = b
    assert np.max(np.maximum(0.0, -A.T @ y - c)) <= tol  # A'y <= -c slack
    assert abs(np.dot(c + A.T @ y, x)) <= tol  # complementarity


def problem_data(dtype):
    A = jnp.asarray(A_LP, dtype)
    b = jnp.asarray(B_LP, dtype)
    c = jnp.asarray(C_LP, dtype)
    tol = 100 * float(jnp.finfo(dtype).eps)
    return A, b, c, tol


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("solver_name", ["AFBA", "VuCondat"])
def test_lp_primal_dual(dtype, solver_name):
    A, b, c, tol = problem_data(dtype)
    solver = getattr(pa, solver_name)(tol=tol, maxit=100_000)
    (x, y), it = solver(
        x0=jnp.zeros(N, dtype), y0=jnp.zeros(M, dtype),
        f=Linear(c), g=IndNonnegative(), h=IndPoint(b), L=A, beta_f=0,
    )
    assert x.dtype == jnp.dtype(dtype)
    assert it <= 100_000
    assert_lp_solution(C_LP, A_LP, B_LP, x, y, 1000 * tol)


@pytest.mark.parametrize("dtype", DTYPES)
def test_lp_chambolle_pock(dtype):
    A, b, c, tol = problem_data(dtype)
    L = jnp.concatenate([A, jnp.eye(N, dtype=dtype)], axis=0)
    h = SlicedSeparableSum(
        (IndPoint(b), IndNonnegative()), ((0, M), (M, M + N))
    )
    solver = pa.ChambollePock(tol=tol, maxit=100_000)
    (x, y), it = solver(
        x0=jnp.zeros(N, dtype), y0=jnp.zeros(M + N, dtype),
        g=Linear(c), h=h, L=L,
    )
    assert it <= 100_000
    assert_lp_solution(C_LP, A_LP, B_LP, x, np.asarray(y)[:M], 1000 * tol)


@pytest.mark.parametrize("dtype", DTYPES)
def test_lp_davis_yin(dtype):
    A, b, c, tol = problem_data(dtype)
    solver = pa.DavisYin(gamma=1.0, tol=tol, maxit=100_000)
    xf, it = solver(
        x0=jnp.zeros(N, dtype), f=Linear(c), g=IndNonnegative(),
        h=make_ind_affine(A, b),
    )
    assert it <= 100_000
    assert np.linalg.norm(np.asarray(xf) - X_STAR) <= 100 * tol
