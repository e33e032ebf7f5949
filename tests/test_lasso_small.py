"""Lasso small — the reference's primary behavioral oracle.

Mirrors ``test/problems/test_lasso_small.jl``: every solver config must hit
the hardcoded 16-digit solution within TOL, under the same iteration budget
(a regression fence on convergence speed), preserving the iterate dtype, for
real and complex types.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NormL1, make_least_squares

from problems import LASSO_A, LASSO_B, LASSO_XSTAR, as_dtype

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def setup(dtype):
    A = as_dtype(LASSO_A, dtype)
    b = as_dtype(LASSO_B, dtype)
    lam = 0.1 * float(np.max(np.abs(np.asarray(A.conj().T @ b))))
    fA = make_least_squares(A, b)  # f(x) = ||Ax - b||^2 / 2 (hand gradient)
    fA_ad = pa.AutoDifferentiable(
        lambda x: 0.5 * jnp.real(jnp.vdot(A @ x - b, A @ x - b))
    )
    g = NormL1(lam)
    Lf = float(np.linalg.norm(np.asarray(A), 2) ** 2)
    x_star = as_dtype(LASSO_XSTAR, dtype)
    x0 = jnp.zeros(A.shape[1], dtype)
    return A, b, fA, fA_ad, g, Lf, x_star, x0


TOL = 1e-4


def check(x, it, x_star, dtype, budget, tol=TOL):
    assert x.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= tol
    assert it < budget


@pytest.mark.parametrize("dtype", DTYPES)
def test_forward_backward_fixed(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.ForwardBackward(tol=TOL)
    x, it = solver(x0=x0, f=fA, g=g, Lf=Lf)
    check(x, it, x_star, dtype, 150)


@pytest.mark.parametrize("dtype", DTYPES)
def test_forward_backward_adaptive(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.ForwardBackward(tol=TOL, adaptive=True)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 300)


@pytest.mark.parametrize("dtype", DTYPES)
def test_forward_backward_adaptive_regret(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.ForwardBackward(tol=TOL, adaptive=True, increase_gamma=1.01)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 150)


@pytest.mark.parametrize("dtype", DTYPES)
def test_forward_backward_autodiff(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.ForwardBackward(tol=TOL)
    x, it = solver(x0=x0, f=fA_ad, g=g, Lf=Lf)
    check(x, it, x_star, dtype, 150)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_fixed(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL)
    x, it = solver(x0=x0, f=fA, g=g, Lf=Lf)
    check(x, it, x_star, dtype, 100)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_adaptive(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL, adaptive=True)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 200)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_adaptive_regret(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL, adaptive=True, increase_gamma=1.01)
    x, it = solver(x0=x0, f=fA, g=g)
    check(x, it, x_star, dtype, 100)


@pytest.mark.parametrize("dtype", DTYPES)
def test_fista_custom_extrapolation(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.FastForwardBackward(tol=TOL)
    x, it = solver(
        x0=x0, f=fA, g=g, Lf=Lf,
        extrapolation_sequence=pa.FixedNesterovSequence(),
    )
    check(x, it, x_star, dtype, 100)


# --- AFBA on lasso: the reference's three routing configs with fences
# (``test/problems/test_lasso_small.jl:233-272``): (a) smooth f + beta_f,
# (b) the h = g dual route over L = I, (c) h∘L with the proxable data term.


@pytest.mark.parametrize("dtype", DTYPES)
def test_afba_smooth_f(dtype):
    """AFBA(theta=1, mu=1) with f smooth + g = ||.||_1, fence <= 80."""
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.AFBA(theta=1, mu=1, tol=1e-6)
    (x, y), it = solver(
        x0=x0, y0=jnp.zeros_like(x0), f=fA_ad, g=g, beta_f=Lf,
    )
    assert x.dtype == jnp.dtype(dtype)
    assert y.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-4
    assert it <= 80


@pytest.mark.parametrize("dtype", DTYPES)
def test_afba_h_equals_g(dtype):
    """AFBA with the l1 term routed through the *dual* (h = g, L = I),
    fence <= 100."""
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    solver = pa.AFBA(theta=1, mu=1, tol=1e-6)
    (x, y), it = solver(
        x0=x0, y0=jnp.zeros_like(x0), f=fA_ad, h=g, beta_f=Lf,
    )
    assert x.dtype == jnp.dtype(dtype)
    assert y.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-4
    assert it <= 100


@pytest.mark.parametrize("dtype", DTYPES)
def test_afba_h_compose_L(dtype):
    """AFBA with the data term as h(Lx), h = ||. - b||^2/2 proxable, L = A,
    fence <= 150."""
    from proxtpu.prox import SqrNormL2, Translate

    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    f_prox = Translate(SqrNormL2(1.0), -b)  # h(u) = ||u - b||^2 / 2
    solver = pa.AFBA(theta=1, mu=1, tol=1e-6)
    (x, y), it = solver(
        x0=x0, y0=jnp.zeros(A.shape[0], dtype), h=f_prox, L=A, g=g,
    )
    assert x.dtype == jnp.dtype(dtype)
    assert y.dtype == jnp.dtype(dtype)
    assert float(jnp.max(jnp.abs(x - x_star))) <= 1e-4
    assert it <= 150


@pytest.mark.parametrize("dtype", [jnp.float64])
def test_x0_not_mutated(dtype):
    A, b, fA, fA_ad, g, Lf, x_star, x0 = setup(dtype)
    x0_backup = jnp.array(x0)
    solver = pa.ForwardBackward(tol=TOL)
    solver(x0=x0, f=fA, g=g, Lf=Lf)
    assert bool(jnp.all(x0 == x0_backup))


def test_chambolle_pock_identity_params_guarded():
    """ChambollePock/VuCondat must REJECT user theta/f/l instead of
    silently running a different AFBA variant under the wrong name
    (regression: a call-time theta=1.0 used to override the theta=2
    that defines Chambolle-Pock)."""
    import pytest

    from proxtpu.prox import SqrNormL2, Zero

    A, b, _, _, _, _, _, _ = setup(np.float64)
    lam = 0.1 * float(np.max(np.abs(np.asarray(A.conj().T @ b))))
    kw = dict(
        x0=jnp.zeros(A.shape[1]), y0=jnp.zeros(A.shape[0]),
        g=SqrNormL2(lam), h=NormL1(lam), L=A, gamma1=0.01, gamma2=0.01,
    )
    with pytest.raises(ValueError, match="Chambolle-Pock"):
        pa.ChambollePock(tol=1e-4, maxit=10)(theta=1.0, **kw)
    with pytest.raises(ValueError, match="Chambolle-Pock"):
        pa.ChambollePock(tol=1e-4, maxit=10)(f=Zero(), **kw)
    with pytest.raises(ValueError, match="Vu-Condat"):
        pa.VuCondat(tol=1e-4, maxit=10)(theta=1.0, f=SqrNormL2(lam),
                                        beta_f=lam, **kw)


@pytest.mark.parametrize("K", [2, 8])
def test_check_every_exact_single_driver(K):
    """check_every=K on the single-problem driver is EXACT: masked inner
    steps freeze the state at convergence, so counts and solutions are
    bit-identical to K=1 on CPU (run_loop's blocked path; the analogue of
    the flat machines' frozen-lane contract)."""
    A, b, fA, _, g, Lf, x_star, x0 = setup(np.float64)
    for make, kw in [
        (pa.FastForwardBackward, dict(x0=x0, f=fA, g=g, Lf=Lf)),
        (pa.ForwardBackward, dict(x0=x0, f=fA, g=g, Lf=Lf)),
        (pa.DouglasRachford, dict(x0=x0, f=fA, g=g, gamma=1.0)),
        (pa.PANOC, dict(x0=x0, f=pa.AutoDifferentiable(
            lambda x: 0.5 * jnp.real(jnp.vdot(A @ x - b, A @ x - b))),
            g=g)),
    ]:
        x1, it1 = make(tol=1e-6)(**kw)
        xk, itk = make(tol=1e-6, check_every=K)(**kw)
        assert it1 == itk
        assert bool(jnp.all(x1 == xk))


def test_check_every_verbose_cadence(capfd):
    """Blocked driver keeps the K=1 display cadence (rows at k % freq == 0
    for steps that actually ran)."""
    import jax

    A, b, fA, _, g, Lf, x_star, x0 = setup(np.float64)
    _x, _it = pa.FastForwardBackward(tol=1e-6, verbose=True, freq=50,
                                     check_every=8)(x0=x0, f=fA, g=g, Lf=Lf)
    jax.effects_barrier()
    out = capfd.readouterr().out
    rows = [ln for ln in out.splitlines() if ln.strip()]
    # 142-iteration solve at freq=50: rows at 50, 100 + the final row
    assert len(rows) == 3
