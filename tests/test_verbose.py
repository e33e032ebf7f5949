"""Verbose-mode smoke tests: the jax.debug.print display paths must execute.

Mirrors ``test/problems/test_verbose.jl`` — every algorithm family reruns a
small solve with ``verbose=True`` so the display callback compiles and fires.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import proxtpu as pa
from proxtpu.prox import NormL1, SqrNormL2, Translate, make_least_squares

from problems import LASSO_A, LASSO_B, as_dtype


def setup(dtype=jnp.float64):
    A = as_dtype(LASSO_A, dtype)
    b = as_dtype(LASSO_B, dtype)
    lam = 0.1 * float(jnp.max(jnp.abs(A.conj().T @ b)))
    fA = make_least_squares(A, b)
    g = NormL1(lam)
    Lf = float(np.linalg.norm(np.asarray(LASSO_A), 2) ** 2)
    x0 = jnp.zeros(A.shape[1], dtype)
    return A, b, fA, g, Lf, x0


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("ForwardBackward", {}),
        ("FastForwardBackward", {}),
        ("ZeroFPR", {}),
        ("PANOC", {}),
        ("PANOCplus", {}),
        ("DRLS", {}),
    ],
)
def test_verbose_fb_family(capfd, name, kwargs):
    A, b, fA, g, Lf, x0 = setup()
    solver = getattr(pa, name)(tol=1e-4, verbose=True, freq=5, **kwargs)
    x, it = solver(x0=x0, f=fA, g=g, Lf=Lf)
    out = capfd.readouterr()
    assert "|" in out.out or "|" in out.err  # display rows fired


def test_verbose_douglas_rachford(capfd):
    A, b, fA, g, Lf, x0 = setup()
    solver = pa.DouglasRachford(tol=1e-4, verbose=True, freq=5)
    x, it = solver(x0=x0, f=fA, g=g, gamma=1.0)
    out = capfd.readouterr()
    assert "|" in out.out or "|" in out.err


def test_verbose_davis_yin(capfd):
    A, b, fA, g, Lf, x0 = setup()
    solver = pa.DavisYin(tol=1e-4, verbose=True, freq=5)
    x, it = solver(x0=x0, f=fA, g=NormL1(0.1), h=SqrNormL2(1.0), Lf=Lf)
    out = capfd.readouterr()
    assert "|" in out.out or "|" in out.err


def test_verbose_afba(capfd):
    A, b, fA, g, Lf, x0 = setup()
    solver = pa.AFBA(tol=1e-4, verbose=True, freq=5)
    (x, y), it = solver(
        x0=x0, y0=jnp.zeros(A.shape[0], x0.dtype), f=SqrNormL2(1.0),
        g=NormL1(1.0), h=Translate(SqrNormL2(1.0), -b), L=A, beta_f=1,
    )
    out = capfd.readouterr()
    assert "|" in out.out or "|" in out.err


def test_verbose_sfista(capfd):
    A, b, fA, g, Lf, x0 = setup()
    solver = pa.SFISTA(tol=1e-4, verbose=True, freq=5)
    x, it = solver(x0=x0, f=fA, g=g, Lf=Lf)
    out = capfd.readouterr()
    assert "|" in out.out or "|" in out.err


def test_verbose_batched_driver(capfd):
    """The batched driver's verbose contract: per-freq progress rows
    (converged-lane counts) printed from inside the jitted loop — the
    batched analogue of the reference's display
    (``ProximalAlgorithms.jl:118-121``)."""
    from proxtpu.algorithms.fast_forward_backward import (
        make_fast_forward_backward_iteration,
    )
    from proxtpu.parallel import BatchedAlgorithm, Shared
    from proxtpu.prox import LeastSquaresLoss

    A, b, fA, g, Lf, x0 = setup()
    solver = BatchedAlgorithm(
        make_fast_forward_backward_iteration, maxit=1000, tol=1e-6,
        verbose=True, freq=20,
    )
    lam = 0.1 * float(jnp.max(jnp.abs(A.conj().T @ b)))
    xs, iters, done = solver(
        x0=jnp.zeros((3,) + x0.shape, x0.dtype),
        f=Shared(LeastSquaresLoss(A, b)),
        g=NormL1(jnp.asarray([lam, 2 * lam, 4 * lam])),
        Lf=Lf,
    )
    jnp.asarray(xs).block_until_ready()
    out = capfd.readouterr().out
    assert bool(done.all())
    assert "lanes converged" in out
    assert "/3" in out
