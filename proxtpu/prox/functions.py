"""Proximable / smooth function library (ProximalOperators.jl equivalent).

This is the minimum function library the reference test/bench suite needs
(``SURVEY.md`` §1 L0): NormL1, LeastSquares, SqrNormL2, ElasticNet, Translate,
Linear, IndBox, IndNonnegative, IndPoint, IndAffine, SlicedSeparableSum
(see ``/root/reference/test/problems/*.jl``, ``benchmark/benchmarks.jl:1``),
plus smooth losses used by the TPU benchmark configs.

Everything is a frozen pytree dataclass (see :mod:`proxtpu.prox.base`): array
parameters are traced leaves, so a *batch* of functions (e.g. 10k lasso
instances) is just a stacked pytree under ``vmap``.  All proxes are written as
shape-preserving elementwise/VPU ops or batched MXU matmuls — no Python
control flow on data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.tree import (
    real_dtype_of,
    tree_inf_norm,
    tree_map,
    tree_scale,
    tree_sub,
    tree_vdot_real,
)
from .base import proxclass
from ..utils.precision import pdot, pmatvec



def _rparam(p, x):
    """Cast a scalar parameter to the iterate's real dtype (keeps the
    dtype-preservation contract even when a Python-float default became an
    f64 leaf under vmap/x64)."""
    return jnp.asarray(p, real_dtype_of(x))

def _rzero(x):
    return jnp.zeros((), real_dtype_of(x))


def _soft_threshold(x, thr):
    """Complex-safe soft-thresholding (prox of the l1 norm)."""
    absx = jnp.abs(x)
    scale = jnp.maximum(absx - thr, 0) / jnp.where(absx == 0, 1, absx)
    return x * scale.astype(x.dtype)


@proxclass
class NormL1:
    """f(x) = lam * ||x||_1 (complex-safe; prox is soft-thresholding).

    ``lam`` may be a nonnegative ARRAY broadcasting against the (single-leaf)
    iterate — the weighted l1 norm sum_i lam_i |x_i| with elementwise
    thresholds, as in ``ProximalOperators.NormL1(lambda::Array)``; e.g. the
    off-diagonal-only penalty of graphical lasso uses lam * (1 - I)."""

    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        leaves = jax.tree.leaves(x)
        lam = _rparam(self.lam, x)
        if getattr(lam, "ndim", 0):
            (leaf,) = leaves
            return jnp.sum(lam * jnp.abs(leaf))
        return lam * sum(jnp.sum(jnp.abs(l)) for l in leaves)

    def prox(self, x, gamma):
        lam = _rparam(self.lam, x)
        z = tree_map(lambda l: _soft_threshold(l, gamma * lam), x)
        return z, self(z)


@proxclass
class NormL2:
    """f(x) = lam * ||x||_2 (block soft-thresholding prox)."""

    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        from ..utils.tree import tree_norm

        return _rparam(self.lam, x) * tree_norm(x)

    def prox(self, x, gamma):
        from ..utils.tree import tree_norm

        nrm = tree_norm(x)
        lam = _rparam(self.lam, x)
        scale = jnp.maximum(1 - gamma * lam / jnp.where(nrm == 0, 1, nrm), 0)
        z = tree_scale(scale, x)
        return z, self(z)


@proxclass
class NuclearNorm:
    """f(X) = lam * ||X||_* (sum of singular values); prox is singular-value
    soft-thresholding — the regularizer of low-rank recovery / matrix
    completion.  The SVD runs on-device (jnp.linalg.svd); X must be a 2-D
    leaf."""

    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, X):
        s = jnp.linalg.svd(X, compute_uv=False)
        return _rparam(self.lam, X) * jnp.sum(s)

    def prox(self, X, gamma):
        U, s, Vh = jnp.linalg.svd(X, full_matrices=False)
        lam = _rparam(self.lam, X)
        s_thr = jnp.maximum(s - gamma * lam, 0)
        Z = pdot(U * s_thr[None, :].astype(U.dtype), Vh)
        return Z, lam * jnp.sum(s_thr)


@proxclass(meta_fields=("axis",))
class NormL21:
    """f(Y) = lam * sum_j ||Y[:, j]||_2 — the isotropic group l2,1 norm over
    ``axis`` (group soft-thresholding prox).  The TV-denoising regularizer:
    with Y the (2, H, W) forward-difference field of
    :class:`~proxtpu.ops.linops.Grad2DOperator`, ``NormL21(lam, axis=0)`` is
    isotropic total variation."""

    lam: object = 1.0
    axis: int = 0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, Y):
        nrm = jnp.sqrt(jnp.sum(jnp.abs(Y) ** 2, axis=self.axis))
        return _rparam(self.lam, Y) * jnp.sum(nrm)

    def prox(self, Y, gamma):
        lam = _rparam(self.lam, Y)
        nrm = jnp.sqrt(jnp.sum(jnp.abs(Y) ** 2, axis=self.axis, keepdims=True))
        scale = jnp.maximum(1 - gamma * lam / jnp.where(nrm == 0, 1, nrm), 0)
        Z = Y * scale.astype(Y.dtype)
        return Z, self(Z)


@proxclass
class SqrNormL2:
    """f(x) = lam/2 * ||x||^2 — both smooth and proxable."""

    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        return _rparam(self.lam, x) / 2 * tree_vdot_real(x, x)

    def value_and_gradient(self, x):
        return self(x), tree_scale(_rparam(self.lam, x), x)

    def prox(self, x, gamma):
        z = tree_scale(1 / (1 + gamma * _rparam(self.lam, x)), x)
        return z, self(z)


@proxclass
class ElasticNet:
    """f(x) = mu*||x||_1 + lam/2*||x||^2."""

    mu: object = 1.0
    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        l1 = sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(x))
        mu, lam = _rparam(self.mu, x), _rparam(self.lam, x)
        return mu * l1 + lam / 2 * tree_vdot_real(x, x)

    def prox(self, x, gamma):
        mu, lam = _rparam(self.mu, x), _rparam(self.lam, x)
        z = tree_map(
            lambda l: _soft_threshold(l, gamma * mu) / (1 + gamma * lam),
            x,
        )
        return z, self(z)


@proxclass
class Linear:
    """f(x) = <c, x>."""

    c: object

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        return tree_vdot_real(self.c, x)

    def value_and_gradient(self, x):
        return self(x), self.c

    def prox(self, x, gamma):
        z = tree_map(lambda xl, cl: xl - gamma * cl, x, self.c)
        return z, self(z)


@proxclass
class IndBox:
    """Indicator of the box {low <= x <= high} (real dtypes)."""

    low: object
    high: object

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        ok = jnp.array(True)
        for l in jax.tree.leaves(x):
            ok = ok & jnp.all(l >= self.low) & jnp.all(l <= self.high)
        R = real_dtype_of(x)
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        z = tree_map(lambda l: jnp.clip(l, self.low, self.high), x)
        return z, _rzero(x)


def IndNonnegative():
    """Indicator of the nonnegative orthant."""
    return IndBox(0.0, jnp.inf)


@proxclass
class IndPoint:
    """Indicator of the singleton {p}."""

    p: object

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        R = real_dtype_of(x)
        same = tree_inf_norm(tree_sub(x, self.p)) == 0
        return jnp.where(same, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        return self.p, _rzero(x)


@proxclass
class IndAffine:
    """Indicator of {x : Ax = b}; prox is the affine projection.

    The Gram factor chol(A A^H) is precomputed at construction so each
    projection is two triangular solves plus two matvecs (MXU-friendly).
    """

    A: object
    b: object
    chol: object

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        R = real_dtype_of(x)
        feas = jnp.max(jnp.abs(pdot(self.A, x) - self.b)) <= 1e3 * jnp.finfo(R).eps
        return jnp.where(feas, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        resid = pdot(self.A, x) - self.b
        w = jax.scipy.linalg.cho_solve((self.chol, True), resid)
        z = x - pdot(self.A.conj().T, w)
        return z, _rzero(x)


def make_ind_affine(A, b):
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    gram = pdot(A, A.conj().T)
    chol = jax.scipy.linalg.cholesky(gram, lower=True)
    return IndAffine(A, b, chol)


@proxclass(meta_fields=("wide",))
class LeastSquares:
    """f(x) = lam/2 * ||A x - b||^2 — smooth *and* proxable.

    The prox solves (I + c A^H A) z = x + c A^H b with c = lam*gamma, via a
    precomputed eigendecomposition of the smaller Gram matrix (Woodbury when
    A is wide), so a prox costs two matvecs for any gamma.  Mirrors
    ``ProximalOperators.LeastSquares`` (used at
    ``test/problems/test_lasso_small.jl:36``).
    """

    A: object
    b: object
    lam: object
    U: object  # eigenvectors of the (smaller) Gram matrix
    s: object  # eigenvalues of the (smaller) Gram matrix
    Atb: object
    wide: bool  # static: whether m < n (Woodbury path)

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        r = pdot(self.A, x) - self.b
        return _rparam(self.lam, x) / 2 * jnp.real(jnp.vdot(r, r))

    def value_and_gradient(self, x):
        r = pdot(self.A, x) - self.b
        lam = _rparam(self.lam, x)
        val = lam / 2 * jnp.real(jnp.vdot(r, r))
        return val, lam * pdot(self.A.conj().T, r)

    def prox(self, x, gamma):
        c = _rparam(self.lam, x) * gamma
        rhs = x + c * self.Atb
        if self.wide:
            # Woodbury: (I + c A^H A)^{-1} v = v - c A^H (I + c A A^H)^{-1} A v
            w = pdot(self.A, rhs)
            w = pdot(self.U, (pdot(self.U.conj().T, w) / (1 + c * self.s)).astype(w.dtype))
            z = rhs - c * pdot(self.A.conj().T, w)
        else:
            z = pdot(self.U, (pdot(self.U.conj().T, rhs) / (1 + c * self.s)).astype(rhs.dtype))
        return z, self(z)


def make_least_squares(A, b, lam=1.0):
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    m, n = A.shape
    wide = m < n
    # pdot even at construction: these run eagerly on the default (TPU) device
    # and the Gram eigendecomposition / Atb are baked into every prox call.
    gram = pdot(A, A.conj().T) if wide else pdot(A.conj().T, A)
    s, U = jnp.linalg.eigh(gram)
    return LeastSquares(A, b, lam, U, s, pdot(A.conj().T, b), wide)


@proxclass
class LeastSquaresLoss:
    """f(x) = lam/2 ||A x - b||^2 as a *smooth-only* oracle (no prox, no
    factorization at construction) — the cheap batched form for the
    FB-family where only ``value_and_gradient`` is needed; two MXU matvecs
    per call, vmaps to batched matmuls."""

    A: object
    b: object
    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        r = pdot(self.A, x) - self.b
        return _rparam(self.lam, x) / 2 * jnp.real(jnp.vdot(r, r))

    def value_and_gradient(self, x):
        r = pdot(self.A, x) - self.b
        lam = _rparam(self.lam, x)
        val = lam / 2 * jnp.real(jnp.vdot(r, r))
        return val, lam * pdot(self.A.conj().T, r)


@proxclass
class Translate:
    """g(x) = f(x + t) (ProximalOperators.Translate)."""

    f: object
    t: object

    @property
    def is_convex(self):
        return getattr(self.f, "is_convex", False)

    @property
    def is_generalized_quadratic(self):
        return getattr(self.f, "is_generalized_quadratic", False)

    def __call__(self, x):
        return self.f(tree_map(jnp.add, x, self.t))

    def value_and_gradient(self, x):
        from .base import value_and_gradient

        return value_and_gradient(self.f, tree_map(jnp.add, x, self.t))

    def prox(self, x, gamma):
        z_shift, f_z = self.f.prox(tree_map(jnp.add, x, self.t), gamma)
        return tree_map(jnp.subtract, z_shift, self.t), f_z


@proxclass
class Quadratic:
    """f(x) = x'Qx/2 + q'x with a hand-written gradient oracle.

    Mirrors the ``Quadratic`` test fixture (``test/runtests.jl:6-16``) that
    exercises the bring-your-own-gradient seam.
    """

    Q: object
    q: object

    is_convex = False  # Q may be indefinite (nonconvex QP tests)
    is_generalized_quadratic = True

    def __call__(self, x):
        # pmatvec: keeps per-lane matvec semantics when Q/x carry a stacked
        # leading batch axis (eager batched construction, e.g. LiLin's
        # feasibility check before the vmapped solve)
        return (
            jnp.real(jnp.vdot(x, pmatvec(self.Q, x))) / 2
            + tree_vdot_real(self.q, x)
        )

    def value_and_gradient(self, x):
        Qx = pmatvec(self.Q, x)
        grad = Qx + self.q
        val = jnp.real(jnp.vdot(x, Qx)) / 2 + tree_vdot_real(self.q, x)
        return val, grad


@proxclass
class LogisticLoss:
    """f(u) = sum(softplus(-u)) — logistic loss with all-one labels.

    Numerically stable value and gradient (grad = sigmoid(u) - 1); matches
    the test problem at ``test/problems/test_sparse_logistic_small.jl:20-23``.
    """

    scale: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, u):
        scale = _rparam(self.scale, u)
        return scale * sum(
            jnp.sum(jax.nn.softplus(-l)) for l in jax.tree.leaves(u)
        )

    def value_and_gradient(self, u):
        val = self(u)
        scale = _rparam(self.scale, u)
        grad = tree_map(lambda l: scale * (jax.nn.sigmoid(l) - 1), u)
        return val, grad


@proxclass
class HuberLoss:
    """f(x) = ||x||^2/2 if ||x|| <= rho, else rho(||x|| - rho/2), scaled by
    mu — the smooth robust loss (``ProximalOperators.HuberLoss``).  Smooth
    with a hand gradient; also proxable (prox of the Moreau-smoothed norm).
    """

    rho: object = 1.0
    mu: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        from ..utils.tree import tree_norm

        rho, mu = _rparam(self.rho, x), _rparam(self.mu, x)
        nrm = tree_norm(x)
        return mu * jnp.where(
            nrm <= rho, nrm * nrm / 2, rho * (nrm - rho / 2)
        )

    def value_and_gradient(self, x):
        from ..utils.tree import tree_norm

        rho, mu = _rparam(self.rho, x), _rparam(self.mu, x)
        nrm = tree_norm(x)
        val = mu * jnp.where(nrm <= rho, nrm * nrm / 2, rho * (nrm - rho / 2))
        scale = mu * jnp.where(nrm <= rho, 1.0, rho / jnp.maximum(nrm, rho))
        return val, tree_scale(scale, x)

    def prox(self, x, gamma):
        from ..utils.tree import tree_norm

        rho, mu = _rparam(self.rho, x), _rparam(self.mu, x)
        nrm = tree_norm(x)
        c = gamma * mu
        # quadratic region: shrink by 1/(1+c); linear region: radial soft step
        scale = jnp.where(
            nrm <= rho * (1 + c),
            1 / (1 + c),
            1 - c * rho / jnp.maximum(nrm, rho * (1 + c)),
        )
        z = tree_scale(scale, x)
        return z, self(z)


@proxclass
class IndSimplex:
    """Indicator of the probability simplex {x >= 0, sum x = a}; prox is the
    Euclidean projection via the sorted-threshold algorithm
    (Held-Wolfe-Crowder; ``ProximalOperators.IndSimplex``) — one jnp.sort,
    fully jittable with static shapes."""

    a: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        R = real_dtype_of(x)
        a = _rparam(self.a, x)
        leaves = jax.tree.leaves(x)
        s = sum(jnp.sum(l) for l in leaves)
        ok = jnp.array(True)
        for l in leaves:
            ok = ok & jnp.all(l >= -1e3 * jnp.finfo(R).eps)
        ok = ok & (jnp.abs(s - a) <= 1e3 * jnp.finfo(R).eps * (1 + a))
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)  # single flat vector
        a = _rparam(self.a, leaf)
        n = leaf.shape[-1]
        u = jnp.sort(leaf)[::-1]
        css = jnp.cumsum(u) - a
        ks = jnp.arange(1, n + 1, dtype=leaf.dtype)
        cond = u - css / ks > 0
        k = jnp.sum(cond.astype(jnp.int32))
        tau = css[k - 1] / k.astype(leaf.dtype)
        z = jnp.maximum(leaf - tau, 0)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, _rzero(x)


@proxclass
class IndBallL2:
    """Indicator of the l2 ball {||x|| <= r}; prox is radial projection."""

    r: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        from ..utils.tree import tree_norm

        R = real_dtype_of(x)
        r = _rparam(self.r, x)
        ok = tree_norm(x) <= r * (1 + 1e3 * jnp.finfo(R).eps)
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        from ..utils.tree import tree_norm

        r = _rparam(self.r, x)
        nrm = tree_norm(x)
        z = tree_scale(jnp.where(nrm > r, r / jnp.maximum(nrm, r), 1.0), x)
        return z, _rzero(x)


@proxclass
class IndBallL1:
    """Indicator of the l1 ball {||x||_1 <= r}; projection by simplex
    projection of |x| (sort-based, jittable)."""

    r: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        R = real_dtype_of(x)
        r = _rparam(self.r, x)
        l1 = sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(x))
        ok = l1 <= r * (1 + 1e3 * jnp.finfo(R).eps)
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        r = _rparam(self.r, leaf)
        absx = jnp.abs(leaf)
        inside = jnp.sum(absx) <= r
        proj, _ = IndSimplex(r).prox(absx, gamma)
        z = jnp.where(inside, leaf, jnp.sign(leaf) * proj)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, _rzero(x)


@proxclass
class SumPositive:
    """f(x) = sum(max(x, 0)) (``ProximalOperators.SumPositive``); the prox
    shifts positive entries down by gamma (one-sided soft threshold)."""

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        return sum(
            jnp.sum(jnp.maximum(l, 0)) for l in jax.tree.leaves(x)
        )

    def prox(self, x, gamma):
        z = tree_map(
            lambda l: jnp.where(l > gamma, l - gamma, jnp.minimum(l, 0)), x
        )
        return z, self(z)


@proxclass
class SqrDistance:
    """f(x) = ||x - b||^2 / 2 (the benchmark's SquaredDistance,
    ``benchmark/benchmarks.jl:20-27``)."""

    b: object

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        d = tree_sub(x, self.b)
        return tree_vdot_real(d, d) / 2

    def value_and_gradient(self, x):
        d = tree_sub(x, self.b)
        return tree_vdot_real(d, d) / 2, d

    def prox(self, x, gamma):
        z = tree_map(lambda xl, bl: (xl + gamma * bl) / (1 + gamma), x, self.b)
        return z, self(z)


@proxclass
class NormL0:
    """f(x) = lam * ||x||_0 (number of nonzeros; NONCONVEX).

    Prox is hard thresholding: keep entries with |x_i| > sqrt(2 gamma lam)
    (``ProximalOperators.NormL0``); pairs with the nonconvex solvers
    (PANOC/ZeroFPR/LiLin) like the reference's nonconvex box-QP family
    (``test/problems/test_nonconvex_qp.jl``)."""

    lam: object = 1.0

    is_convex = False
    is_generalized_quadratic = False

    def __call__(self, x):
        lam = _rparam(self.lam, x)
        return lam * sum(
            jnp.sum((jnp.abs(l) > 0).astype(real_dtype_of(x)))
            for l in jax.tree.leaves(x)
        )

    def prox(self, x, gamma):
        lam = _rparam(self.lam, x)
        thr = jnp.sqrt(2 * gamma * lam)
        z = tree_map(
            lambda l: jnp.where(jnp.abs(l) > thr, l, jnp.zeros((), l.dtype)),
            x,
        )
        return z, self(z)


@proxclass
class HingeLoss:
    """f(x) = mu * sum_i max(0, 1 - y_i x_i) — the SVM hinge loss
    (``ProximalOperators.HingeLoss``).  y must be +-1-valued (same shape as
    x); the prox is separable and closed-form:

    with v = y*x (so the problem per coordinate is
    ``min mu*gamma*max(0, 1-u) + (u-v)^2/2``):
    u = v for v >= 1, u = min(v + mu*gamma, 1) otherwise; z = y*u."""

    y: object
    mu: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        mu = _rparam(self.mu, x)
        return mu * sum(
            jnp.sum(jnp.maximum(0, 1 - yl * xl))
            for yl, xl in zip(jax.tree.leaves(self.y), jax.tree.leaves(x))
        )

    def prox(self, x, gamma):
        mu = _rparam(self.mu, x)

        def one(yl, xl):
            v = yl * xl
            u = jnp.where(v >= 1, v, jnp.minimum(v + mu * gamma, 1))
            return yl * u

        z = tree_map(one, self.y, x)
        return z, self(z)


@proxclass
class IndBallLinf:
    """Indicator of the l-inf ball {max_i |x_i| <= r}; the prox projects each
    entry onto the radius-r disk (complex-safe clip)."""

    r: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        r = _rparam(self.r, x)
        ok = jnp.array(True)
        for l in jax.tree.leaves(x):
            # tolerate one-ULP projection roundoff like IndSimplex/IndBallL2
            eps = jnp.finfo(real_dtype_of(x)).eps
            ok = ok & jnp.all(jnp.abs(l) <= r * (1 + 10 * eps))
        R = real_dtype_of(x)
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        r = _rparam(self.r, x)

        def clipd(l):
            a = jnp.abs(l)
            scale = jnp.minimum(1.0, r / jnp.where(a == 0, 1, a))
            return l * scale.astype(l.dtype)

        return tree_map(clipd, x), _rzero(x)


@proxclass
class NormLinf:
    """f(x) = lam * max_i |x_i| (``ProximalOperators.NormLinf``; dual of
    the l1 norm).  Prox by Moreau decomposition against the l1-ball
    projection: prox_{gamma f}(x) = x - P_{B1(gamma*lam)}(x) — one sort,
    fully jittable, complex-safe (phase-preserving).  Single array leaf
    (same contract as :class:`IndBallL1`, whose projection it reuses)."""

    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        lam = _rparam(self.lam, x)
        return lam * tree_inf_norm(x)

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        lam = _rparam(self.lam, leaf)
        gamma = _rparam(gamma, leaf)
        p, _ = IndBallL1(gamma * lam).prox(leaf, gamma)
        z = leaf - p
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, self(zt)


@proxclass
class IndHalfspace:
    """Indicator of the halfspace {<a, x> <= b} (real dtypes); the prox is
    the affine projection x - max(0, (<a,x> - b)/||a||^2) a."""

    a: object
    b: object = 0.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        b = _rparam(self.b, x)
        dot = tree_vdot_real(self.a, x)
        eps = jnp.finfo(real_dtype_of(x)).eps
        slack = 100 * eps * (1 + jnp.abs(b))
        R = real_dtype_of(x)
        return jnp.where(
            dot <= b + slack, jnp.zeros((), R), jnp.asarray(jnp.inf, R)
        )

    def prox(self, x, gamma):
        b = _rparam(self.b, x)
        dot = tree_vdot_real(self.a, x)
        asq = tree_vdot_real(self.a, self.a)
        t = jnp.maximum(0, (dot - b) / jnp.where(asq == 0, 1, asq))
        z = tree_map(lambda xl, al: xl - t * al, x, self.a)
        return z, _rzero(x)


@proxclass
class IndPSD:
    """Indicator of the positive-semidefinite cone (symmetric 2-D leaf);
    the prox clamps negative eigenvalues to zero (on-device eigh)."""

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, X):
        w = jnp.linalg.eigvalsh((X + X.T.conj()) / 2)
        eps = jnp.finfo(real_dtype_of(X)).eps
        tol = 100 * eps * jnp.maximum(1.0, jnp.max(jnp.abs(w)))
        R = real_dtype_of(X)
        return jnp.where(
            jnp.min(w) >= -tol, jnp.zeros((), R), jnp.asarray(jnp.inf, R)
        )

    def prox(self, X, gamma):
        w, V = jnp.linalg.eigh((X + X.T.conj()) / 2)
        wpos = jnp.maximum(w, 0)
        Z = pdot(V * wpos[None, :].astype(V.dtype), V.T.conj())
        return Z, _rzero(X)


@proxclass
class IndSphereL2:
    """Indicator of the l2 SPHERE {||x|| = r} (NONCONVEX; the boundary of
    :class:`IndBallL2`).  Prox is radial projection r*x/||x||
    (``ProximalOperators.IndSphereL2``); the x=0 singularity projects to
    r*e_1 (any point is valid — a deterministic convention keeps the jitted
    map pure)."""

    r: object = 1.0

    is_convex = False
    is_generalized_quadratic = False

    def __call__(self, x):
        from ..utils.tree import tree_norm

        r = _rparam(self.r, x)
        nrm = tree_norm(x)
        eps = jnp.finfo(real_dtype_of(x)).eps
        R = real_dtype_of(x)
        ok = jnp.abs(nrm - r) <= 100 * eps * (1 + r)
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        from ..utils.tree import tree_norm

        r = _rparam(self.r, x)
        nrm = tree_norm(x)
        safe = jnp.where(nrm == 0, 1, nrm)
        z = tree_map(lambda l: (r / safe).astype(l.dtype) * l, x)
        # deterministic convention at the singularity: project 0 -> r*e_1
        # with e_1 in the FIRST leaf only (so multi-leaf iterates still
        # land ON the sphere, not at radius r*sqrt(num_leaves))
        leaves, treedef = jax.tree.flatten(z)
        fixed = []
        for i, l in enumerate(leaves):
            if i == 0:
                e1 = (
                    jnp.zeros_like(l).reshape(-1).at[0].set(1)
                    .reshape(l.shape)
                )
                fixed.append(jnp.where(nrm == 0, r.astype(l.dtype) * e1, l))
            else:
                fixed.append(jnp.where(nrm == 0, jnp.zeros_like(l), l))
        return jax.tree.unflatten(treedef, fixed), _rzero(x)


@proxclass
class LogBarrier:
    """f(x) = -mu * sum_i log(x_i) on the positive orthant (the
    interior-point barrier; ``ProximalOperators.SumNegativeLogarithm``
    analogue).  Closed-form prox per coordinate:
    z = (x + sqrt(x^2 + 4 gamma mu)) / 2 > 0."""

    mu: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        mu = _rparam(self.mu, x)
        R = real_dtype_of(x)
        ok = jnp.array(True)
        val = jnp.zeros((), R)
        for l in jax.tree.leaves(x):
            ok = ok & jnp.all(l > 0)
            val = val - mu * jnp.sum(jnp.log(jnp.where(l > 0, l, 1)))
        return jnp.where(ok, val, jnp.asarray(jnp.inf, R))

    def value_and_gradient(self, x):
        mu = _rparam(self.mu, x)
        grad = tree_map(lambda l: -mu / l, x)
        return self(x), grad

    def prox(self, x, gamma):
        mu = _rparam(self.mu, x)
        z = tree_map(
            lambda l: (l + jnp.sqrt(l * l + 4 * gamma * mu)) / 2, x
        )
        return z, self(z)


@proxclass
class IndSOC:
    """Indicator of the second-order (Lorentz) cone
    {(t, x) : ||x||_2 <= t} on a flat vector whose FIRST coordinate is t
    (``ProximalOperators.IndSOC`` convention).  Closed-form projection:
    the point itself inside the cone, 0 inside the polar cone
    (||x|| <= -t), and otherwise ((t + ||x||)/2) * (1, x/||x||).
    Real dtypes, single array leaf."""

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        t, v = leaf[0], leaf[1:]
        nrm = jnp.sqrt(jnp.sum(v * v))
        eps = jnp.finfo(R).eps
        ok = nrm <= t * (1 + 10 * eps) + 10 * eps
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        t, v = leaf[0], leaf[1:]
        nrm = jnp.sqrt(jnp.sum(v * v))
        alpha = (t + nrm) / 2
        scale = alpha / jnp.where(nrm == 0, 1, nrm)
        z_mid = jnp.concatenate([alpha[None], scale * v])
        z = jnp.where(
            nrm <= t, leaf,
            jnp.where(nrm <= -t, jnp.zeros_like(leaf), z_mid),
        )
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, _rzero(x)


@proxclass
class NormL1plusL2:
    """f(x) = lam1 ||x||_1 + lam2 ||x||_2 — the sparse-group-lasso
    regularizer (``ProximalOperators.NormL1plusL2``).  The prox composes:
    block soft-threshold (NormL2) after elementwise soft-threshold
    (NormL1), which is exact for this sum.  Complex-safe."""

    lam1: object = 1.0
    lam2: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        lam1 = _rparam(self.lam1, x)
        lam2 = _rparam(self.lam2, x)
        l1 = sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(x))
        sq = sum(jnp.sum(jnp.abs(l) ** 2) for l in jax.tree.leaves(x))
        return lam1 * l1 + lam2 * jnp.sqrt(sq)

    def prox(self, x, gamma):
        lam1 = _rparam(self.lam1, x)
        u = tree_map(lambda l: _soft_threshold(l, gamma * lam1), x)
        z, _ = NormL2(self.lam2).prox(u, gamma)
        return z, self(z)


@proxclass(meta_fields=("k",))
class IndBallL0:
    """Indicator of the l0 ball {||x||_0 <= k} (NONCONVEX;
    ``ProximalOperators.IndBallL0``).  The prox keeps the k
    largest-magnitude entries (hard top-k / iterative hard thresholding —
    pair with PANOC/ZeroFPR/LiLin).  Ties break toward lower index
    (stable argsort), matching a deterministic projection choice.
    Single array leaf; k is static."""

    k: int = 1

    is_convex = False
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        nnz = jnp.sum(jnp.abs(leaf) > 0)
        return jnp.where(
            nnz <= self.k, jnp.zeros((), R), jnp.asarray(jnp.inf, R)
        )

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        flat = leaf.reshape(-1)
        order = jnp.argsort(-jnp.abs(flat), stable=True)
        keep = jnp.zeros(flat.shape, bool).at[order[: self.k]].set(True)
        z = jnp.where(keep, flat, 0).reshape(leaf.shape)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, _rzero(x)


@proxclass
class DistL2:
    """f(x) = lam * dist_C(x) = lam * ||x - P_C(x)|| for a convex set C
    given by an indicator object with an exact projection prox
    (``ProximalOperators.DistL2``).  Prox: move toward the projection by
    min(1, gamma*lam / dist) of the way; the value at the prox point is
    lam * max(dist - gamma*lam, 0)."""

    ind: object
    lam: object = 1.0

    @property
    def is_convex(self):
        return getattr(self.ind, "is_convex", False)

    is_generalized_quadratic = False

    def _proj_dist(self, x):
        p, _ = self.ind.prox(x, 1.0)
        d = tree_sub(x, p)
        return p, jnp.sqrt(tree_vdot_real(d, d))

    def __call__(self, x):
        _, d = self._proj_dist(x)
        return _rparam(self.lam, x) * d

    def prox(self, x, gamma):
        lam = _rparam(self.lam, x)
        gamma = _rparam(gamma, x)
        p, d = self._proj_dist(x)
        step = jnp.minimum(1.0, gamma * lam / jnp.where(d == 0, 1, d))
        z = tree_map(lambda xl, pl: xl + step.astype(xl.dtype) * (pl - xl),
                     x, p)
        return z, lam * jnp.maximum(d - gamma * lam, 0)


@proxclass
class SqrHingeLoss:
    """f(x) = mu * sum_i max(0, 1 - y_i x_i)^2 — the squared (L2) hinge
    loss (``ProximalOperators.SqrHingeLoss``): smooth (gradient
    2*mu*y*(y*x - 1) on the active set), so it pairs with the
    forward-backward family as the f term; the prox is separable and
    closed-form for GENERAL y (not just +-1 labels): coordinates with
    y*x >= 1 are fixed points, active coordinates solve
    (1 + 2*mu*gamma*y^2) z = x + 2*mu*gamma*y."""

    y: object
    mu: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        mu = _rparam(self.mu, x)
        return mu * sum(
            jnp.sum(jnp.maximum(0, 1 - yl * xl) ** 2)
            for yl, xl in zip(jax.tree.leaves(self.y), jax.tree.leaves(x))
        )

    def value_and_gradient(self, x):
        mu = _rparam(self.mu, x)
        g = tree_map(
            lambda yl, xl: -2 * mu * yl * jnp.maximum(0, 1 - yl * xl),
            self.y, x,
        )
        return self(x), g

    def prox(self, x, gamma):
        mu = _rparam(self.mu, x)

        def one(yl, xl):
            # active coordinates (y*z < 1 at the solution) solve the
            # stationarity equation of mu*(1 - y*u)^2 + (u - x)^2/(2g);
            # the two branches agree on the boundary, and y = 0 makes
            # the coordinate a fixed point (its term is constant)
            zl = (xl + 2 * mu * gamma * yl) / (1 + 2 * mu * gamma * yl * yl)
            return jnp.where(yl * xl >= 1, xl, zl)

        z = tree_map(one, self.y, x)
        return z, self(z)


def _capped_simplex_proj(y, cap, total, iters=100):
    """Projection onto {0 <= s <= cap, sum s = total} (flat vector):
    s = clip(y - tau, 0, cap) with tau found by bisection on the monotone
    map tau -> sum clip(y - tau).  Fixed ``iters`` halvings (jittable; 100
    brackets any f64 range to below 1 ulp)."""
    lo = jnp.min(y) - cap
    hi = jnp.max(y)

    def body(_, c):
        lo, hi = c
        mid = (lo + hi) / 2
        s = jnp.sum(jnp.clip(y - mid, 0, cap))
        too_big = s > total
        return (jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.clip(y - (lo + hi) / 2, 0, cap)


@proxclass(meta_fields=("k",))
class IndCappedSimplex:
    """Indicator of the capped simplex {0 <= x <= cap, sum x = k*cap}
    (k slots of size cap; with cap=1 the vertex set is the k-hot binary
    vectors — the convex hull of exact-k selections).  Projection by
    bisection on the clip threshold.  Single real array leaf; k static."""

    k: int = 1
    cap: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def _check_k(self, leaf):
        # k and leaf.size are both static: catch the empty set at trace
        # time instead of silently "projecting" onto nothing
        if not 1 <= self.k <= leaf.size:
            raise ValueError(
                f"IndCappedSimplex(k={self.k}) on a size-{leaf.size} "
                "iterate: the set {0<=x<=cap, sum x = k*cap} is empty "
                "unless 1 <= k <= size"
            )

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        self._check_k(leaf)
        R = real_dtype_of(leaf)
        cap = _rparam(self.cap, leaf)
        eps = jnp.finfo(R).eps
        tol = 1e3 * eps * (1 + self.k) * jnp.maximum(cap, 1)
        ok = (
            jnp.all(leaf >= -tol)
            & jnp.all(leaf <= cap + tol)
            & (jnp.abs(jnp.sum(leaf) - self.k * cap) <= tol * leaf.size)
        )
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        self._check_k(leaf)
        cap = _rparam(self.cap, leaf)
        z = _capped_simplex_proj(
            leaf.reshape(-1), cap, self.k * cap
        ).reshape(leaf.shape)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, _rzero(x)


@proxclass(meta_fields=("k",))
class SumLargest:
    """f(x) = lam * (sum of the k largest ENTRIES of x) — the support
    function of the capped simplex {0 <= s <= 1, sum s = k}
    (``ProximalOperators.SumLargest``).  Prox by Moreau against the
    capped-simplex projection:

        prox_{gamma f}(x) = x - P_{{0<=s<=gamma*lam, sum s = gamma*lam*k}}(x)

    Convex; single real array leaf; k static.  With k=1 this is
    lam * max(x) (the Maximum function)."""

    k: int = 1
    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        lam = _rparam(self.lam, leaf)
        top = jax.lax.top_k(leaf.reshape(-1), self.k)[0]
        return lam * jnp.sum(top)

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        if not 1 <= self.k <= leaf.size:
            raise ValueError(
                f"SumLargest(k={self.k}) on a size-{leaf.size} iterate: "
                "need 1 <= k <= size"
            )
        lam = _rparam(self.lam, leaf)
        gamma = _rparam(gamma, leaf)
        c = gamma * lam
        p = _capped_simplex_proj(leaf.reshape(-1), c, c * self.k)
        z = (leaf.reshape(-1) - p).reshape(leaf.shape)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, self(zt)


def Maximum(lam=1.0):
    """f(x) = lam * max(x) (``ProximalOperators.Maximum``) — the k=1 case
    of :class:`SumLargest`."""
    return SumLargest(1, lam)


@proxclass
class NegLogDet:
    """f(X) = -mu * logdet(X) on symmetric positive-definite 2-D leaves
    (+inf outside the PD cone) — the barrier term of graphical lasso /
    sparse inverse covariance (the reference's ecosystem ships it as
    ``ProximalOperators.LogBarrier`` on matrices; here it is its own class
    so the eigendecomposition prox is explicit).

    The prox diagonalizes the symmetrized input (on-device ``eigh``) and
    solves the scalar problem per eigenvalue:

        min_z -mu*log z + (z - w)^2 / (2 gamma)
        =>  z = (w + sqrt(w^2 + 4 gamma mu)) / 2   (always > 0)

    so ``prox_{gamma f}`` maps ANY symmetric matrix into the PD cone.
    """

    mu: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, X):
        w = jnp.linalg.eigvalsh((X + X.T.conj()) / 2)
        R = real_dtype_of(X)
        mu = _rparam(self.mu, X)
        safe = jnp.maximum(w, jnp.finfo(R).tiny)
        val = -mu * jnp.sum(jnp.log(safe))
        return jnp.where(jnp.min(w) > 0, val, jnp.asarray(jnp.inf, R))

    def prox(self, X, gamma):
        w, V = jnp.linalg.eigh((X + X.T.conj()) / 2)
        mu = _rparam(self.mu, X)
        gamma = _rparam(gamma, X)
        z = (w + jnp.sqrt(w * w + 4 * gamma * mu)) / 2
        Z = pdot(V * z[None, :].astype(V.dtype), V.T.conj())
        return Z, -mu * jnp.sum(jnp.log(z))


@proxclass
class CubeNormL2:
    """f(x) = lam * ||x||_2^3 (``ProximalOperators.CubeNormL2``).  The prox
    is a radial shrink: with r = ||x||_2, the minimizer z = (s/r) x where
    s >= 0 solves 3*lam*gamma*s^2 + s - r = 0, i.e.

        s = (-1 + sqrt(1 + 12 lam gamma r)) / (6 lam gamma)

    (s -> r as lam*gamma -> 0; the formula below is algebraically
    rearranged to its catastrophic-cancellation-free form
    s = 2r / (1 + sqrt(1 + 12 lam gamma r)), exact at lam*gamma = 0)."""

    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        lam = _rparam(self.lam, leaf)
        r = jnp.sqrt(tree_vdot_real(x, x))
        return lam * r**3

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        lam = _rparam(self.lam, leaf)
        gamma = _rparam(gamma, leaf)
        r = jnp.sqrt(tree_vdot_real(x, x))
        s = 2 * r / (1 + jnp.sqrt(1 + 12 * lam * gamma * r))
        scale = jnp.where(r == 0, 0.0, s / jnp.where(r == 0, 1.0, r))
        z = tree_map(lambda l: l * scale.astype(l.dtype), x)
        return z, lam * s**3


@proxclass
class IndBinary:
    """Indicator of {low, high}^n (componentwise two-point set,
    ``ProximalOperators.IndBinary``).  Nonconvex; the prox snaps each entry
    to the nearer of the two values (ties go to ``low``, matching
    round-half-down determinism under jit)."""

    low: object = 0.0
    high: object = 1.0

    is_convex = False
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        lo = _rparam(self.low, leaf)
        hi = _rparam(self.high, leaf)
        ok = jnp.all((leaf == lo) | (leaf == hi))
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        def snap(l):
            lo = _rparam(self.low, l).astype(l.dtype)
            hi = _rparam(self.high, l).astype(l.dtype)
            return jnp.where(jnp.abs(l - hi) < jnp.abs(l - lo), hi, lo)

        z = tree_map(snap, x)
        return z, _rzero(jax.tree.leaves(x)[0])


@proxclass
class IndStiefel:
    """Indicator of the Stiefel manifold {X : X^H X = I} (2-D leaf, n >= p).
    Nonconvex; the prox (nearest-point projection in Frobenius norm) is the
    polar factor U @ Vh from the thin SVD (``ProximalOperators.IndStiefel``).
    Rank-deficient inputs project to A valid point (the SVD's choice of
    null directions), as in the reference."""

    is_convex = False
    is_generalized_quadratic = False

    def __call__(self, X):
        R = real_dtype_of(X)
        G = pdot(X.T.conj(), X)
        eye = jnp.eye(G.shape[0], dtype=G.dtype)
        eps = jnp.finfo(R).eps
        ok = jnp.max(jnp.abs(G - eye)) <= 100 * eps * max(1, X.shape[0])
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, X, gamma):
        U, _, Vh = jnp.linalg.svd(X, full_matrices=False)
        return pdot(U, Vh), _rzero(X)


@proxclass
class CrossEntropy:
    """f(x) = -(1/n) sum_i [ b_i log(x_i) + (1 - b_i) log(1 - x_i) ] for
    x in (0,1)^n and labels b in [0,1]^n (``ProximalOperators.CrossEntropy``).
    Smooth on its open domain — used as the f term with AD supplying the
    gradient; there is no closed-form prox."""

    b: object

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        b = jnp.asarray(self.b, real_dtype_of(leaf))
        return -jnp.mean(b * jnp.log(leaf) + (1 - b) * jnp.log1p(-leaf))


def _expcone_project(v):
    """Euclidean projection of one 3-vector onto the exponential cone

        K = cl{(x, y, z) : y > 0,  y * exp(x/y) <= z}.

    Candidate-selection scheme (branchless, jit/vmap-safe): generate every
    candidate the KKT case analysis can produce, mask the infeasible ones,
    return the closest —

    * ``v`` itself (covers v in K),
    * ``0`` (covers v in the polar cone),
    * the 2-D face ``(min(x,0), 0, max(z,0))`` and its numerical-underflow
      neighbour ``(min(x,0), max(y,0), max(z,0))`` (exact once y*exp(x/y)
      underflows — the alpha -> -inf limit of the boundary system),
    * up to 4 roots of the curved-boundary KKT system: with
      alpha = x/y, E = exp(alpha), the stationarity conditions reduce to
      mu(alpha) = (v1 - alpha v2) / (E (1 - alpha + alpha^2)) and the
      scalar equation h(alpha) = (v2 - mu E (1-alpha)) E - mu - v3 = 0,
      bracketed on a 513-point grid over [-40, 40] and bisected 90 steps
      (exp(+-40) already drives the complementary terms below roundoff,
      so the grid bounds are not a practical restriction).

    Accuracy is that of the input dtype; use float64 (x64) when the
    certificate matters.  Validated against scipy SLSQP and the full
    KKT/Moreau certificate battery in ``tests/test_expcone.py``.
    """
    dtype = v.dtype
    big = jnp.log(jnp.finfo(dtype).max) * 0.98

    def exp_safe(a):
        return jnp.exp(jnp.clip(a, -big, big))

    v1, v2, v3 = v[0], v[1], v[2]

    def h_and_mu(a):
        E = exp_safe(a)
        mu = (v1 - a * v2) / (E * (1 - a + a * a))
        return (v2 - mu * E * (1 - a)) * E - mu - v3, mu, E

    grid = jnp.linspace(jnp.asarray(-40.0, dtype), jnp.asarray(40.0, dtype),
                        513)
    vals = jax.vmap(lambda a: h_and_mu(a)[0])(grid)
    flip = vals[:-1] * vals[1:] <= 0
    idx = jnp.flatnonzero(flip, size=4, fill_value=0)
    lo, hi = grid[idx], grid[idx + 1]
    f_lo = jax.vmap(lambda a: h_and_mu(a)[0])(lo)

    def bisect(_, c):
        lo, hi, f_lo = c
        mid = (lo + hi) / 2
        f_mid = jax.vmap(lambda a: h_and_mu(a)[0])(mid)
        keep_lo = f_lo * f_mid <= 0
        return (jnp.where(keep_lo, lo, mid), jnp.where(keep_lo, mid, hi),
                jnp.where(keep_lo, f_lo, f_mid))

    lo, hi, _ = jax.lax.fori_loop(0, 90, bisect, (lo, hi, f_lo))
    a = (lo + hi) / 2
    _, mu, E = jax.vmap(h_and_mu)(a)
    rx = v1 - mu * E
    ry = v2 - mu * E * (1 - a)
    # each bracket yields TWO candidate reconstructions of the third
    # coordinate: the KKT value v3 + mu (exact distance, but it can sit
    # O(100 eps |v|) on the infeasible side of the boundary through the
    # cancellation in mu) and the boundary-forced value y*exp(x/y)
    # (feasible by construction, but distorted by e^alpha roundoff
    # amplification when alpha is large).  Whichever is feasible and
    # closer survives the selection below; y <= 0 roots are garbage and
    # stay gated out either way.
    rz_kkt = v3 + mu
    rz_forced = jnp.where(ry > 0,
                          ry * exp_safe(rx / jnp.where(ry > 0, ry, 1.0)),
                          rz_kkt)
    roots = jnp.concatenate([
        jnp.stack([rx, ry, rz_kkt], axis=-1),
        jnp.stack([rx, ry, rz_forced], axis=-1),
    ])  # (8, 3)

    zero = jnp.zeros((), dtype)
    cands = jnp.concatenate([
        v[None, :],
        jnp.zeros((1, 3), dtype),
        jnp.stack([jnp.minimum(v1, zero), zero,
                   jnp.maximum(v3, zero)])[None, :],
        jnp.stack([jnp.minimum(v1, zero), jnp.maximum(v2, zero),
                   jnp.maximum(v3, zero)])[None, :],
        roots,
    ])  # (12, 3)

    # feasibility: y >= 0 and the K-membership violation below roundoff
    eps = jnp.finfo(dtype).eps
    scale = 1 + jnp.linalg.norm(v)
    tol = 100 * eps * scale
    cy = cands[:, 1]
    viol_pos = jnp.maximum(
        jnp.where(cy > 0, cy, 1.0)
        * exp_safe(cands[:, 0] / jnp.where(cy > 0, cy, 1.0))
        - cands[:, 2],
        0.0,
    )
    viol = jnp.where(
        cy > 0,
        viol_pos,
        jnp.maximum(jnp.maximum(cands[:, 0], -cands[:, 2]), -cy),
    )
    feasible = (viol <= tol) & (cy >= -tol)
    # valid curved-boundary KKT points need multiplier mu >= 0: a mu < 0
    # root is a spurious stationary point of the reduced system that can
    # sit feasible and epsilon-closer than the true candidate (observed
    # near the z-axis vertex) — gate it out
    feasible = feasible & jnp.concatenate(
        [jnp.ones(4, bool), mu >= 0, mu >= 0]
    )
    dist = jnp.linalg.norm(cands - v[None, :], axis=-1)
    dist = jnp.where(feasible, dist, jnp.inf)
    best = jnp.argmin(dist)
    z = cands[best]
    # clamp the face coordinates exactly
    return jnp.stack([z[0], jnp.maximum(z[1], zero), z[2]])


@proxclass
class IndExpPrimal:
    """Indicator of the (primal) exponential cone
    K = cl{(x,y,z) : y > 0, y*exp(x/y) <= z} (``ProximalOperators.
    IndExpPrimal``).  The iterate's single leaf must have trailing
    dimension 3; leading dimensions are vectorized.  The projection is the
    candidate-selection scheme of :func:`_expcone_project` (no closed
    form exists; the curved-boundary case is a bracketed 1-D root find,
    cf. Friberg's univariate reduction).  Convex."""

    is_convex = True
    is_generalized_quadratic = False

    def _viol(self, leaf):
        dtype = leaf.dtype
        big = jnp.log(jnp.finfo(dtype).max) * 0.98
        x, y, z = leaf[..., 0], leaf[..., 1], leaf[..., 2]
        ypos = y > 0
        ysafe = jnp.where(ypos, y, 1.0)
        vpos = jnp.maximum(
            ysafe * jnp.exp(jnp.clip(x / ysafe, -big, big)) - z, 0.0
        )
        vface = jnp.maximum(jnp.maximum(x, -z), -y)
        return jnp.where(ypos, vpos, vface)

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        eps = jnp.finfo(R).eps
        scale = 1 + jnp.max(jnp.abs(leaf))
        ok = jnp.max(self._viol(leaf)) <= 100 * eps * scale
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        flat = leaf.reshape(-1, 3)
        out = jax.vmap(_expcone_project)(flat).reshape(leaf.shape)
        zt = jax.tree.unflatten(jax.tree.structure(x), [out])
        return zt, _rzero(leaf)


@proxclass
class IndExpDual:
    """Indicator of the dual exponential cone
    K* = cl{(u,v,w) : u < 0, -u*exp(v/u) <= e*w} (``ProximalOperators.
    IndExpDual``).  Projection via the Moreau identity
    P_{K*}(x) = x + P_K(-x) — one primal-cone projection, no separate
    root find.  Trailing dimension 3; convex."""

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        # x in K* iff the Moreau complement P_K(-x) equals -x + 0 shift,
        # i.e. the projection of x onto K* is x itself
        flat = leaf.reshape(-1, 3)
        proj = flat + jax.vmap(_expcone_project)(-flat)
        eps = jnp.finfo(R).eps
        scale = 1 + jnp.max(jnp.abs(leaf))
        ok = jnp.max(jnp.abs(proj - flat)) <= 100 * jnp.sqrt(eps) * scale
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        flat = leaf.reshape(-1, 3)
        out = (flat + jax.vmap(_expcone_project)(-flat)).reshape(leaf.shape)
        zt = jax.tree.unflatten(jax.tree.structure(x), [out])
        return zt, _rzero(leaf)


@proxclass
class IndGraph:
    """Indicator of the graph of a linear map, {(x, y) : y = A x}
    (``ProximalOperators.IndGraph``).  The iterate is a TUPLE (x, y) with
    x of size n and y of size m.  The projection solves the normal
    equations

        u = (I + A^H A)^{-1} (x + A^H y),    v = A u

    with a Cholesky factorization of I + A^H A computed once at
    construction (the same caching ProximalOperators does); ``prox`` is
    then two triangular solves + two matvecs per call.  Convex (affine
    subspace); generalized-quadratic (its indicator is 0 on an affine
    set), so line-search algorithms may take their quadratic shortcut."""

    A: object
    chol: object = None

    is_convex = True
    is_generalized_quadratic = True

    def __post_init__(self):
        if self.chol is None:
            A = jnp.asarray(self.A)
            n = A.shape[1]
            G = jnp.eye(n, dtype=A.dtype) + pdot(A.T.conj(), A)
            object.__setattr__(
                self, "chol", jax.scipy.linalg.cho_factor(G)[0]
            )

    def __call__(self, xy):
        x, y = xy
        A = jnp.asarray(self.A)
        r = tree_inf_norm(tree_sub((pmatvec(A, x),), (y,)))
        R = real_dtype_of(x)
        eps = jnp.finfo(R).eps
        scale = 1 + tree_inf_norm((x, y))
        return jnp.where(r <= 100 * eps * scale * A.shape[1],
                         jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, xy, gamma):
        x, y = xy
        A = jnp.asarray(self.A)
        rhs = x + pmatvec(A.T.conj(), y)
        u = jax.scipy.linalg.cho_solve((self.chol, False), rhs)
        v = pmatvec(A, u)
        return (u, v), _rzero(x)


@proxclass(meta_fields=("k",))
class IndRank:
    """Indicator of {X : rank(X) <= k} (2-D leaf).  NONCONVEX; the prox
    (a nearest-point, by Eckart-Young) truncates the SVD to the top-k
    singular values (``ProximalOperators.IndBallRank``)."""

    k: int = 1

    is_convex = False
    is_generalized_quadratic = False

    def __call__(self, X):
        s = jnp.linalg.svd(X, compute_uv=False)
        R = real_dtype_of(X)
        eps = jnp.finfo(R).eps
        tail = jnp.sum(jnp.abs(s[self.k:]))
        ok = tail <= 100 * eps * max(X.shape) * (1 + jnp.max(s))
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, X, gamma):
        U, s, Vh = jnp.linalg.svd(X, full_matrices=False)
        s_trunc = jnp.where(jnp.arange(s.shape[0]) < self.k, s, 0)
        Z = pdot(U * s_trunc[None, :].astype(U.dtype), Vh)
        return Z, _rzero(X)


@proxclass
class NegEntropy:
    """f(x) = lam * sum_i x_i log(x_i) on x >= 0 (with 0 log 0 = 0) — the
    negative Shannon entropy, the Bregman/mirror-descent potential.  The
    prox solves, per coordinate,

        lam * (log z + 1) + (z - x) / gamma = 0
        =>  z = (gamma*lam) * W( exp(x/(gamma*lam) - 1) / (gamma*lam) )

    via 20 damped-Newton iterations on the scalar equation in log-space
    (Lambert-W has no closed form; Newton from a safe positive start
    converges quadratically and the fixed iteration count keeps the op
    jit/vmap-friendly — validated variationally in the property sweep)."""

    lam: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        lam = _rparam(self.lam, leaf)
        R = real_dtype_of(leaf)
        safe = jnp.maximum(leaf, jnp.finfo(R).tiny)
        val = lam * jnp.sum(jnp.where(leaf > 0, leaf * jnp.log(safe), 0.0))
        ok = jnp.all(leaf >= 0)
        return jnp.where(ok, val, jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        lam = _rparam(self.lam, leaf)
        gamma = _rparam(gamma, leaf)
        c = gamma * lam
        # stationarity  c*(log z + 1) + z = x; with t = log z solve
        #   g(t) = c*(t + 1) + e^t - x = 0
        # g is convex and strictly increasing, so Newton started at
        # t0 = log(max(x, c)) sits at/right of the root (g(t0) >= 0 there)
        # and descends monotonically — no overshoot, no overflow.
        t = jnp.log(jnp.maximum(jnp.maximum(leaf, c),
                                jnp.finfo(leaf.dtype).tiny))

        def newton(_, t):
            et = jnp.exp(t)
            g = c * (t + 1) + et - leaf
            dg = c + et
            return t - g / dg

        t = jax.lax.fori_loop(0, 20, newton, t)
        z = jnp.exp(t).astype(leaf.dtype)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, self(zt)


@proxclass
class IndFree:
    """Indicator of the whole space (``ProximalOperators.IndFree``): zero
    everywhere, prox is the identity.  Both smooth and proxable — the
    neutral element for SeparableSum blocks that carry no constraint."""

    is_convex = True
    is_generalized_quadratic = True

    def __call__(self, x):
        return _rzero(x)

    def value_and_gradient(self, x):
        return _rzero(x), tree_map(jnp.zeros_like, x)

    def prox(self, x, gamma):
        return x, _rzero(x)


def IndNonpositive():
    """Indicator of the nonpositive orthant
    (``ProximalOperators.IndNonpositive``)."""
    return IndBox(-jnp.inf, 0.0)


@proxclass
class IndHyperslab:
    """Indicator of the hyperslab {lo <= <a, x> <= hi}
    (``ProximalOperators.IndHyperslab``); the prox projects along ``a``:

        z = x - ((<a,x> - clip(<a,x>, lo, hi)) / ||a||^2) * a
    """

    a: object
    lo: object = -jnp.inf
    hi: object = jnp.inf

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        dot = tree_vdot_real(self.a, x)
        R = real_dtype_of(x)
        eps = jnp.finfo(R).eps
        lo, hi = jnp.asarray(self.lo, R), jnp.asarray(self.hi, R)
        # slack from the point's own scale (NOT from the bounds: a
        # one-sided slab has an infinite bound, which would make the
        # slack infinite and the test vacuous)
        slack = 100 * eps * (1 + jnp.abs(dot))
        ok = (dot >= lo - slack) & (dot <= hi + slack)
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        R = real_dtype_of(x)
        dot = tree_vdot_real(self.a, x)
        asq = tree_vdot_real(self.a, self.a)
        lo, hi = jnp.asarray(self.lo, R), jnp.asarray(self.hi, R)
        t = (dot - jnp.clip(dot, lo, hi)) / jnp.where(asq == 0, 1, asq)
        z = tree_map(lambda xl, al: xl - (t * al).astype(xl.dtype), x, self.a)
        return z, _rzero(x)


@proxclass(meta_fields=("maxit",))
class IndPolyhedral:
    """Indicator of the polyhedron {x : lo <= A x <= hi}
    (``ProximalOperators.IndPolyhedral``, the lower-upper form of
    ``src/functions/indPolyhedral.jl`` upstream).  Equality rows are
    ``lo_i == hi_i``; one-sided rows use ``-inf``/``inf``.

    The reference delegates the projection to a host QP library; the
    TPU-native prox solves the DUAL of the projection QP

        min_y  (1/2)||A^T y||^2 - <y, A x> + sigma_[lo,hi](y)

    with FISTA (monotone O(1/k^2); the support function's prox comes from
    the Moreau identity ``prox_{s*sigma}(v) = v - s*clip(v/s, lo, hi)``),
    recovering the projection as ``z = x - A^T y``.  Everything is
    fixed-shape ``lax``-loop code: jit/vmap-friendly, batches of
    polyhedra (stacked A/lo/hi leaves) vectorize like every other prox.
    The Lipschitz constant ||A||_2^2 is estimated by power iteration at
    each prox call (20 matvecs — noise next to the FISTA loop itself).

    ``maxit`` caps the inner loop; it exits early on the dual
    forward-backward residual ``||w - prox(w - step*grad)||_inf / step <=
    tol * (1 + ||A x||_inf)`` (primal feasibility alone is NOT optimality
    — a feasible ``x - A^T y`` with unconverged ``y`` is not the nearest
    point), with ``tol`` floored at ``50*eps`` of the iterate dtype.
    """

    A: object
    lo: object
    hi: object
    tol: object = 1e-9
    maxit: int = 2000

    is_convex = True
    is_generalized_quadratic = False

    def _bounds(self, R):
        return jnp.asarray(self.lo, R), jnp.asarray(self.hi, R)

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        lo, hi = self._bounds(R)
        r = pmatvec(self.A, leaf)
        eps = jnp.finfo(R).eps
        scale = 1 + jnp.max(jnp.abs(r))
        # 10x the inner tol: the dual solver's primal violation lands AT
        # the tol scale (measured ~1.2*tol), so the feasibility slack
        # must sit above the prox's own attainable accuracy or
        # g(prox(x)) flickers inf at the boundary
        slack = 10 * jnp.maximum(jnp.asarray(self.tol, R), 100 * eps) * scale
        ok = jnp.all(r >= lo - slack) & jnp.all(r <= hi + slack)
        return jnp.where(ok, jnp.zeros((), R), jnp.asarray(jnp.inf, R))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        A = jnp.asarray(self.A)
        lo, hi = self._bounds(R)
        eps = jnp.finfo(R).eps
        tol = jnp.maximum(jnp.asarray(self.tol, R), 50 * eps)

        Ax = pmatvec(A, leaf)
        atol = tol * (1 + jnp.max(jnp.abs(Ax)))

        # L = ||A||_2^2 via power iteration on A^T A.  The start vector is
        # deterministic but NON-uniform (an all-ones start lies exactly in
        # the null space of difference/monotonicity constraint matrices,
        # whose rows sum to zero — the estimate would collapse and
        # step = 1/L overflow); if the iterate still lands in a null
        # space, fall back to the Frobenius bound ||A||_F^2 >= ||A||_2^2
        # (an overestimate only shrinks the step — always safe).
        n_cols = A.shape[-1]
        v = jnp.cos(jnp.arange(n_cols, dtype=R) * 1.7 + 0.3)
        v = v / jnp.linalg.norm(v)

        def pw(_, v):
            w = pmatvec(A.conj().T, pmatvec(A, v))
            return w / jnp.maximum(jnp.linalg.norm(w), jnp.finfo(R).tiny)

        v = jax.lax.fori_loop(0, 20, pw, v)
        L_pow = jnp.linalg.norm(pmatvec(A, v)) ** 2 * 1.05
        fro2 = jnp.sum(jnp.abs(A) ** 2)
        L = jnp.where(L_pow > eps * fro2, L_pow, fro2) + jnp.finfo(R).tiny
        step = 1 / L

        def sigma_prox(v, s):
            # Moreau: prox of s * support-function of the box [lo, hi]
            return v - s * jnp.clip(v / s, lo, hi)

        m = A.shape[-2]
        y0 = jnp.zeros(m, leaf.dtype)

        def cond(c):
            y, w, t, k, res = c
            return (k < self.maxit) & (res > atol)

        def body(c):
            y, w, t, k, _ = c
            g = pmatvec(A, pmatvec(A.conj().T, w) - leaf)
            y_new = sigma_prox(w - step * g, step)
            # dual FB residual at the extrapolated point (the package-wide
            # ||x - z||_inf / gamma criterion, in the dual)
            res = jnp.max(jnp.abs(y_new - w), initial=0.0) / step
            # O'Donoghue-Candès gradient-scheme restart on the dual
            # sequence (same fixed point; measured 2.8x fewer iterations
            # on the TV1D dual — same structure here)
            do_r = jnp.sum((w - y_new) * (y_new - y)) > 0
            t = jnp.where(do_r, jnp.ones((), R), t)
            t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
            beta = jnp.where(do_r, jnp.zeros((), R), (t - 1) / t_new)
            w_new = y_new + beta * (y_new - y)
            return y_new, w_new, t_new, k + 1, res

        y, _, _, _, _ = jax.lax.while_loop(
            cond,
            body,
            (y0, y0, jnp.ones((), R), jnp.zeros((), jnp.int32),
             jnp.asarray(jnp.inf, R)),
        )
        z = leaf - pmatvec(A.conj().T, y)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, _rzero(x)


@proxclass(meta_fields=("maxit", "restart"))
class TotalVariation1D:
    """f(x) = lam * sum_i |x_{i+1} - x_i| — the 1-D (anisotropic) total
    variation (``ProximalOperators.TotalVariation1D``).

    The reference computes the prox with Condat's direct taut-string scan —
    inherently sequential, data-dependent pointer code.  The TPU-native
    prox instead solves the DUAL denoising problem (Beck-Teboulle FGP):

        min_{|u| <= gamma*lam}  (1/2)||D^T u - x||^2,    z = x - D^T u

    with FISTA on the box-constrained dual (L(D D^T) <= 4, so the step is
    a constant 1/4).  Pure fixed-shape vector ops: jit/vmap-friendly, a
    BATCH of signals is one vectorized solve (the taut string cannot
    batch).  The loop exits when the iterate stalls below ``tol`` (floored
    at 10*eps), capped at ``maxit``.

    ``restart=True`` (default) adds O'Donoghue-Candès gradient-scheme
    adaptive restart to the dual sequence — same fixed point, measured
    2.8x fewer dual iterations (mean 258 -> 91, max 482 -> 159 on the
    4096x512 benchmark batch; ``tv1d_restart_*`` rows of
    ``benchmarks/results_streaming.jsonl``, counted by the instrumented
    loop in ``streaming_probe.py`` whose output is asserted identical to
    this prox) at identical accuracy vs the f64 taut-string oracle
    (BASELINE.md round-5 TV section).
    """

    lam: object = 1.0
    tol: object = 1e-10
    maxit: int = 2000
    restart: bool = True

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        (leaf,) = jax.tree.leaves(x)
        return _rparam(self.lam, leaf) * jnp.sum(jnp.abs(jnp.diff(leaf)))

    def prox(self, x, gamma):
        (leaf,) = jax.tree.leaves(x)
        R = real_dtype_of(leaf)
        thr = _rparam(self.lam, leaf) * _rparam(gamma, leaf)
        eps = jnp.finfo(R).eps
        tol = jnp.maximum(jnp.asarray(self.tol, R), 10 * eps) * (
            1 + jnp.max(jnp.abs(leaf))
        )

        def Dt(u):  # D^T u, length n
            return jnp.pad(u, (1, 0)) - jnp.pad(u, (0, 1))

        def D(z):  # forward differences, length n-1
            return jnp.diff(z)

        u0 = jnp.zeros(leaf.shape[0] - 1, leaf.dtype)
        quarter = jnp.asarray(0.25, R)

        def cond(c):
            u, w, t, k, delta = c
            return (k < self.maxit) & (delta > tol)

        def body(c):
            u, w, t, k, _ = c
            g = D(Dt(w) - leaf)
            u_new = jnp.clip(w - quarter * g, -thr, thr)
            if self.restart:
                # gradient-scheme restart: reset momentum when the dual
                # step opposes the previous direction
                do_r = jnp.sum((w - u_new) * (u_new - u)) > 0
                t = jnp.where(do_r, jnp.ones((), R), t)
            t_new = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
            beta = (t - 1) / t_new
            if self.restart:
                beta = jnp.where(do_r, jnp.zeros((), R), beta)
            w_new = u_new + beta * (u_new - u)
            delta = jnp.max(jnp.abs(u_new - u), initial=0.0)
            return u_new, w_new, t_new, k + 1, delta

        u, _, _, _, _ = jax.lax.while_loop(
            cond,
            body,
            (u0, u0, jnp.ones((), R), jnp.zeros((), jnp.int32),
             jnp.asarray(jnp.inf, R)),
        )
        z = leaf - Dt(u)
        zt = jax.tree.unflatten(jax.tree.structure(x), [z])
        return zt, self(zt)


# ProximalOperators.jl's name for the rank-ball indicator
IndBallRank = IndRank
