"""Prox-function combinators: conjugation, separable sums, slicing, scaling.

These cover the calculus the reference obtains from ProximalCore /
ProximalOperators: Moreau-decomposition conjugates
(``src/algorithms/primal_dual.jl:187,194``), ``SlicedSeparableSum``
(``test/problems/test_linear_programs.jl:156``) and separable sums over
structured iterates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.tree import tree_map, tree_scale, tree_sub, tree_vdot_real
from .base import proxclass


@proxclass
class Conjugate:
    """Convex conjugate f*; prox through the Moreau decomposition:

        prox_{gamma f*}(x) = x - gamma * prox_{f/gamma}(x/gamma)

    The value at the prox point uses the Fenchel equality at the maximizer:
    f*(z) = <z, u> - f(u) where u = prox_{f/gamma}(x/gamma).
    """

    f: object

    is_convex = True  # conjugates are always convex

    @property
    def is_generalized_quadratic(self):
        return getattr(self.f, "is_generalized_quadratic", False)

    def prox(self, x, gamma):
        u, f_u = self.f.prox(tree_scale(1 / gamma, x), 1 / gamma)
        z = tree_map(lambda xl, ul: xl - gamma * ul, x, u)
        val = tree_vdot_real(z, u) - f_u
        return z, val


@proxclass(meta_fields=())
class SeparableSum:
    """g(x1, ..., xk) = g1(x1) + ... + gk(xk) over a tuple-structured iterate."""

    fs: tuple

    @property
    def is_convex(self):
        return all(getattr(f, "is_convex", False) for f in self.fs)

    @property
    def is_generalized_quadratic(self):
        return all(getattr(f, "is_generalized_quadratic", False) for f in self.fs)

    def __call__(self, x):
        vals = [f(xi) for f, xi in zip(self.fs, x)]
        return sum(vals[1:], vals[0])

    def prox(self, x, gamma):
        outs = [f.prox(xi, gamma) for f, xi in zip(self.fs, x)]
        zs = tuple(z for z, _ in outs)
        vals = [v for _, v in outs]
        return zs, sum(vals[1:], vals[0])


@proxclass(meta_fields=("slices",))
class SlicedSeparableSum:
    """g(x) = sum_i g_i(x[slice_i]) on a flat vector with static slices.

    ``slices`` is a tuple of (start, stop) pairs.  Mirrors
    ``ProximalOperators.SlicedSeparableSum``.
    """

    fs: tuple
    slices: tuple

    @property
    def is_convex(self):
        return all(getattr(f, "is_convex", False) for f in self.fs)

    @property
    def is_generalized_quadratic(self):
        return all(getattr(f, "is_generalized_quadratic", False) for f in self.fs)

    def __call__(self, x):
        vals = [f(x[a:b]) for f, (a, b) in zip(self.fs, self.slices)]
        return sum(vals[1:], vals[0])

    def prox(self, x, gamma):
        zs, vals = [], []
        for f, (a, b) in zip(self.fs, self.slices):
            z, v = f.prox(x[a:b], gamma)
            zs.append(z)
            vals.append(v)
        return jnp.concatenate(zs), sum(vals[1:], vals[0])


@proxclass
class Postcompose:
    """g(x) = a * f(x) + b;  prox_{gamma g} = prox_{(a gamma) f}."""

    f: object
    a: object = 1.0
    b: object = 0.0

    @property
    def is_convex(self):
        return getattr(self.f, "is_convex", False)

    @property
    def is_generalized_quadratic(self):
        return getattr(self.f, "is_generalized_quadratic", False)

    def __call__(self, x):
        return self.a * self.f(x) + self.b

    def value_and_gradient(self, x):
        from .base import value_and_gradient

        v, g = value_and_gradient(self.f, x)
        return self.a * v + self.b, tree_scale(self.a, g)

    def prox(self, x, gamma):
        z, f_z = self.f.prox(x, gamma * self.a)
        return z, self.a * f_z + self.b


@proxclass
class Precompose:
    """g(x) = f(L x + b) for a linear map satisfying L L* = mu * I with
    mu > 0 (orthogonal/unitary maps, scaled identities, tight frames —
    ``ProximalOperators.Precompose``).  Under that condition the prox has
    the closed form

        prox_{gamma g}(x) = x + (1/mu) L*( prox_{mu gamma f}(Lx + b) - Lx - b )

    ``L`` is anything :func:`proxtpu.ops.linops.as_linop` accepts (a 2-D
    array or a ``matvec``/``rmatvec`` operator object); ``b`` is a scalar
    or an array matching ``L x``.  The tight-frame condition is the
    USER'S contract — it is not (and cannot cheaply be) checked.
    """

    f: object
    L: object
    mu: object = 1.0
    b: object = 0.0

    @property
    def is_convex(self):
        # affine precomposition preserves convexity
        return getattr(self.f, "is_convex", False)

    @property
    def is_generalized_quadratic(self):
        return getattr(self.f, "is_generalized_quadratic", False)

    def _affine(self, x):
        from ..ops.linops import as_linop

        y = as_linop(self.L).matvec(x)
        return tree_map(lambda l: l + self.b, y)

    def __call__(self, x):
        return self.f(self._affine(x))

    def value_and_gradient(self, x):
        from ..ops.linops import as_linop
        from .base import value_and_gradient

        v, gy = value_and_gradient(self.f, self._affine(x))
        return v, as_linop(self.L).rmatvec(gy)

    def prox(self, x, gamma):
        from ..ops.linops import as_linop

        L = as_linop(self.L)
        y = self._affine(x)
        z, f_z = self.f.prox(y, self.mu * gamma)
        d = L.rmatvec(tree_sub(z, y))
        return tree_map(lambda xl, dl: xl + dl / self.mu, x, d), f_z


@proxclass
class MoreauEnvelope:
    """Moreau envelope f^gamma — a smooth surrogate with an exact gradient:

        f^g(x) = min_z f(z) + ||z-x||^2/(2 g),  grad = (x - prox_{g f}(x)) / g
    """

    f: object
    gamma: object = 1.0

    is_convex = True
    is_generalized_quadratic = False

    def __call__(self, x):
        z, f_z = self.f.prox(x, self.gamma)
        d = tree_sub(x, z)
        return f_z + tree_vdot_real(d, d) / (2 * self.gamma)

    def value_and_gradient(self, x):
        z, f_z = self.f.prox(x, self.gamma)
        d = tree_sub(x, z)
        val = f_z + tree_vdot_real(d, d) / (2 * self.gamma)
        return val, tree_scale(1 / self.gamma, d)


@proxclass
class Tilt:
    """g(x) = f(x) + Re<a, x> + b (``ProximalOperators.Tilt``): a linear
    tilt of any proxable/smooth f.  The prox shifts the argument:

        prox_{gamma g}(x) = prox_{gamma f}(x - gamma * a)

    ``a`` matches the iterate's pytree structure (or broadcasts leafwise).
    The canonical use here is graphical lasso, where the smooth-free
    splitting needs prox of tr(S X) - mu*logdet(X) = Tilt(NegLogDet(mu), S)
    (see ``examples/graphical_lasso.py``).
    """

    f: object
    a: object
    b: object = 0.0

    @property
    def is_convex(self):
        return getattr(self.f, "is_convex", False)

    @property
    def is_generalized_quadratic(self):
        return getattr(self.f, "is_generalized_quadratic", False)

    def _lin(self, z):
        return tree_vdot_real(self.a, z) + self.b

    def __call__(self, x):
        return self.f(x) + self._lin(x)

    def value_and_gradient(self, x):
        from .base import value_and_gradient

        v, g = value_and_gradient(self.f, x)
        return v + self._lin(x), tree_map(
            lambda gl, al: gl + jnp.asarray(al, gl.dtype), g, self.a
        )

    def prox(self, x, gamma):
        y = tree_map(lambda xl, al: xl - gamma * jnp.asarray(al, xl.dtype),
                     x, self.a)
        z, f_z = self.f.prox(y, gamma)
        return z, f_z + self._lin(z)


@proxclass
class Regularize:
    """g(x) = f(x) + (rho/2) ||x - a||^2 (``ProximalOperators.Regularize``).
    The prox reduces to f's through the standard scaling identity:

        prox_{gamma g}(x) = prox_{gamma' f}( (x + gamma*rho*a) / (1 + gamma*rho) ),
        gamma' = gamma / (1 + gamma*rho)
    """

    f: object
    rho: object = 1.0
    a: object = 0.0

    @property
    def is_convex(self):
        return getattr(self.f, "is_convex", False)

    @property
    def is_generalized_quadratic(self):
        return getattr(self.f, "is_generalized_quadratic", False)

    def _quad(self, z):
        d = tree_map(lambda zl: zl - jnp.asarray(self.a, zl.dtype), z)
        return (self.rho / 2) * tree_vdot_real(d, d)

    def __call__(self, x):
        return self.f(x) + self._quad(x)

    def value_and_gradient(self, x):
        from .base import value_and_gradient

        v, g = value_and_gradient(self.f, x)
        grad = tree_map(
            lambda gl, xl: gl + self.rho * (xl - jnp.asarray(self.a, xl.dtype)),
            g, x,
        )
        return v + self._quad(x), grad

    def prox(self, x, gamma):
        den = 1 + gamma * self.rho
        y = tree_map(
            lambda xl: (xl + gamma * self.rho * jnp.asarray(self.a, xl.dtype))
            / den,
            x,
        )
        z, f_z = self.f.prox(y, gamma / den)
        return z, f_z + self._quad(z)


@proxclass(meta_fields=())
class PointwiseMinimum:
    """g(x) = min_i f_i(x) (``ProximalOperators.PointwiseMinimum``) — e.g.
    a union-of-sets indicator.  Nonconvex in general.  The prox picks, among
    the candidate proxes z_i = prox_{gamma f_i}(x), the one minimizing the
    proximal objective f_i(z_i) + ||z_i - x||^2 / (2 gamma); ties resolve to
    the earliest f_i (jnp.where semantics), deterministically under jit."""

    fs: tuple

    def __post_init__(self):
        if not self.fs:
            raise ValueError("PointwiseMinimum needs at least one term")

    is_convex = False

    @property
    def is_generalized_quadratic(self):
        return False

    def __call__(self, x):
        vals = [f(x) for f in self.fs]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.minimum(out, v)
        return out

    def prox(self, x, gamma):
        best_z, best_v = self.fs[0].prox(x, gamma)
        d = tree_sub(best_z, x)
        best_obj = best_v + tree_vdot_real(d, d) / (2 * gamma)
        for f in self.fs[1:]:
            z, v = f.prox(x, gamma)
            d = tree_sub(z, x)
            obj = v + tree_vdot_real(d, d) / (2 * gamma)
            take = obj < best_obj
            best_z = tree_map(
                lambda zl, bl: jnp.where(take, zl, bl), z, best_z
            )
            best_v = jnp.where(take, v, best_v)
            best_obj = jnp.minimum(obj, best_obj)
        return best_z, best_v


@proxclass
class PrecomposeDiagonal:
    """g(x) = f(a .* x + b) for an elementwise (diagonal) scaling ``a`` and
    shift ``b`` (``ProximalOperators.PrecomposeDiagonal``).  Requires f to
    be SEPARABLE (coordinate-wise) — then the prox decouples per coordinate
    with an elementwise stepsize:

        prox_{gamma g}(x) = (prox_{gamma a^2 f}(a x + b) - b) / a

    so f's prox must accept an ARRAY gamma broadcasting against the iterate
    (true of every separable member here: NormL1, SqrNormL2, ElasticNet,
    IndBox, HuberLoss, LogBarrier, ...).  ``a`` must be nonzero
    elementwise; both contracts are the user's (mirroring the upstream
    ``@assert`` on separability)."""

    f: object
    a: object
    b: object = 0.0

    @property
    def is_convex(self):
        return getattr(self.f, "is_convex", False)

    @property
    def is_generalized_quadratic(self):
        return getattr(self.f, "is_generalized_quadratic", False)

    def _affine(self, x):
        return tree_map(lambda xl: self.a * xl + self.b, x)

    def __call__(self, x):
        return self.f(self._affine(x))

    def value_and_gradient(self, x):
        from .base import value_and_gradient

        v, gy = value_and_gradient(self.f, self._affine(x))
        return v, tree_map(lambda gl: jnp.conj(self.a) * gl, gy)

    def prox(self, x, gamma):
        y = self._affine(x)
        z, f_z = self.f.prox(y, gamma * jnp.square(jnp.abs(self.a)))
        return tree_map(lambda zl: (zl - self.b) / self.a, z), f_z


@proxclass(meta_fields=())
class Sum:
    """g(x) = sum_i f_i(x) (``ProximalOperators.Sum``): a SMOOTH-only
    combinator — the sum of proxes is not the prox of the sum, so this
    exposes value/gradient oracles only (use a splitting algorithm, or
    SeparableSum for block-separable structure, when proxes are needed)."""

    fs: tuple

    def __post_init__(self):
        if not self.fs:
            raise ValueError("Sum needs at least one term")

    @property
    def is_convex(self):
        return all(getattr(f, "is_convex", False) for f in self.fs)

    @property
    def is_generalized_quadratic(self):
        return all(
            getattr(f, "is_generalized_quadratic", False) for f in self.fs
        )

    def __call__(self, x):
        vals = [f(x) for f in self.fs]
        out = vals[0]
        for v in vals[1:]:
            out = out + v
        return out

    def value_and_gradient(self, x):
        from .base import value_and_gradient

        v, g = value_and_gradient(self.fs[0], x)
        for f in self.fs[1:]:
            vi, gi = value_and_gradient(f, x)
            v = v + vi
            g = tree_map(lambda a, b: a + b, g, gi)
        return v, g
