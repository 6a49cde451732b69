"""Bijective reparameterizations (auto-transforms), mirroring
``pymc3/distributions/transforms.py``.

Each transform maps a constrained RV value ``x`` to an unconstrained vector
``z`` the samplers operate on. Conventions (matching the reference):

 - ``forward(x, env) -> z``     constrained -> unconstrained (the free space)
 - ``backward(z, env) -> x``    unconstrained -> constrained
 - ``jacobian_det(z, env)``     log|det d backward/dz| at z; summed into the
   joint logp (``TransformedDistribution.logp``, ``transforms.py:164-181``)
 - ``forward_shape(shape)``     shape of the unconstrained space (differs only
   for simplex-type transforms: StickBreaking drops one dim).

Transforms with parameters (Interval/LowerBound/UpperBound) store them as
symbolic nodes so bounds may reference other RVs; ``env`` resolves them at
trace time. All functions are pure jnp and traceable.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.special as jss

from ..config import floatX
from ..node import as_node, evaluate

__all__ = [
    "Transform", "transform", "stick_breaking", "logodds", "interval",
    "log_exp_m1", "lowerbound", "upperbound", "ordered", "log", "sum_to_1",
    "circular", "CholeskyCovPacked", "Chain", "Log", "LogExpM1", "LogOdds",
    "Interval", "LowerBound", "UpperBound", "Ordered", "SumTo1",
    "StickBreaking", "Circular",
]


class Transform:
    """Base transform class (cf. ``transforms.py:46``)."""

    name = ""

    def forward(self, x, env=None, memo=None):
        raise NotImplementedError

    def backward(self, z, env=None, memo=None):
        raise NotImplementedError

    def jacobian_det(self, z, env=None, memo=None):
        raise NotImplementedError

    def forward_val(self, x, point=None):
        return np.asarray(self.forward(jnp.asarray(x), env=point or {}))

    def backward_val(self, z, point=None):
        return np.asarray(self.backward(jnp.asarray(z), env=point or {}))

    def forward_shape(self, shape):
        return tuple(shape)

    def backward_shape(self, shape):
        return tuple(shape)

    def apply(self, dist):
        from .distribution import TransformedDistribution
        return TransformedDistribution.dist(dist, self)

    def __str__(self):
        return self.name + " transform"


class Log(Transform):
    """Positive support: z = log(x) (cf. ``transforms.py:203``)."""

    name = "log"

    def forward(self, x, env=None, memo=None):
        return jnp.log(x)

    def backward(self, z, env=None, memo=None):
        return jnp.exp(z)

    def jacobian_det(self, z, env=None, memo=None):
        return z


log = Log()


class LogExpM1(Transform):
    """Positive support via softplus (cf. ``transforms.py:222``)."""

    name = "log_exp_m1"

    def forward(self, x, env=None, memo=None):
        # log(exp(x) - 1) = x + log(1 - exp(-x)), stable
        return jnp.log(-jnp.expm1(-x)) + x

    def backward(self, z, env=None, memo=None):
        return jax.nn.softplus(z)

    def jacobian_det(self, z, env=None, memo=None):
        return -jax.nn.softplus(-z)


log_exp_m1 = LogExpM1()


class LogOdds(Transform):
    """(0, 1) support: z = logit(x) (cf. ``transforms.py:246``)."""

    name = "logodds"

    def forward(self, x, env=None, memo=None):
        return jss.logit(x)

    def backward(self, z, env=None, memo=None):
        return jss.expit(z)

    def jacobian_det(self, z, env=None, memo=None):
        return -jax.nn.softplus(z) - jax.nn.softplus(-z)


logodds = LogOdds()


class Interval(Transform):
    """(a, b) support; bounds may be symbolic (cf. ``transforms.py:262``)."""

    name = "interval"

    def __init__(self, a, b):
        self.a = as_node(floatX(np.asarray(a)) if not hasattr(a, "_eval") else a)
        self.b = as_node(floatX(np.asarray(b)) if not hasattr(b, "_eval") else b)

    def _bounds(self, env, memo):
        env = env or {}
        memo = {} if memo is None else memo
        return evaluate(self.a, env, memo), evaluate(self.b, env, memo)

    def forward(self, x, env=None, memo=None):
        a, b = self._bounds(env, memo)
        return jnp.log(x - a) - jnp.log(b - x)

    def backward(self, z, env=None, memo=None):
        a, b = self._bounds(env, memo)
        return a + (b - a) * jss.expit(z)

    def jacobian_det(self, z, env=None, memo=None):
        a, b = self._bounds(env, memo)
        s = jnp.log(b - a)
        return s - jax.nn.softplus(z) - jax.nn.softplus(-z)


interval = Interval


class LowerBound(Transform):
    """[a, inf) support (cf. ``transforms.py:295``)."""

    name = "lowerbound"

    def __init__(self, a):
        self.a = as_node(floatX(np.asarray(a)) if not hasattr(a, "_eval") else a)

    def forward(self, x, env=None, memo=None):
        a = evaluate(self.a, env or {}, memo if memo is not None else {})
        return jnp.log(x - a)

    def backward(self, z, env=None, memo=None):
        a = evaluate(self.a, env or {}, memo if memo is not None else {})
        return jnp.exp(z) + a

    def jacobian_det(self, z, env=None, memo=None):
        return z


lowerbound = LowerBound


class UpperBound(Transform):
    """(-inf, b] support (cf. ``transforms.py:330``)."""

    name = "upperbound"

    def __init__(self, b):
        self.b = as_node(floatX(np.asarray(b)) if not hasattr(b, "_eval") else b)

    def forward(self, x, env=None, memo=None):
        b = evaluate(self.b, env or {}, memo if memo is not None else {})
        return jnp.log(b - x)

    def backward(self, z, env=None, memo=None):
        b = evaluate(self.b, env or {}, memo if memo is not None else {})
        return b - jnp.exp(z)

    def jacobian_det(self, z, env=None, memo=None):
        return z


upperbound = UpperBound


class Ordered(Transform):
    """Monotone-increasing last axis (cf. ``transforms.py:365``)."""

    name = "ordered"

    def forward(self, x, env=None, memo=None):
        z0 = x[..., :1]
        dz = jnp.log(x[..., 1:] - x[..., :-1])
        return jnp.concatenate([z0, dz], axis=-1)

    def backward(self, z, env=None, memo=None):
        x0 = z[..., :1]
        dx = jnp.exp(z[..., 1:])
        return jnp.cumsum(jnp.concatenate([x0, dx], axis=-1), axis=-1)

    def jacobian_det(self, z, env=None, memo=None):
        return jnp.concatenate([jnp.zeros_like(z[..., :1]), z[..., 1:]],
                               axis=-1)


ordered = Ordered()


class SumTo1(Transform):
    """Sum-to-one vector: drop last element (cf. ``transforms.py:397``)."""

    name = "sumto1"

    def forward(self, x, env=None, memo=None):
        return x[..., :-1]

    def backward(self, z, env=None, memo=None):
        last = 1.0 - jnp.sum(z, axis=-1, keepdims=True)
        return jnp.concatenate([z, last], axis=-1)

    def jacobian_det(self, z, env=None, memo=None):
        return jnp.zeros_like(jnp.sum(z, axis=-1))

    def forward_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def backward_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] + 1,)


sum_to_1 = SumTo1()


class StickBreaking(Transform):
    """Simplex <-> R^{n-1}, Stan-style stick breaking (cf. ``transforms.py:423``).

    The reference implements the PyMC3 variant (mean-centered logit); we use
    the Stan formulation — same support, clean closed-form log-Jacobian; both
    are valid reparameterizations of the simplex.
    """

    name = "stickbreaking"

    def __init__(self, eps=None):
        pass

    def forward(self, x, env=None, memo=None):
        n = x.shape[-1]
        rem = 1.0 - jnp.cumsum(x[..., :-1], axis=-1)
        rem = jnp.concatenate([jnp.ones_like(x[..., :1]), rem[..., :-1]],
                              axis=-1)
        v = x[..., :-1] / rem  # stick fractions in (0,1)
        offset = jnp.log(jnp.arange(n - 1, 0, -1, dtype=x.dtype))
        return jss.logit(v) + offset

    def backward(self, z, env=None, memo=None):
        n1 = z.shape[-1]
        offset = jnp.log(jnp.arange(n1, 0, -1, dtype=z.dtype))
        v = jss.expit(z - offset)

        def body(rem, vi):
            xi = rem * vi
            return rem - xi, xi

        rem = jnp.ones(z.shape[:-1], dtype=z.dtype)
        rem_final, xs = jax.lax.scan(body, rem, jnp.moveaxis(v, -1, 0))
        x = jnp.moveaxis(xs, 0, -1)
        return jnp.concatenate([x, rem_final[..., None]], axis=-1)

    def jacobian_det(self, z, env=None, memo=None):
        n1 = z.shape[-1]
        offset = jnp.log(jnp.arange(n1, 0, -1, dtype=z.dtype))
        zc = z - offset
        v = jss.expit(zc)

        def body(rem, vi):
            xi = rem * vi
            return rem - xi, rem

        rem = jnp.ones(z.shape[:-1], dtype=z.dtype)
        _, rems = jax.lax.scan(body, rem, jnp.moveaxis(v, -1, 0))
        rems = jnp.moveaxis(rems, 0, -1)
        # log|J| = sum_k [ log(rem_k) + log v_k(1 - v_k) ]
        return jnp.sum(jnp.log(rems) - jax.nn.softplus(zc)
                       - jax.nn.softplus(-zc), axis=-1)

    def forward_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def backward_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] + 1,)


stick_breaking = StickBreaking()


class Circular(Transform):
    """(-pi, pi) identity-with-wrap (cf. ``transforms.py:495``)."""

    name = "circular"

    def forward(self, x, env=None, memo=None):
        return jnp.asarray(x)

    def backward(self, z, env=None, memo=None):
        return jnp.arctan2(jnp.sin(z), jnp.cos(z))

    def jacobian_det(self, z, env=None, memo=None):
        return jnp.zeros_like(z)


circular = Circular()


class CholeskyCovPacked(Transform):
    """Packed-cholesky: log-transform the diagonal entries
    (cf. ``transforms.py:517``)."""

    name = "cholesky-cov-packed"

    def __init__(self, n):
        self.n = int(n)
        self.diag_idxs = np.arange(1, n + 1).cumsum() - 1

    def forward(self, x, env=None, memo=None):
        x = jnp.asarray(x)
        return x.at[..., self.diag_idxs].set(jnp.log(x[..., self.diag_idxs]))

    def backward(self, z, env=None, memo=None):
        z = jnp.asarray(z)
        return z.at[..., self.diag_idxs].set(jnp.exp(z[..., self.diag_idxs]))

    def jacobian_det(self, z, env=None, memo=None):
        return jnp.sum(z[..., self.diag_idxs], axis=-1)


class Chain(Transform):
    """Compose transforms left-to-right (cf. ``transforms.py:537``)."""

    def __init__(self, transform_list):
        self.transform_list = list(transform_list)
        self.name = "+".join([t.name for t in self.transform_list])

    def forward(self, x, env=None, memo=None):
        for t in self.transform_list:
            x = t.forward(x, env, memo)
        return x

    def backward(self, z, env=None, memo=None):
        for t in reversed(self.transform_list):
            z = t.backward(z, env, memo)
        return z

    def jacobian_det(self, z, env=None, memo=None):
        total = 0.0
        for t in reversed(self.transform_list):
            j = t.jacobian_det(z, env, memo)
            total = total + jnp.sum(j)
            z = t.backward(z, env, memo)
        return total

    def forward_shape(self, shape):
        for t in self.transform_list:
            shape = t.forward_shape(shape)
        return tuple(shape)


transform = Transform
