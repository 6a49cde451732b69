"""Discrete distributions, mirroring ``pymc3/distributions/discrete.py``
(1618 LoC, 15 distributions)."""
from __future__ import annotations

import numpy as np
import scipy.stats as st
import jax
import jax.numpy as jnp
import jax.scipy.special as jss

from ..config import floatX, intX
from ..node import Node, as_node, apply
from . import transforms
from .dist_math import (
    bound, binomln, betaln, factln, logpow, normal_lcdf, normal_lccdf,
    random_choice,
)
from .distribution import Discrete, draw_values, generate_samples

__all__ = [
    "Binomial", "BetaBinomial", "Bernoulli", "DiscreteWeibull", "Poisson",
    "NegativeBinomial", "Constant", "ConstantDist", "ZeroInflatedPoisson",
    "ZeroInflatedBinomial", "ZeroInflatedNegativeBinomial", "DiscreteUniform",
    "Geometric", "Categorical", "OrderedLogistic",
]


def _an(x):
    return x if isinstance(x, Node) else as_node(floatX(np.asarray(x)))


def _norm(env, memo):
    return (env or {}), ({} if memo is None else memo)


class Binomial(Discrete):
    r"""Binomial (cf. ``discrete.py:34``)."""

    def __init__(self, n, p, *args, **kwargs):
        self.n = _an(n)
        self.p = _an(p)
        self.mode = apply(lambda n, p: jnp.asarray(jnp.clip(jnp.round(n * p), 0, n),
                                                   dtype=intX()), self.n, self.p)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.n, self.p)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        n, p = self._ev_params(("n", "p"), env, memo)
        return bound(
            binomln(n, value) + logpow(p, value) + logpow(1.0 - p, n - value),
            value >= 0, value <= n, p >= 0, p <= 1)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        n, p = self._ev_params(("n", "p"), env, memo)
        k = jnp.floor(value)
        safe_k = jnp.clip(k, 0, n - 1)
        return jnp.where(
            value < 0, -jnp.inf,
            jnp.where(value >= n, 0.0,
                      jnp.log(jss.betainc(n - safe_k, safe_k + 1.0, 1.0 - p))))

    def random(self, point=None, size=None):
        n, p = draw_values([self.n, self.p], point=point, size=size)
        return generate_samples(
            lambda n, p, size: np.random.binomial(n.astype(int), p, size=size),
            n, p, dist_shape=self.shape, size=size)


class BetaBinomial(Discrete):
    r"""Beta-binomial (cf. ``discrete.py:136``)."""

    def __init__(self, alpha, beta, n, *args, **kwargs):
        self.alpha = _an(alpha)
        self.beta = _an(beta)
        self.n = _an(n)
        self.mode = apply(
            lambda a, b, n: jnp.asarray(
                jnp.clip(jnp.round(a / (a + b) * n), 0, n), dtype=intX()),
            self.alpha, self.beta, self.n)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.alpha, self.beta, self.n)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta, n = self._ev_params(("alpha", "beta", "n"), env, memo)
        return bound(
            binomln(n, value) + betaln(value + alpha, n - value + beta)
            - betaln(alpha, beta),
            value >= 0, value <= n, alpha > 0, beta > 0)

    def random(self, point=None, size=None):
        alpha, beta, n = draw_values([self.alpha, self.beta, self.n],
                                     point=point, size=size)
        return generate_samples(
            lambda alpha, beta, n, size: np.random.binomial(
                n.astype(int) if np.ndim(n) else int(n),
                np.random.beta(alpha, beta, size=size), size=size),
            alpha, beta, n, dist_shape=self.shape, size=size)


class Bernoulli(Discrete):
    r"""Bernoulli (cf. ``discrete.py:273``)."""

    def __init__(self, p=None, logit_p=None, *args, **kwargs):
        if sum(x is not None for x in (p, logit_p)) != 1:
            raise ValueError("Specify one of p and logit_p")
        if p is not None:
            self.p = _an(p)
            self._is_logit = False
        else:
            self.p = apply(jss.expit, _an(logit_p))
            self._is_logit = True
        self.mode = apply(lambda p: jnp.asarray(p > 0.5, dtype=intX()), self.p)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.p)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        p, = self._ev_params(("p",), env, memo)
        return bound(
            jnp.where(value == 1, jnp.log(jnp.where(p > 0, p, 1.0)),
                      jnp.log1p(-jnp.where(p < 1, p, 0.0))),
            value >= 0, value <= 1, p >= 0, p <= 1)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        p, = self._ev_params(("p",), env, memo)
        return jnp.where(value < 0, -jnp.inf,
                         jnp.where(value < 1, jnp.log1p(-p), 0.0))

    def random(self, point=None, size=None):
        p, = draw_values([self.p], point=point, size=size)
        return generate_samples(
            lambda p, size: np.random.binomial(1, p, size=size),
            p, dist_shape=self.shape, size=size)


class DiscreteWeibull(Discrete):
    r"""Discrete Weibull (cf. ``discrete.py:383``)."""

    def __init__(self, q, beta, *args, **kwargs):
        self.q = _an(q)
        self.beta = _an(beta)
        self.median = apply(
            lambda q, b: jnp.asarray(
                jnp.ceil(jnp.power(jnp.log(0.5) / jnp.log(q), 1.0 / b)) - 1.0,
                dtype=intX()),
            self.q, self.beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.q, self.beta)
        super().__init__(defaults=("median",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        from ..math import _log1mexp
        q, beta = self._ev_params(("q", "beta"), env, memo)
        vv = jnp.maximum(value, 0)
        # log(q^(v^b) - q^((v+1)^b)) evaluated in log space:
        # v^b log q + log(1 - q^((v+1)^b - v^b)) — the direct difference
        # underflows to log(0) = -inf once q^(v^b) < float-tiny (caught
        # by the parameter-domain matrix at q=0.25, v=21)
        eps = jnp.finfo(floatX()).eps
        qs = jnp.clip(q, eps, 1.0 - eps)
        lq = jnp.log(qs)
        d = jnp.power(vv + 1.0, beta) - jnp.power(vv, beta)
        return bound(
            jnp.power(vv, beta) * lq + _log1mexp(-d * lq),
            value >= 0, q > 0, q < 1, beta > 0)

    def random(self, point=None, size=None):
        q, beta = draw_values([self.q, self.beta], point=point, size=size)
        return generate_samples(
            lambda q, beta, size: np.ceil(
                np.power(np.log(1.0 - np.random.uniform(size=size))
                         / np.log(q), 1.0 / beta)) - 1,
            q, beta, dist_shape=self.shape, size=size)


class Poisson(Discrete):
    r"""Poisson (cf. ``discrete.py:500``)."""

    def __init__(self, mu, *args, **kwargs):
        self.mu = _an(mu)
        self.mode = apply(lambda m: jnp.asarray(jnp.floor(m), dtype=intX()),
                          self.mu)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, = self._ev_params(("mu",), env, memo)
        logp = logpow(mu, value) - factln(value) - mu
        # Poisson(0) has all mass at 0 (cf. discrete.py:576)
        return bound(jnp.where((mu == 0) & (value == 0), 0.0, logp),
                     value >= 0, mu >= 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, = self._ev_params(("mu",), env, memo)
        k = jnp.floor(value)
        safe_k = jnp.maximum(k, 0)
        return jnp.where(value < 0, -jnp.inf,
                         jnp.log(jss.gammaincc(safe_k + 1.0, mu)))

    def random(self, point=None, size=None):
        mu, = draw_values([self.mu], point=point, size=size)
        return generate_samples(
            lambda mu, size: np.random.poisson(mu, size=size),
            mu, dist_shape=self.shape, size=size)


class NegativeBinomial(Discrete):
    r"""Negative binomial, (mu, alpha) parameterization
    (cf. ``discrete.py:602``)."""

    def __init__(self, mu, alpha, *args, **kwargs):
        self.mu = _an(mu)
        self.alpha = _an(alpha)
        self.mode = apply(lambda m: jnp.asarray(jnp.floor(m), dtype=intX()),
                          self.mu)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.alpha)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, alpha = self._ev_params(("mu", "alpha"), env, memo)
        negbinom = bound(
            binomln(value + alpha - 1.0, value)
            + logpow(mu / (mu + alpha), value)
            + logpow(alpha / (mu + alpha), alpha),
            value >= 0, mu > 0, alpha > 0)
        # limit alpha -> inf is Poisson (cf. discrete.py:700)
        poisson = bound(logpow(mu, value) - factln(value) - mu,
                        value >= 0, mu >= 0)
        return jnp.where(alpha > 1e10, poisson, negbinom)

    def random(self, point=None, size=None):
        mu, alpha = draw_values([self.mu, self.alpha], point=point, size=size)
        return generate_samples(
            lambda mu, alpha, size: np.random.poisson(
                np.random.gamma(alpha, mu / alpha, size=size), size=size),
            mu, alpha, dist_shape=self.shape, size=size)


class Geometric(Discrete):
    r"""Geometric, support {1, 2, ...} (cf. ``discrete.py:719``)."""

    def __init__(self, p, *args, **kwargs):
        self.p = _an(p)
        self.mode = as_node(np.asarray(1, dtype=intX()))
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.p)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        p, = self._ev_params(("p",), env, memo)
        return bound(jnp.log(p) + logpow(1.0 - p, value - 1.0),
                     value >= 1, p <= 1, p > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        p, = self._ev_params(("p",), env, memo)
        k = jnp.floor(value)
        return jnp.where(value < 1, -jnp.inf,
                         jnp.log1p(-jnp.power(1.0 - p, jnp.maximum(k, 1.0))))

    def random(self, point=None, size=None):
        p, = draw_values([self.p], point=point, size=size)
        return generate_samples(
            lambda p, size: np.random.geometric(p, size=size),
            p, dist_shape=self.shape, size=size)


class DiscreteUniform(Discrete):
    r"""Discrete uniform on {lower..upper} (cf. ``discrete.py:810``)."""

    def __init__(self, lower, upper, *args, **kwargs):
        self.lower = as_node(np.asarray(np.floor(np.asarray(
            lower if not isinstance(lower, Node) else lower.test_value)),
            dtype=intX())) if not isinstance(lower, Node) else lower
        self.upper = as_node(np.asarray(np.floor(np.asarray(
            upper if not isinstance(upper, Node) else upper.test_value)),
            dtype=intX())) if not isinstance(upper, Node) else upper
        self.mode = apply(
            lambda l, u: jnp.asarray(jnp.maximum(jnp.floor((l + u) / 2.0), l),
                                     dtype=intX()),
            self.lower, self.upper)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.lower, self.upper)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        lower, upper = self._ev_params(("lower", "upper"), env, memo)
        return bound(-jnp.log(upper - lower + 1.0),
                     value >= lower, value <= upper)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        lower, upper = self._ev_params(("lower", "upper"), env, memo)
        k = jnp.floor(value)
        return jnp.where(
            value < lower, -jnp.inf,
            jnp.where(value >= upper, 0.0,
                      jnp.log(jnp.minimum(k, upper) - lower + 1.0)
                      - jnp.log(upper - lower + 1.0)))

    def random(self, point=None, size=None):
        lower, upper = draw_values([self.lower, self.upper], point=point,
                                   size=size)
        return generate_samples(
            lambda lower, upper, size: st.randint.rvs(
                lower, upper + 1, size=size),
            lower, upper, dist_shape=self.shape, size=size)


class Categorical(Discrete):
    r"""Categorical over {0..K-1} (cf. ``discrete.py:915``)."""

    def __init__(self, p, *args, **kwargs):
        self.p = _an(p)
        self.k = int(np.shape(self.p.test_value)[-1])
        self.mode = apply(
            lambda p: jnp.asarray(jnp.argmax(p, axis=-1), dtype=intX()),
            self.p)
        if kwargs.get("shape") is None:
            batch = tuple(np.shape(self.p.test_value)[:-1])
            kwargs["shape"] = kwargs.pop("shape", None) or batch
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        p, = self._ev_params(("p",), env, memo)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        value = jnp.asarray(value, dtype=intX())
        k = p.shape[-1]
        safe_val = jnp.clip(value, 0, k - 1)
        sel = jnp.take_along_axis(
            jnp.broadcast_to(p, jnp.broadcast_shapes(p.shape,
                                                     safe_val.shape + (k,))),
            safe_val[..., None], axis=-1)[..., 0]
        return bound(jnp.log(sel), value >= 0, value <= k - 1,
                     jnp.all(p >= 0, axis=-1), jnp.all(p <= 1, axis=-1))

    def random(self, point=None, size=None):
        p, = draw_values([self.p], point=point, size=size)
        return generate_samples(
            lambda p, size: random_choice(p, size=size)
            if np.ndim(p) > 1 else np.random.choice(
                np.shape(p)[-1], p=np.asarray(p) / np.sum(p), size=size),
            p, dist_shape=self.shape, size=size,
            broadcast_shape=np.shape(p)[:-1])


class Constant(Discrete):
    r"""Point mass (cf. ``discrete.py:1044``)."""

    def __init__(self, c, *args, **kwargs):
        self.mean = self.median = self.mode = self.c = _an(c)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.c)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        c, = self._ev_params(("c",), env, memo)
        return bound(jnp.zeros_like(jnp.asarray(value, dtype=floatX())),
                     jnp.equal(value, c))

    def random(self, point=None, size=None):
        c, = draw_values([self.c], point=point, size=size)
        return generate_samples(
            lambda c, size: np.full(size if size is not None else np.shape(c),
                                    c),
            c, dist_shape=self.shape, size=size)


ConstantDist = Constant


class _ZeroInflated(Discrete):
    """Shared machinery for zero-inflated mixtures."""

    def _zi_logp(self, value, psi, base_logp_at_value, base_logp_at_zero):
        logp_nonzero = jnp.log(psi) + base_logp_at_value
        logp_zero = jnp.logaddexp(jnp.log1p(-psi),
                                  jnp.log(psi) + base_logp_at_zero)
        return jnp.where(value > 0, logp_nonzero, logp_zero)


class ZeroInflatedPoisson(_ZeroInflated):
    r"""Zero-inflated Poisson (cf. ``discrete.py:1113``)."""

    def __init__(self, psi, theta, *args, **kwargs):
        self.theta = _an(theta)
        self.psi = _an(psi)
        self.mode = apply(lambda t: jnp.asarray(jnp.floor(t), dtype=intX()),
                          self.theta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.psi, self.theta)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        psi, theta = self._ev_params(("psi", "theta"), env, memo)
        base = logpow(theta, value) - factln(value) - theta
        out = self._zi_logp(value, psi, base, -theta)
        return bound(out, value >= 0, psi >= 0, psi <= 1, theta >= 0)

    def random(self, point=None, size=None):
        psi, theta = draw_values([self.psi, self.theta], point=point,
                                 size=size)
        return generate_samples(
            lambda psi, theta, size: np.random.poisson(theta, size=size)
            * (np.random.uniform(size=size) < psi),
            psi, theta, dist_shape=self.shape, size=size)


class ZeroInflatedBinomial(_ZeroInflated):
    r"""Zero-inflated binomial (cf. ``discrete.py:1233``)."""

    def __init__(self, psi, n, p, *args, **kwargs):
        self.n = _an(n)
        self.p = _an(p)
        self.psi = _an(psi)
        self.mode = apply(
            lambda n, p: jnp.asarray(jnp.clip(jnp.round(n * p), 0, n),
                                     dtype=intX()), self.n, self.p)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.psi, self.n, self.p)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        psi, n, p = self._ev_params(("psi", "n", "p"), env, memo)
        base = binomln(n, value) + logpow(p, value) + logpow(1.0 - p, n - value)
        base_zero = n * jnp.log1p(-jnp.where(p < 1, p, 0.0))
        out = self._zi_logp(value, psi, base, base_zero)
        return bound(out, value >= 0, value <= n, psi >= 0, psi <= 1,
                     p >= 0, p <= 1)

    def random(self, point=None, size=None):
        psi, n, p = draw_values([self.psi, self.n, self.p], point=point,
                                size=size)
        return generate_samples(
            lambda psi, n, p, size: np.random.binomial(
                n.astype(int) if np.ndim(n) else int(n), p, size=size)
            * (np.random.uniform(size=size) < psi),
            psi, n, p, dist_shape=self.shape, size=size)


class ZeroInflatedNegativeBinomial(_ZeroInflated):
    r"""Zero-inflated negative binomial (cf. ``discrete.py:1362``)."""

    def __init__(self, psi, mu, alpha, *args, **kwargs):
        self.mu = _an(mu)
        self.alpha = _an(alpha)
        self.psi = _an(psi)
        self.mode = apply(lambda m: jnp.asarray(jnp.floor(m), dtype=intX()),
                          self.mu)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.psi, self.mu, self.alpha)
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        psi, mu, alpha = self._ev_params(("psi", "mu", "alpha"), env, memo)
        base = (binomln(value + alpha - 1.0, value)
                + logpow(mu / (mu + alpha), value)
                + logpow(alpha / (mu + alpha), alpha))
        base_zero = alpha * (jnp.log(alpha) - jnp.log(alpha + mu))
        out = self._zi_logp(value, psi, base, base_zero)
        return bound(out, value >= 0, psi >= 0, psi <= 1, mu > 0, alpha > 0)

    def random(self, point=None, size=None):
        psi, mu, alpha = draw_values([self.psi, self.mu, self.alpha],
                                     point=point, size=size)
        return generate_samples(
            lambda psi, mu, alpha, size: np.random.poisson(
                np.random.gamma(alpha, mu / alpha, size=size), size=size)
            * (np.random.uniform(size=size) < psi),
            psi, mu, alpha, dist_shape=self.shape, size=size)


class OrderedLogistic(Categorical):
    r"""Ordered logistic via cumulative-logit categorical
    (cf. ``discrete.py:1531``)."""

    def __init__(self, eta, cutpoints, *args, **kwargs):
        self.eta = _an(eta)
        self.cutpoints = _an(cutpoints)

        def _p(eta, cutpoints):
            eta_ = jnp.asarray(eta)[..., None]
            pa = jss.expit(cutpoints - eta_)
            p_cum = jnp.concatenate(
                [jnp.zeros_like(pa[..., :1]), pa,
                 jnp.ones_like(pa[..., :1])], axis=-1)
            return p_cum[..., 1:] - p_cum[..., :-1]

        p = apply(_p, self.eta, self.cutpoints)
        super().__init__(p=p, *args, **kwargs)
