"""Univariate continuous distributions, mirroring
``pymc3/distributions/continuous.py`` (4366 LoC, 30 distributions).

Each distribution stores its parameters as symbolic nodes, exposes a pure-jnp
``logp`` (elementwise, ``-inf`` outside support via ``bound``), a numpy/scipy
forward sampler ``random`` with the reference's size/dist_shape semantics, and
``logcdf`` where the reference has one. Default transforms match the
reference (log for positive, logodds for unit-interval, interval for bounded).
"""
from __future__ import annotations

import warnings

import numpy as np
import scipy.stats as st
import scipy.interpolate
import jax
import jax.numpy as jnp
import jax.scipy.special as jss

from ..config import floatX
from ..node import Node, as_node, evaluate, apply
from . import transforms
from .dist_math import (
    bound, logpow, betaln, std_cdf, normal_lcdf, normal_lccdf,
    log_diff_normal_cdf, clipped_beta_rvs,
)
from .special import log_i0
from .distribution import Continuous, Distribution, draw_values, generate_samples

__all__ = [
    "Uniform", "Flat", "HalfFlat", "Normal", "TruncatedNormal", "HalfNormal",
    "Wald", "Beta", "Kumaraswamy", "Exponential", "Laplace", "Lognormal",
    "StudentT", "Pareto", "Cauchy", "HalfCauchy", "Gamma", "InverseGamma",
    "ChiSquared", "Weibull", "HalfStudentT", "ExGaussian", "VonMises",
    "SkewNormal", "Triangular", "Gumbel", "Rice", "Logistic", "LogitNormal",
    "Interpolated",
]


class PositiveContinuous(Continuous):
    """Positive support; default log transform (cf. ``continuous.py:61``)."""

    def __init__(self, transform=transforms.log, *args, **kwargs):
        if transform == "auto" or transform is True:
            transform = transforms.log
        super().__init__(transform=transform, *args, **kwargs)


class UnitContinuous(Continuous):
    """(0, 1) support; default logodds transform (cf. ``continuous.py:69``)."""

    def __init__(self, transform=transforms.logodds, *args, **kwargs):
        if transform == "auto" or transform is True:
            transform = transforms.logodds
        super().__init__(transform=transform, *args, **kwargs)


class BoundedContinuous(Continuous):
    """Interval support (cf. ``continuous.py:77``)."""

    def __init__(self, transform="auto", lower=None, upper=None,
                 *args, **kwargs):
        lower_c = None if lower is None else _const_or_node(lower)
        upper_c = None if upper is None else _const_or_node(upper)
        if transform == "auto" or transform is True:
            if lower is None and upper is None:
                transform = None
            elif lower is not None and upper is not None:
                transform = transforms.interval(lower_c, upper_c)
            elif upper is not None:
                transform = transforms.upperbound(upper_c)
            else:
                transform = transforms.lowerbound(lower_c)
        super().__init__(transform=transform, *args, **kwargs)


def _const_or_node(x):
    return x if isinstance(x, Node) else floatX(np.asarray(x))


def assert_negative_support(var, label, distname, value=-1e-6):
    """Warn when a parameter's test value is negative
    (cf. ``continuous.py:91``)."""
    try:
        tv = np.asarray(as_node(var).test_value)
    except Exception:
        return
    if np.any(tv <= value):
        warnings.warn(
            f"The variable specified for {label} has negative support for "
            f"{distname}, likely making it unsuitable for this parameter.",
            UserWarning)


def get_tau_sigma(tau=None, sigma=None):
    """Find precision/stddev pair from whichever was given
    (cf. ``continuous.py:108``). Node-aware."""
    if tau is None:
        if sigma is None:
            sigma = as_node(floatX(1.0))
            tau = as_node(floatX(1.0))
        else:
            sigma = as_node(sigma)
            tau = apply(lambda s: s ** -2.0, sigma)
    else:
        if sigma is not None:
            raise ValueError("Can't pass both tau and sigma")
        tau = as_node(tau)
        sigma = apply(lambda t: t ** -0.5, tau)
    return tau, sigma


def _norm(env, memo):
    return (env or {}), ({} if memo is None else memo)


class Uniform(BoundedContinuous):
    r"""Continuous uniform (cf. ``continuous.py:147``)."""

    def __init__(self, lower=0, upper=1, *args, **kwargs):
        self.lower = lower = as_node(floatX(lower) if not isinstance(lower, Node) else lower)
        self.upper = upper = as_node(floatX(upper) if not isinstance(upper, Node) else upper)
        self.mean = apply(lambda l, u: (l + u) / 2.0, lower, upper)
        self.median = self.mean
        if "shape" not in kwargs or kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                lower, upper)
        super().__init__(lower=lower, upper=upper, defaults=("mean",),
                         *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        lower, upper = self._ev_params(("lower", "upper"), env, memo)
        return bound(-jnp.log(upper - lower),
                     value >= lower, value <= upper)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        lower, upper = self._ev_params(("lower", "upper"), env, memo)
        return jnp.where(
            value < lower, -jnp.inf,
            jnp.where(value >= upper, 0.0,
                      jnp.log(value - lower) - jnp.log(upper - lower)))

    def random(self, point=None, size=None):
        lower, upper = draw_values([self.lower, self.upper], point=point,
                                   size=size)
        return generate_samples(
            lambda lower, upper, size: np.random.uniform(lower, upper, size=size),
            lower, upper, dist_shape=self.shape, size=size)


class Flat(Continuous):
    r"""Improper flat prior, logp = 0 (cf. ``continuous.py:276``)."""

    def __init__(self, *args, **kwargs):
        self._default = 0.0
        super().__init__(defaults=("_default",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        return jnp.zeros_like(jnp.asarray(value, dtype=floatX()))

    def logcdf(self, value, env=None, memo=None):
        value = jnp.asarray(value)
        return jnp.where(value == -jnp.inf, -jnp.inf,
                         jnp.where(value == jnp.inf, 0.0,
                                   jnp.log(0.5)))

    def random(self, point=None, size=None):
        raise ValueError("Cannot sample from Flat distribution")


class HalfFlat(PositiveContinuous):
    r"""Improper flat prior on positives (cf. ``continuous.py:346``)."""

    def __init__(self, *args, **kwargs):
        self._default = 1.0
        super().__init__(defaults=("_default",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        value = jnp.asarray(value, dtype=floatX())
        return bound(jnp.zeros_like(value), value > 0)

    def logcdf(self, value, env=None, memo=None):
        value = jnp.asarray(value)
        return jnp.where(value == jnp.inf, 0.0, -jnp.inf)

    def random(self, point=None, size=None):
        raise ValueError("Cannot sample from HalfFlat distribution")


class Normal(Continuous):
    r"""Univariate normal (cf. ``continuous.py:413``)."""

    def __init__(self, mu=0, sigma=None, tau=None, sd=None, **kwargs):
        if sd is not None:
            sigma = sd
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.sigma = self.sd = sigma
        self.tau = tau
        self.mean = self.median = self.mode = self.mu = mu = as_node(
            floatX(mu) if not isinstance(mu, Node) else mu)
        self.variance = apply(lambda t: 1.0 / t, self.tau)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.sigma)
        assert_negative_support(sigma, "sigma", "Normal")
        super().__init__(**kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, tau = self._ev_params(("mu", "tau"), env, memo)
        return bound((-tau * (value - mu) ** 2 + jnp.log(tau / np.pi / 2.0)) / 2.0,
                     tau > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, sigma = self._ev_params(("mu", "sigma"), env, memo)
        return normal_lcdf(mu, sigma, value)

    def random(self, point=None, size=None):
        mu, sigma = draw_values([self.mu, self.sigma], point=point, size=size)
        return generate_samples(
            lambda mu, sigma, size: np.random.normal(mu, sigma, size=size),
            mu, sigma, dist_shape=self.shape, size=size)


class TruncatedNormal(BoundedContinuous):
    r"""Truncated normal (cf. ``continuous.py:567``)."""

    def __init__(self, mu=0, sigma=None, tau=None, lower=None, upper=None,
                 sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.sigma = self.sd = sigma
        self.tau = tau
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        self.lower = None if lower is None else as_node(
            floatX(lower) if not isinstance(lower, Node) else lower)
        self.upper = None if upper is None else as_node(
            floatX(upper) if not isinstance(upper, Node) else upper)
        # testval: mu clipped into the support
        lo = -np.inf if lower is None else np.asarray(self.lower.test_value)
        hi = np.inf if upper is None else np.asarray(self.upper.test_value)
        self.mean = self.median = self.mode = as_node(
            floatX(np.clip(np.asarray(self.mu.test_value), lo, hi)))
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(
                kwargs.pop("shape", None), self.mu, self.sigma,
                self.lower, self.upper)
        assert_negative_support(sigma, "sigma", "TruncatedNormal")
        super().__init__(lower=self.lower, upper=self.upper,
                         defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, sigma = self._ev_params(("mu", "sigma"), env, memo)
        norm_logp = -0.5 * ((value - mu) / sigma) ** 2 \
            - jnp.log(sigma) - 0.5 * np.log(2.0 * np.pi)
        # normalizer over the truncated interval
        if self.lower is not None and self.upper is not None:
            lower, upper = self._ev_params(("lower", "upper"), env, memo)
            lnorm = log_diff_normal_cdf(mu, sigma, upper, lower)
            in_bounds = (value >= lower) & (value <= upper)
        elif self.lower is not None:
            lower, = self._ev_params(("lower",), env, memo)
            lnorm = normal_lccdf(mu, sigma, lower)
            in_bounds = value >= lower
        elif self.upper is not None:
            upper, = self._ev_params(("upper",), env, memo)
            lnorm = normal_lcdf(mu, sigma, upper)
            in_bounds = value <= upper
        else:
            lnorm = 0.0
            in_bounds = True
        return bound(norm_logp - lnorm, in_bounds, sigma > 0)

    def random(self, point=None, size=None):
        params = [self.mu, self.sigma]
        mu, sigma = draw_values(params, point=point, size=size)
        lo = -np.inf if self.lower is None else draw_values([self.lower], point=point)[0]
        hi = np.inf if self.upper is None else draw_values([self.upper], point=point)[0]
        a = (lo - mu) / sigma
        b = (hi - mu) / sigma
        return generate_samples(
            lambda mu, sigma, size: st.truncnorm.rvs(
                a, b, loc=mu, scale=sigma, size=size),
            mu, sigma, dist_shape=self.shape, size=size)


class HalfNormal(PositiveContinuous):
    r"""Half-normal (cf. ``continuous.py:784``)."""

    def __init__(self, sigma=None, tau=None, sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.sigma = self.sd = sigma
        self.tau = tau
        self.mean = apply(lambda s: s * np.sqrt(2.0 / np.pi), sigma)
        self.variance = apply(lambda t: (1.0 - 2.0 / np.pi) / t, tau)
        self.mode = as_node(floatX(np.broadcast_to(
            1.0, np.shape(sigma.test_value))))
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.sigma)
        assert_negative_support(sigma, "sigma", "HalfNormal")
        super().__init__(defaults=("mode",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        tau, sigma = self._ev_params(("tau", "sigma"), env, memo)
        return bound(-0.5 * tau * value ** 2 + 0.5 * jnp.log(tau * 2.0 / np.pi),
                     value >= 0, tau > 0, sigma > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        sigma, = self._ev_params(("sigma",), env, memo)
        z = value / sigma
        return bound(jnp.log1p(-jss.erfc(z / np.sqrt(2.0))), value >= 0,
                     sigma > 0)

    def random(self, point=None, size=None):
        sigma, = draw_values([self.sigma], point=point, size=size)
        return generate_samples(
            lambda sigma, size: np.abs(np.random.normal(0.0, sigma, size=size)),
            sigma, dist_shape=self.shape, size=size)


class Wald(PositiveContinuous):
    r"""Inverse Gaussian (cf. ``continuous.py:940``)."""

    def __init__(self, mu=None, lam=None, phi=None, alpha=0.0, *args, **kwargs):
        mu, lam, phi = self.get_mu_lam_phi(mu, lam, phi)
        self.alpha = as_node(floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        self.lam = as_node(floatX(lam) if not isinstance(lam, Node) else lam)
        self.phi = as_node(floatX(phi) if not isinstance(phi, Node) else phi)
        self.mean = apply(lambda m, a: m + a, self.mu, self.alpha)
        self.mode = apply(
            lambda m, l, a: m * ((1.0 + (1.5 * m / l) ** 2) ** 0.5
                                 - 1.5 * m / l) + a,
            self.mu, self.lam, self.alpha)
        self.variance = apply(lambda m, l: m ** 3 / l, self.mu, self.lam)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.lam)
        assert_negative_support(self.mu, "mu", "Wald")
        assert_negative_support(self.lam, "lam", "Wald")
        super().__init__(defaults=("mean",), *args, **kwargs)

    @staticmethod
    def get_mu_lam_phi(mu, lam, phi):
        """cf. ``continuous.py:1037``."""
        if mu is None:
            if lam is not None and phi is not None:
                return lam / phi, lam, phi
        else:
            if lam is None:
                if phi is None:
                    return mu, 1.0, 1.0 / mu
                return mu, mu * phi, phi
            if phi is None:
                return mu, lam, lam / mu
        raise ValueError(
            "Wald distribution must specify either mu only, mu and lam, "
            "mu and phi, or lam and phi.")

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, lam, alpha = self._ev_params(("mu", "lam", "alpha"), env, memo)
        centered = value - alpha
        safe = jnp.where(centered > 0, centered, 1.0)
        logp = (0.5 * jnp.log(lam / (2.0 * np.pi))
                - 1.5 * jnp.log(safe)
                - 0.5 * lam / safe * ((safe - mu) / mu) ** 2)
        return bound(logp, centered > 0, mu > 0, lam > 0, alpha >= 0)

    def logcdf(self, value, env=None, memo=None):
        """Inverse-Gaussian log CDF
        ``log[Φ(√(λ/x)(x/μ−1)) + e^{2λ/μ} Φ(−√(λ/x)(x/μ+1))]``.

        cf. ``continuous.py:1124`` — NOTE: the reference's v3.8 expression
        mis-scales both Φ arguments and the exponent for μ≠1 (fixed
        upstream post-3.8); this implements the correct closed form,
        verified against ``scipy.stats.invgauss``.
        """
        env, memo = _norm(env, memo)
        mu, lam, alpha = self._ev_params(("mu", "lam", "alpha"), env, memo)
        value = jnp.asarray(value, floatX())
        x = value - alpha
        safe = jnp.where(x > 0, x, 1.0)
        rt = jnp.sqrt(lam / safe)
        a = normal_lcdf(0.0, 1.0, rt * (safe / mu - 1.0))
        b = 2.0 * lam / mu + normal_lcdf(0.0, 1.0, -rt * (safe / mu + 1.0))
        lcdf = a + jnp.log1p(jnp.exp(b - a))
        lcdf = jnp.minimum(lcdf, 0.0)
        return bound(jnp.where(x > 0, lcdf, -jnp.inf),
                     mu > 0, lam > 0, alpha >= 0)

    def random(self, point=None, size=None):
        mu, lam, alpha = draw_values([self.mu, self.lam, self.alpha],
                                     point=point, size=size)
        return generate_samples(
            lambda mu, lam, alpha, size: np.random.wald(mu, lam, size=size) + alpha,
            mu, lam, alpha, dist_shape=self.shape, size=size)


class Beta(UnitContinuous):
    r"""Beta (cf. ``continuous.py:1178``)."""

    def __init__(self, alpha=None, beta=None, mu=None, sigma=None, sd=None,
                 *args, **kwargs):
        if sd is not None:
            sigma = sd
        alpha, beta = self.get_alpha_beta(alpha, beta, mu, sigma)
        self.alpha = as_node(floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.beta = as_node(floatX(beta) if not isinstance(beta, Node) else beta)
        self.mean = apply(lambda a, b: a / (a + b), self.alpha, self.beta)
        self.variance = apply(
            lambda a, b: a * b / ((a + b) ** 2 * (a + b + 1.0)),
            self.alpha, self.beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.alpha, self.beta)
        assert_negative_support(self.alpha, "alpha", "Beta")
        assert_negative_support(self.beta, "beta", "Beta")
        super().__init__(defaults=("mean",), *args, **kwargs)

    @staticmethod
    def get_alpha_beta(alpha=None, beta=None, mu=None, sigma=None):
        """cf. ``continuous.py:1254``."""
        if alpha is not None and beta is not None:
            return alpha, beta
        if mu is not None and sigma is not None:
            kappa = mu * (1 - mu) / sigma ** 2 - 1
            return mu * kappa, (1 - mu) * kappa
        raise ValueError(
            "Incompatible parameterization. Either use alpha and beta, or mu "
            "and sigma to specify distribution.")

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        logval = jnp.log(jnp.where(value > 0, value, 1.0))
        log1mval = jnp.log1p(-jnp.where(value < 1, value, 0.0))
        logp = (alpha - 1.0) * logval + (beta - 1.0) * log1mval \
            - betaln(alpha, beta)
        return bound(logp, value >= 0, value <= 1, alpha > 0, beta > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        safe = jnp.clip(value, 0.0, 1.0)
        return jnp.where(
            value <= 0, -jnp.inf,
            jnp.where(value >= 1, 0.0,
                      jnp.log(jss.betainc(alpha, beta, safe))))

    def random(self, point=None, size=None):
        alpha, beta = draw_values([self.alpha, self.beta], point=point,
                                  size=size)
        return generate_samples(
            lambda alpha, beta, size: clipped_beta_rvs(alpha, beta, size=size),
            alpha, beta, dist_shape=self.shape, size=size)


class Kumaraswamy(UnitContinuous):
    r"""Kumaraswamy (cf. ``continuous.py:1362``)."""

    def __init__(self, a, b, *args, **kwargs):
        self.a = as_node(floatX(a) if not isinstance(a, Node) else a)
        self.b = as_node(floatX(b) if not isinstance(b, Node) else b)
        # mean = b * B(1 + 1/a, b)
        self.mean = apply(
            lambda a, b: jnp.exp(jnp.log(b) + jss.gammaln(1 + 1 / a)
                                 + jss.gammaln(b) - jss.gammaln(1 + 1 / a + b)),
            self.a, self.b)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.a, self.b)
        assert_negative_support(self.a, "a", "Kumaraswamy")
        assert_negative_support(self.b, "b", "Kumaraswamy")
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        a, b = self._ev_params(("a", "b"), env, memo)
        safe = jnp.clip(value, 1e-30, 1.0)
        logp = jnp.log(a) + jnp.log(b) + (a - 1.0) * jnp.log(safe) \
            + (b - 1.0) * jnp.log1p(-safe ** a)
        return bound(logp, value >= 0, value <= 1, a > 0, b > 0)

    def random(self, point=None, size=None):
        a, b = draw_values([self.a, self.b], point=point, size=size)
        # inverse CDF: x = (1 - (1 - u)^(1/b))^(1/a)
        return generate_samples(
            lambda a, b, size: (1.0 - (1.0 - np.random.uniform(size=size))
                                ** (1.0 / b)) ** (1.0 / a),
            a, b, dist_shape=self.shape, size=size)


class Exponential(PositiveContinuous):
    r"""Exponential (cf. ``continuous.py:1479``)."""

    def __init__(self, lam, *args, **kwargs):
        self.lam = as_node(floatX(lam) if not isinstance(lam, Node) else lam)
        self.mean = apply(lambda l: 1.0 / l, self.lam)
        self.median = apply(lambda l: np.log(2.0) / l, self.lam)
        self.mode = as_node(floatX(np.zeros(np.shape(self.lam.test_value))))
        self.variance = apply(lambda l: l ** -2.0, self.lam)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.lam)
        assert_negative_support(self.lam, "lam", "Exponential")
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        lam, = self._ev_params(("lam",), env, memo)
        return bound(jnp.log(lam) - lam * value, value >= 0, lam > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        lam, = self._ev_params(("lam",), env, memo)
        a = lam * value
        return jnp.where(a <= 0, -jnp.inf,
                         jnp.log1p(-jnp.exp(-jnp.maximum(a, 1e-30))))

    def random(self, point=None, size=None):
        lam, = draw_values([self.lam], point=point, size=size)
        return generate_samples(
            lambda lam, size: np.random.exponential(1.0 / lam, size=size),
            lam, dist_shape=self.shape, size=size)


class Laplace(Continuous):
    r"""Laplace (cf. ``continuous.py:1609``)."""

    def __init__(self, mu, b, *args, **kwargs):
        self.b = as_node(floatX(b) if not isinstance(b, Node) else b)
        self.mean = self.median = self.mode = self.mu = as_node(
            floatX(mu) if not isinstance(mu, Node) else mu)
        self.variance = apply(lambda b: 2.0 * b ** 2, self.b)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.b)
        assert_negative_support(self.b, "b", "Laplace")
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, b = self._ev_params(("mu", "b"), env, memo)
        return -jnp.log(2.0 * b) - jnp.abs(value - mu) / b

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, b = self._ev_params(("mu", "b"), env, memo)
        y = (value - mu) / b
        return jnp.where(y <= 0, jnp.log(0.5) + y,
                         jnp.log1p(-0.5 * jnp.exp(-jnp.abs(y))))

    def random(self, point=None, size=None):
        mu, b = draw_values([self.mu, self.b], point=point, size=size)
        return generate_samples(
            lambda mu, b, size: np.random.laplace(mu, b, size=size),
            mu, b, dist_shape=self.shape, size=size)


class Lognormal(PositiveContinuous):
    r"""Log-normal (cf. ``continuous.py:1740``)."""

    def __init__(self, mu=0, sigma=None, tau=None, sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        self.tau = tau
        self.sigma = self.sd = sigma
        self.mean = apply(lambda m, t: jnp.exp(m + 0.5 / t), self.mu, self.tau)
        self.median = apply(jnp.exp, self.mu)
        self.mode = apply(lambda m, t: jnp.exp(m - 1.0 / t), self.mu, self.tau)
        self.variance = apply(
            lambda m, t: (jnp.exp(1.0 / t) - 1.0) * jnp.exp(2 * m + 1.0 / t),
            self.mu, self.tau)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.sigma)
        assert_negative_support(sigma, "sigma", "Lognormal")
        super().__init__(defaults=("median",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, tau = self._ev_params(("mu", "tau"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        logp = -0.5 * tau * (jnp.log(safe) - mu) ** 2 \
            + 0.5 * jnp.log(tau / (2.0 * np.pi)) - jnp.log(safe)
        return bound(logp, value > 0, tau > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, sigma = self._ev_params(("mu", "sigma"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        return jnp.where(value > 0, normal_lcdf(mu, sigma, jnp.log(safe)),
                         -jnp.inf)

    def random(self, point=None, size=None):
        mu, tau = draw_values([self.mu, self.tau], point=point, size=size)
        return generate_samples(
            lambda mu, tau, size: np.random.lognormal(mu, tau ** -0.5, size=size),
            mu, tau, dist_shape=self.shape, size=size)


class StudentT(Continuous):
    r"""Student's t (cf. ``continuous.py:1913``)."""

    def __init__(self, nu, mu=0, lam=None, sigma=None, sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        self.nu = as_node(floatX(nu) if not isinstance(nu, Node) else nu)
        lam, sigma = get_tau_sigma(tau=lam, sigma=sigma)
        self.lam = lam
        self.sigma = self.sd = sigma
        self.mean = self.median = self.mode = self.mu = as_node(
            floatX(mu) if not isinstance(mu, Node) else mu)
        self.variance = apply(
            lambda nu, lam: jnp.where(
                nu > 2, nu / jnp.where(nu > 2, nu - 2.0, 1.0) / lam,
                jnp.inf),
            self.nu, self.lam)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.sigma, self.nu)
        assert_negative_support(lam, "lam (sigma)", "StudentT")
        assert_negative_support(nu, "nu", "StudentT")
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        nu, mu, lam, sigma = self._ev_params(("nu", "mu", "lam", "sigma"),
                                             env, memo)
        logp = (jss.gammaln((nu + 1.0) / 2.0)
                + 0.5 * jnp.log(lam / (nu * np.pi))
                - jss.gammaln(nu / 2.0)
                - (nu + 1.0) / 2.0 * jnp.log1p(lam * (value - mu) ** 2 / nu))
        return bound(logp, lam > 0, nu > 0, sigma > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        nu, mu, sigma = self._ev_params(("nu", "mu", "sigma"), env, memo)
        t = (value - mu) / sigma
        sq = nu / (nu + t ** 2)
        it = 0.5 * jss.betainc(nu / 2.0, 0.5, sq)
        return jnp.log(jnp.where(t >= 0, 1.0 - it, it))

    def random(self, point=None, size=None):
        nu, mu, lam = draw_values([self.nu, self.mu, self.lam], point=point,
                                  size=size)
        return generate_samples(
            lambda nu, mu, lam, size: st.t.rvs(nu, mu, lam ** -0.5, size=size),
            nu, mu, lam, dist_shape=self.shape, size=size)


class Pareto(Continuous):
    r"""Pareto (cf. ``continuous.py:2082``)."""

    def __init__(self, alpha, m, transform="lowerbound", *args, **kwargs):
        self.alpha = as_node(floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.m = as_node(floatX(m) if not isinstance(m, Node) else m)
        self.mean = apply(
            # double-where so a == 1 never divides by zero (the undefined
            # branch still reports inf, without a RuntimeWarning)
            lambda a, m: jnp.where(a > 1,
                                   a * m / jnp.where(a > 1, a - 1.0, 1.0),
                                   jnp.inf),
            self.alpha, self.m)
        self.median = apply(lambda a, m: m * 2.0 ** (1.0 / a),
                            self.alpha, self.m)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.alpha, self.m)
        assert_negative_support(self.alpha, "alpha", "Pareto")
        assert_negative_support(self.m, "m", "Pareto")
        if transform == "lowerbound":
            transform = transforms.lowerbound(self.m)
        super().__init__(transform=transform, defaults=("median",),
                         *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, m = self._ev_params(("alpha", "m"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        logp = jnp.log(alpha) + logpow(m, alpha) - (alpha + 1.0) * jnp.log(safe)
        return bound(logp, value >= m, alpha > 0, m > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, m = self._ev_params(("alpha", "m"), env, memo)
        arg = (m / jnp.where(value > 0, value, 1.0)) ** alpha
        return jnp.where(value < m, -jnp.inf,
                         jnp.where(arg > 1e-5, jnp.log1p(-arg), -arg))

    def random(self, point=None, size=None):
        alpha, m = draw_values([self.alpha, self.m], point=point, size=size)
        return generate_samples(
            lambda alpha, m, size: st.pareto.rvs(alpha, scale=m, size=size),
            alpha, m, dist_shape=self.shape, size=size)


class Cauchy(Continuous):
    r"""Cauchy (cf. ``continuous.py:2232``)."""

    def __init__(self, alpha, beta, *args, **kwargs):
        self.median = self.mode = self.alpha = as_node(
            floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.beta = as_node(floatX(beta) if not isinstance(beta, Node) else beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.alpha, self.beta)
        assert_negative_support(self.beta, "beta", "Cauchy")
        super().__init__(defaults=("median",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        return bound(-jnp.log(np.pi) - jnp.log(beta)
                     - jnp.log1p(((value - alpha) / beta) ** 2), beta > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        return jnp.log(0.5 + jnp.arctan((value - alpha) / beta) / np.pi)

    def random(self, point=None, size=None):
        alpha, beta = draw_values([self.alpha, self.beta], point=point,
                                  size=size)
        return generate_samples(
            lambda alpha, beta, size: st.cauchy.rvs(alpha, beta, size=size),
            alpha, beta, dist_shape=self.shape, size=size)


class HalfCauchy(PositiveContinuous):
    r"""Half-Cauchy (cf. ``continuous.py:2361``)."""

    def __init__(self, beta, *args, **kwargs):
        self.mode = as_node(floatX(np.zeros(np.shape(
            as_node(beta).test_value if isinstance(beta, Node) else beta))))
        self.median = self.beta = as_node(
            floatX(beta) if not isinstance(beta, Node) else beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.beta)
        assert_negative_support(self.beta, "beta", "HalfCauchy")
        super().__init__(defaults=("median",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        beta, = self._ev_params(("beta",), env, memo)
        return bound(jnp.log(2.0) - jnp.log(np.pi) - jnp.log(beta)
                     - jnp.log1p((value / beta) ** 2),
                     value >= 0, beta > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        beta, = self._ev_params(("beta",), env, memo)
        return bound(jnp.log(2.0 * jnp.arctan(value / beta) / np.pi),
                     value >= 0, beta > 0)

    def random(self, point=None, size=None):
        beta, = draw_values([self.beta], point=point, size=size)
        return generate_samples(
            lambda beta, size: np.abs(st.cauchy.rvs(0, beta, size=size)),
            beta, dist_shape=self.shape, size=size)


class Gamma(PositiveContinuous):
    r"""Gamma (cf. ``continuous.py:2482``)."""

    def __init__(self, alpha=None, beta=None, mu=None, sigma=None, sd=None,
                 *args, **kwargs):
        if sd is not None:
            sigma = sd
        alpha, beta = self.get_alpha_beta(alpha, beta, mu, sigma)
        self.alpha = as_node(floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.beta = as_node(floatX(beta) if not isinstance(beta, Node) else beta)
        self.mean = apply(lambda a, b: a / b, self.alpha, self.beta)
        self.mode = apply(lambda a, b: jnp.maximum((a - 1.0) / b, 0.0),
                          self.alpha, self.beta)
        self.variance = apply(lambda a, b: a / b ** 2, self.alpha, self.beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.alpha, self.beta)
        assert_negative_support(self.alpha, "alpha", "Gamma")
        assert_negative_support(self.beta, "beta", "Gamma")
        super().__init__(defaults=("mean",), *args, **kwargs)

    @staticmethod
    def get_alpha_beta(alpha=None, beta=None, mu=None, sigma=None):
        """cf. ``continuous.py:2560``."""
        if alpha is not None and beta is not None:
            return alpha, beta
        if mu is not None and sigma is not None:
            return (mu / sigma) ** 2, mu / sigma ** 2
        raise ValueError(
            "Incompatible parameterization. Either use alpha and beta, or mu "
            "and sigma to specify distribution.")

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        logp = (-jss.gammaln(alpha) + logpow(beta, alpha)
                - beta * value + logpow(value, alpha - 1.0))
        return bound(logp, value >= 0, alpha > 0, beta > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        return bound(jnp.log(jss.gammainc(alpha, beta * safe)),
                     value >= 0, alpha > 0, beta > 0)

    def random(self, point=None, size=None):
        alpha, beta = draw_values([self.alpha, self.beta], point=point,
                                  size=size)
        return generate_samples(
            lambda alpha, beta, size: st.gamma.rvs(
                alpha, scale=1.0 / beta, size=size),
            alpha, beta, dist_shape=self.shape, size=size)


class InverseGamma(PositiveContinuous):
    r"""Inverse gamma (cf. ``continuous.py:2653``)."""

    def __init__(self, alpha=None, beta=None, mu=None, sigma=None, sd=None,
                 *args, **kwargs):
        if sd is not None:
            sigma = sd
        alpha, beta = self._get_alpha_beta(alpha, beta, mu, sigma)
        self.alpha = as_node(floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.beta = as_node(floatX(beta) if not isinstance(beta, Node) else beta)
        self.mean = apply(
            lambda a, b: jnp.where(
                a > 1, b / jnp.where(a > 1, a - 1.0, 1.0), jnp.inf),
            self.alpha, self.beta)
        self.mode = apply(lambda a, b: b / (a + 1.0), self.alpha, self.beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.alpha, self.beta)
        assert_negative_support(self.alpha, "alpha", "InverseGamma")
        assert_negative_support(self.beta, "beta", "InverseGamma")
        super().__init__(defaults=("mode",), *args, **kwargs)

    @classmethod
    def _get_alpha_beta(cls, alpha, beta, mu, sigma):
        """cf. ``continuous.py:2725``."""
        if alpha is not None:
            if beta is None:
                beta = 1.0
        elif mu is not None and sigma is not None:
            alpha = (2 * sigma ** 2 + mu ** 2) / sigma ** 2
            beta = mu * (mu ** 2 + sigma ** 2) / sigma ** 2
        else:
            raise ValueError(
                "Incompatible parameterization. Either use alpha and "
                "(optionally) beta, or mu and sigma to specify distribution.")
        return alpha, beta

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        logp = (logpow(beta, alpha) - jss.gammaln(alpha) - beta / safe
                + logpow(safe, -alpha - 1.0))
        return bound(logp, value > 0, alpha > 0, beta > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        return bound(jnp.log(jss.gammaincc(alpha, beta / safe)),
                     value > 0, alpha > 0, beta > 0)

    def random(self, point=None, size=None):
        alpha, beta = draw_values([self.alpha, self.beta], point=point,
                                  size=size)
        return generate_samples(
            lambda alpha, beta, size: st.invgamma.rvs(
                alpha, scale=beta, size=size),
            alpha, beta, dist_shape=self.shape, size=size)


class ChiSquared(Gamma):
    r"""Chi-squared: Gamma(nu/2, 1/2) (cf. ``continuous.py:2803``)."""

    def __init__(self, nu, *args, **kwargs):
        self.nu = as_node(floatX(nu) if not isinstance(nu, Node) else nu)
        super().__init__(alpha=apply(lambda n: n / 2.0, self.nu),
                         beta=floatX(0.5), *args, **kwargs)

    def random(self, point=None, size=None):
        nu, = draw_values([self.nu], point=point, size=size)
        return generate_samples(
            lambda nu, size: st.chi2.rvs(nu, size=size),
            nu, dist_shape=self.shape, size=size)


class Weibull(PositiveContinuous):
    r"""Weibull (cf. ``continuous.py:2854``)."""

    def __init__(self, alpha, beta, *args, **kwargs):
        self.alpha = as_node(floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.beta = as_node(floatX(beta) if not isinstance(beta, Node) else beta)
        self.mean = apply(
            lambda a, b: b * jnp.exp(jss.gammaln(1.0 + 1.0 / a)),
            self.alpha, self.beta)
        self.median = apply(
            lambda a, b: b * jnp.power(jnp.log(2.0), 1.0 / a),
            self.alpha, self.beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.alpha, self.beta)
        assert_negative_support(self.alpha, "alpha", "Weibull")
        assert_negative_support(self.beta, "beta", "Weibull")
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        safe = jnp.where(value > 0, value, 1.0)
        logp = (jnp.log(alpha) - jnp.log(beta)
                + (alpha - 1.0) * jnp.log(safe / beta)
                - (safe / beta) ** alpha)
        return bound(logp, value >= 0, alpha > 0, beta > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        alpha, beta = self._ev_params(("alpha", "beta"), env, memo)
        a = (jnp.where(value > 0, value, 1.0) / beta) ** alpha
        return bound(jnp.log1p(-jnp.exp(-a)), value >= 0, alpha > 0, beta > 0)

    def random(self, point=None, size=None):
        alpha, beta = draw_values([self.alpha, self.beta], point=point,
                                  size=size)
        return generate_samples(
            lambda alpha, beta, size: beta * np.random.weibull(alpha, size=size),
            alpha, beta, dist_shape=self.shape, size=size)


class HalfStudentT(PositiveContinuous):
    r"""Half Student's t (cf. ``continuous.py:3004``)."""

    def __init__(self, nu=1, sigma=None, lam=None, sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        self.mode = as_node(floatX(0.0))
        lam, sigma = get_tau_sigma(lam, sigma)
        self.median = apply(lambda s: s, sigma)
        self.sigma = self.sd = sigma
        self.lam = lam
        self.nu = as_node(floatX(nu) if not isinstance(nu, Node) else nu)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.sigma, self.nu)
        assert_negative_support(self.sigma, "sigma", "HalfStudentT")
        assert_negative_support(self.nu, "nu", "HalfStudentT")
        super().__init__(defaults=("median",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        nu, sigma, lam = self._ev_params(("nu", "sigma", "lam"), env, memo)
        logp = (jnp.log(2.0) + jss.gammaln((nu + 1.0) / 2.0)
                - jss.gammaln(nu / 2.0)
                - 0.5 * jnp.log(nu * np.pi * sigma ** 2)
                - (nu + 1.0) / 2.0 * jnp.log1p(value ** 2 / (nu * sigma ** 2)))
        return bound(logp, value >= 0, nu > 0, sigma > 0, lam > 0)

    def random(self, point=None, size=None):
        nu, sigma = draw_values([self.nu, self.sigma], point=point, size=size)
        return generate_samples(
            lambda nu, sigma, size: np.abs(st.t.rvs(nu, 0.0, sigma, size=size)),
            nu, sigma, dist_shape=self.shape, size=size)


class ExGaussian(Continuous):
    r"""Exponentially modified Gaussian (cf. ``continuous.py:3139``)."""

    def __init__(self, mu=0.0, sigma=None, nu=None, sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        self.sigma = self.sd = as_node(
            floatX(sigma) if not isinstance(sigma, Node) else sigma)
        self.nu = as_node(floatX(nu) if not isinstance(nu, Node) else nu)
        self.mean = apply(lambda m, n: m + n, self.mu, self.nu)
        self.variance = apply(lambda s, n: s ** 2 + n ** 2, self.sigma, self.nu)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.sigma, self.nu)
        assert_negative_support(self.sigma, "sigma", "ExGaussian")
        assert_negative_support(self.nu, "nu", "ExGaussian")
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, sigma, nu = self._ev_params(("mu", "sigma", "nu"), env, memo)
        # standard stable formulation: -log nu + (mu-v)/nu + sigma^2/(2 nu^2)
        #                              + log Phi((v-mu)/sigma - sigma/nu)
        logp = (-jnp.log(nu) + (mu - value) / nu
                + 0.5 * (sigma / nu) ** 2
                + normal_lcdf(mu + (sigma ** 2) / nu, sigma, value))
        return bound(logp, sigma > 0, nu > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, sigma, nu = self._ev_params(("mu", "sigma", "nu"), env, memo)
        z = (value - mu) / sigma
        exp_arg = (sigma / nu) ** 2 / 2.0 - (value - mu) / nu \
            + normal_lcdf(mu + (sigma ** 2) / nu, sigma, value)
        return jnp.log(jss.ndtr(z) - jnp.exp(exp_arg))

    def random(self, point=None, size=None):
        mu, sigma, nu = draw_values([self.mu, self.sigma, self.nu],
                                    point=point, size=size)
        return generate_samples(
            lambda mu, sigma, nu, size: np.random.normal(mu, sigma, size=size)
            + np.random.exponential(scale=nu, size=size),
            mu, sigma, nu, dist_shape=self.shape, size=size)


class VonMises(Continuous):
    r"""Von Mises circular (cf. ``continuous.py:3326``)."""

    def __init__(self, mu=0.0, kappa=None, transform="circular",
                 *args, **kwargs):
        if transform == "circular":
            transform = transforms.Circular()
        self.mean = self.median = self.mode = self.mu = as_node(
            floatX(mu) if not isinstance(mu, Node) else mu)
        self.kappa = as_node(floatX(kappa) if not isinstance(kappa, Node) else kappa)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.kappa)
        assert_negative_support(self.kappa, "kappa", "VonMises")
        super().__init__(transform=transform, defaults=("mean",),
                         *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, kappa = self._ev_params(("mu", "kappa"), env, memo)
        return bound(kappa * jnp.cos(mu - value) - np.log(2 * np.pi)
                     - log_i0(kappa),
                     kappa > 0, value >= -np.pi, value <= np.pi)

    def random(self, point=None, size=None):
        mu, kappa = draw_values([self.mu, self.kappa], point=point, size=size)
        return generate_samples(
            lambda mu, kappa, size: st.vonmises.rvs(kappa, loc=mu, size=size),
            mu, kappa, dist_shape=self.shape, size=size)


class SkewNormal(Continuous):
    r"""Skew-normal (cf. ``continuous.py:3434``)."""

    def __init__(self, mu=0.0, sigma=None, tau=None, alpha=1, sd=None,
                 *args, **kwargs):
        if sd is not None:
            sigma = sd
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        self.tau = tau
        self.sigma = self.sd = sigma
        self.alpha = as_node(floatX(alpha) if not isinstance(alpha, Node) else alpha)
        self.mean = apply(
            lambda m, s, a: m + s * (2.0 / np.pi) ** 0.5 * a / (1.0 + a ** 2) ** 0.5,
            self.mu, self.sigma, self.alpha)
        self.variance = apply(
            lambda s, a: s ** 2 * (1.0 - (2.0 * a ** 2) / ((1.0 + a ** 2) * np.pi)),
            self.sigma, self.alpha)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.sigma, self.alpha)
        assert_negative_support(self.tau, "tau", "SkewNormal")
        assert_negative_support(self.sigma, "sigma", "SkewNormal")
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, sigma, tau, alpha = self._ev_params(
            ("mu", "sigma", "tau", "alpha"), env, memo)
        # log(2 Phi(alpha z)) via log_ndtr: log1p(erf(.)) cancels to
        # log(0) = -inf in float32 once alpha*z < ~ -5 (caught by the
        # parameter-domain matrix, tests/test_distributions_matrix.py)
        return bound(
            jnp.log(2.0) + jss.log_ndtr(alpha * (value - mu) * tau ** 0.5)
            + (-tau * (value - mu) ** 2 + jnp.log(tau / np.pi / 2.0)) / 2.0,
            tau > 0, sigma > 0)

    def random(self, point=None, size=None):
        mu, sigma, alpha = draw_values([self.mu, self.sigma, self.alpha],
                                       point=point, size=size)
        return generate_samples(
            lambda mu, sigma, alpha, size: st.skewnorm.rvs(
                a=alpha, loc=mu, scale=sigma, size=size),
            mu, sigma, alpha, dist_shape=self.shape, size=size)


class Triangular(BoundedContinuous):
    r"""Triangular (cf. ``continuous.py:3578``)."""

    def __init__(self, lower=0, upper=1, c=0.5, *args, **kwargs):
        self.median = self.mean = self.c = as_node(
            floatX(c) if not isinstance(c, Node) else c)
        self.lower = as_node(floatX(lower) if not isinstance(lower, Node) else lower)
        self.upper = as_node(floatX(upper) if not isinstance(upper, Node) else upper)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(
                kwargs.pop("shape", None), self.c, self.lower, self.upper)
        super().__init__(lower=self.lower, upper=self.upper,
                         defaults=("median",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        c, lower, upper = self._ev_params(("c", "lower", "upper"), env, memo)
        safe_l = jnp.where(value < c, value, lower)
        safe_u = jnp.where(value >= c, value, upper)
        return jnp.where(
            value < lower, -jnp.inf,
            jnp.where(value < c,
                      jnp.log(2.0 * (safe_l - lower)
                              / ((upper - lower) * (c - lower))),
                      jnp.where(value == c,
                                jnp.log(2.0 / (upper - lower)),
                                jnp.where(value <= upper,
                                          jnp.log(2.0 * (upper - safe_u)
                                                  / ((upper - lower) * (upper - c))),
                                          -jnp.inf))))

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        c, lower, upper = self._ev_params(("c", "lower", "upper"), env, memo)
        return jnp.where(
            value < lower, -jnp.inf,
            jnp.where(value <= c,
                      jnp.log(((value - lower) ** 2)
                              / ((upper - lower) * (c - lower))),
                      jnp.where(value < upper,
                                jnp.log1p(-((upper - value) ** 2)
                                          / ((upper - lower) * (upper - c))),
                                0.0)))

    def random(self, point=None, size=None):
        c, lower, upper = draw_values([self.c, self.lower, self.upper],
                                      point=point, size=size)
        return generate_samples(
            lambda c, lower, upper, size: st.triang.rvs(
                c=(c - lower) / (upper - lower), loc=lower,
                scale=upper - lower, size=size),
            c, lower, upper, dist_shape=self.shape, size=size)


class Gumbel(Continuous):
    r"""Gumbel (cf. ``continuous.py:3746``)."""

    def __init__(self, mu=0, beta=1.0, **kwargs):
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        self.beta = as_node(floatX(beta) if not isinstance(beta, Node) else beta)
        self.mean = apply(lambda m, b: m + b * np.euler_gamma, self.mu, self.beta)
        self.median = apply(lambda m, b: m - b * np.log(np.log(2.0)),
                            self.mu, self.beta)
        self.mode = self.mu
        self.variance = apply(lambda b: (np.pi ** 2 / 6.0) * b ** 2, self.beta)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.beta)
        assert_negative_support(self.beta, "beta", "Gumbel")
        super().__init__(defaults=("mean",), **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, beta = self._ev_params(("mu", "beta"), env, memo)
        z = (value - mu) / beta
        return bound(-z - jnp.exp(-z) - jnp.log(beta), beta > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, beta = self._ev_params(("mu", "beta"), env, memo)
        return -jnp.exp(-(value - mu) / beta)

    def random(self, point=None, size=None):
        mu, beta = draw_values([self.mu, self.beta], point=point, size=size)
        return generate_samples(
            lambda mu, beta, size: np.random.gumbel(mu, beta, size=size),
            mu, beta, dist_shape=self.shape, size=size)


class Rice(PositiveContinuous):
    r"""Rice (cf. ``continuous.py:3877``)."""

    def __init__(self, nu=None, sigma=None, b=None, sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        nu, b, sigma = self.get_nu_b(nu, b, sigma)
        self.nu = as_node(floatX(nu) if not isinstance(nu, Node) else nu)
        self.sigma = self.sd = as_node(
            floatX(sigma) if not isinstance(sigma, Node) else sigma)
        self.b = as_node(floatX(b) if not isinstance(b, Node) else b)
        self.mean = apply(
            lambda nu, sigma: sigma * jnp.sqrt(np.pi / 2.0)
            * _laguerre_half(-nu ** 2 / (2 * sigma ** 2)),
            self.nu, self.sigma)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.nu, self.sigma)
        super().__init__(defaults=("mean",), *args, **kwargs)

    def get_nu_b(self, nu, b, sigma):
        """cf. ``continuous.py:3963``."""
        if sigma is None:
            sigma = 1.0
        if nu is None and b is not None:
            nu = b * sigma
            return nu, b, sigma
        elif nu is not None and b is None:
            if isinstance(nu, Node) or isinstance(sigma, Node):
                b = apply(lambda n, s: n / s, as_node(nu), as_node(sigma))
            else:
                b = np.asarray(nu) / np.asarray(sigma)
            return nu, b, sigma
        raise ValueError("Rice distribution must specify either nu or b.")

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        nu, sigma, b = self._ev_params(("nu", "sigma", "b"), env, memo)
        x = value / sigma
        safe_x = jnp.where(value > 0, x, 1.0)
        logp = (jnp.log(safe_x) - jnp.log(sigma)
                - (safe_x ** 2 + b ** 2) / 2.0
                + log_i0(safe_x * b))
        return bound(logp, value >= 0, sigma > 0, nu >= 0)

    def random(self, point=None, size=None):
        nu, sigma = draw_values([self.nu, self.sigma], point=point, size=size)
        return generate_samples(
            lambda nu, sigma, size: st.rice.rvs(
                b=nu / sigma, scale=sigma, size=size),
            nu, sigma, dist_shape=self.shape, size=size)


def _laguerre_half(x):
    """L_{1/2}(x) used in the Rice mean (cf. ``continuous.py:3956``)."""
    return jnp.exp(x / 2.0) * ((1.0 - x) * jss.i0e(-x / 2.0)
                               - x * jss.i1e(-x / 2.0))


class Logistic(Continuous):
    r"""Logistic (cf. ``continuous.py:4008``)."""

    def __init__(self, mu=0.0, s=1.0, *args, **kwargs):
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        self.s = as_node(floatX(s) if not isinstance(s, Node) else s)
        self.mean = self.mode = self.mu
        self.variance = apply(lambda s: (s * np.pi) ** 2 / 3.0, self.s)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.s)
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, s = self._ev_params(("mu", "s"), env, memo)
        z = (value - mu) / s
        return bound(-z - jnp.log(s) - 2.0 * jax.nn.softplus(-z), s > 0)

    def logcdf(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, s = self._ev_params(("mu", "s"), env, memo)
        return -jax.nn.softplus(-(value - mu) / s)

    def random(self, point=None, size=None):
        mu, s = draw_values([self.mu, self.s], point=point, size=size)
        return generate_samples(
            lambda mu, s, size: np.random.logistic(mu, s, size=size),
            mu, s, dist_shape=self.shape, size=size)


class LogitNormal(UnitContinuous):
    r"""Logit-normal (cf. ``continuous.py:4151``)."""

    def __init__(self, mu=0, sigma=None, tau=None, sd=None, **kwargs):
        if sd is not None:
            sigma = sd
        self.mu = as_node(floatX(mu) if not isinstance(mu, Node) else mu)
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.sigma = self.sd = sigma
        self.tau = tau
        self.median = apply(jss.expit, self.mu)
        if kwargs.get("shape") is None:
            kwargs["shape"] = self._infer_shape(kwargs.pop("shape", None),
                                                self.mu, self.sigma)
        assert_negative_support(sigma, "sigma", "LogitNormal")
        super().__init__(defaults=("median",), **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu, tau = self._ev_params(("mu", "tau"), env, memo)
        safe = jnp.clip(value, 1e-12, 1.0 - 1e-12)
        lv = jss.logit(safe)
        logp = (-0.5 * tau * (lv - mu) ** 2
                + 0.5 * jnp.log(tau / (2.0 * np.pi))
                - jnp.log(safe * (1.0 - safe)))
        return bound(logp, value > 0, value < 1, tau > 0)

    def random(self, point=None, size=None):
        mu, tau = draw_values([self.mu, self.tau], point=point, size=size)
        return generate_samples(
            lambda mu, tau, size: 1.0 / (1.0 + np.exp(
                -np.random.normal(mu, tau ** -0.5, size=size))),
            mu, tau, dist_shape=self.shape, size=size)


class Interpolated(BoundedContinuous):
    r"""Density interpolated from tabulated (x, pdf) points
    (cf. ``continuous.py:4267``).

    The reference builds an InterpolatedUnivariateSpline Theano Op
    (``dist_math.py:251``); here the normalized pdf is evaluated with
    ``jnp.interp`` — pure XLA, differentiable in ``value``.
    """

    def __init__(self, x_points, pdf_points, *args, **kwargs):
        self.lower = lower = floatX(np.min(x_points))
        self.upper = upper = floatX(np.max(x_points))
        x = np.asarray(x_points, dtype=float)
        p = np.asarray(pdf_points, dtype=float)
        spline = scipy.interpolate.InterpolatedUnivariateSpline(
            x, p, k=1, ext="zeros")
        Z = spline.integral(x[0], x[-1])
        self.x_points = floatX(x)
        self.pdf_points = floatX(p / Z)
        self._spline = spline
        self._Z = Z
        # cdf grid for inverse-cdf sampling
        cdf = np.array([spline.integral(x[0], xi) for xi in x]) / Z
        self.cdf_points = cdf
        self.median = floatX(np.interp(0.5, cdf, x))
        super().__init__(lower=lower, upper=upper, defaults=("median",),
                         *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        pdf = jnp.interp(value, jnp.asarray(self.x_points),
                         jnp.asarray(self.pdf_points))
        return jnp.log(pdf)

    def random(self, point=None, size=None):
        return generate_samples(
            lambda size: np.interp(np.random.uniform(size=size),
                                   self.cdf_points, np.asarray(self.x_points)),
            dist_shape=self.shape, size=size)
