"""Timeseries distributions, mirroring
``pymc3/distributions/timeseries.py`` (520 LoC).

Markov-chain log-densities vectorize as shifted-difference terms (no scan
needed for AR/GRW); only GARCH11's recursive volatility uses ``lax.scan``,
which XLA pipelines on-device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..node import Node, as_node, apply, evaluate
from .continuous import Normal, Flat, get_tau_sigma
from .multivariate import MvNormal, MvStudentT
from .distribution import Continuous, Distribution, draw_values, generate_samples
from .dist_math import bound

__all__ = ["AR1", "AR", "GaussianRandomWalk", "GARCH11", "EulerMaruyama",
           "MvGaussianRandomWalk", "MvStudentTRandomWalk"]


def _an(x):
    return x if isinstance(x, Node) else as_node(floatX(np.asarray(x)))


def _norm(env, memo):
    return (env or {}), ({} if memo is None else memo)


class AR1(Continuous):
    r"""AR(1) with zero mean (cf. ``timeseries.py:37``)."""

    def __init__(self, k, tau_e, *args, **kwargs):
        self.k = _an(k)
        self.tau_e = _an(tau_e)
        self.tau = apply(lambda k, te: te * (1.0 - k ** 2), self.k, self.tau_e)
        self.mode = as_node(floatX(0.0))
        super().__init__(defaults=("mode",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        k, tau_e = self._ev_params(("k", "tau_e"), env, memo)
        value = jnp.asarray(value)
        tau = tau_e * (1.0 - k ** 2)
        x_im1 = value[:-1]
        x_i = value[1:]
        boundary = -0.5 * tau * value[0] ** 2 + 0.5 * jnp.log(
            tau / (2.0 * np.pi))
        innov = -0.5 * tau_e * (x_i - k * x_im1) ** 2 + 0.5 * jnp.log(
            tau_e / (2.0 * np.pi))
        return jnp.concatenate([boundary[None], innov])

    def random(self, point=None, size=None):
        k, tau_e = draw_values([self.k, self.tau_e], point=point, size=size)
        n = self.shape[-1] if self.shape else 1
        sigma_e = 1.0 / np.sqrt(tau_e)

        def _sim(size):
            size_t = () if size is None else (size if isinstance(size, tuple)
                                              else (size,))
            out = np.zeros(size_t + (n,))
            out[..., 0] = np.random.normal(
                0, sigma_e / np.sqrt(1 - k ** 2), size=size_t or None)
            for t in range(1, n):
                out[..., t] = k * out[..., t - 1] + np.random.normal(
                    0, sigma_e, size=size_t or None)
            return out
        return _sim(size)


class AR(Continuous):
    r"""AR(p) process (cf. ``timeseries.py:89``).

    rho has length p (or p+1 with ``constant=True``).
    """

    def __init__(self, rho, sigma=None, tau=None, constant=False, init=None,
                 sd=None, *args, **kwargs):
        if sd is not None:
            sigma = sd
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.sigma = self.sd = sigma
        self.tau = tau
        self.mean = as_node(floatX(0.0))
        if isinstance(rho, (list, tuple)):
            rho = np.asarray(rho, dtype=floatX())
        self.rho = _an(rho)
        self.constant = constant
        rho_len = int(np.atleast_1d(self.rho.test_value).shape[-1])
        self.p = rho_len - 1 if constant else rho_len
        self.init = init or Flat.dist()
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        rho = jnp.atleast_1d(evaluate(self.rho, env, memo))
        sigma = evaluate(self.sigma, env, memo)
        value = jnp.asarray(value)
        p = self.p
        if self.constant:
            const = rho[..., 0]
            coefs = rho[..., 1:]
        else:
            const = 0.0
            coefs = rho
        # mean_t = const + sum_i coefs_i * x_{t-i-1}, for t >= p
        x = value
        n = x.shape[-1]
        mean = jnp.full_like(x[..., p:], const)
        for i in range(p):
            mean = mean + coefs[..., i] * x[..., p - (i + 1): n - (i + 1)]
        innov_logp = jnp.sum(
            -0.5 * ((x[..., p:] - mean) / sigma) ** 2
            - jnp.log(sigma) - 0.5 * jnp.log(2.0 * np.pi), axis=-1)
        init_logp = jnp.sum(self.init.logp(x[..., :p], env, memo))
        return innov_logp + init_logp

    def random(self, point=None, size=None):
        raise NotImplementedError(
            "AR.random is not implemented; sample the prior by ancestral "
            "simulation of the innovations")


class GaussianRandomWalk(Continuous):
    r"""Gaussian random walk (cf. ``timeseries.py:188``)."""

    def __init__(self, tau=None, init=None, sigma=None, mu=0.0, sd=None,
                 *args, **kwargs):
        if sd is not None:
            sigma = sd
        kwargs.setdefault("shape", 1)
        if np.ndim(kwargs["shape"]) == 0 and kwargs["shape"] in (0, 1):
            pass
        tau, sigma = get_tau_sigma(tau=tau, sigma=sigma)
        self.tau = tau
        self.sigma = self.sd = sigma
        self.mu = _an(mu)
        self.init = init or Flat.dist()
        self.mean = as_node(floatX(0.0))
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        mu = evaluate(self.mu, env, memo)
        sigma = evaluate(self.sigma, env, memo)
        value = jnp.asarray(value)
        x_im1 = value[..., :-1]
        x_i = value[..., 1:]
        innov = (-0.5 * ((x_i - (x_im1 + mu)) / sigma) ** 2
                 - jnp.log(sigma) - 0.5 * jnp.log(2.0 * np.pi))
        init_lp = self.init.logp(value[..., 0], env, memo)
        return jnp.sum(innov, axis=-1) + jnp.sum(init_lp)

    def random(self, point=None, size=None):
        sigma, mu = draw_values([self.sigma, self.mu], point=point, size=size)
        n = int(self.shape[-1])
        return generate_samples(
            lambda sigma, mu, size: np.cumsum(
                np.random.normal(mu, sigma, size=size), axis=-1),
            sigma, mu, dist_shape=self.shape, size=size)


class GARCH11(Continuous):
    r"""GARCH(1,1) volatility process (cf. ``timeseries.py:301``).

    The recursive volatility is a ``lax.scan`` — sequential by nature, but
    fully on-device and differentiable.
    """

    def __init__(self, omega, alpha_1, beta_1, initial_vol, *args, **kwargs):
        self.omega = _an(omega)
        self.alpha_1 = _an(alpha_1)
        self.beta_1 = _an(beta_1)
        self.initial_vol = _an(initial_vol)
        self.mean = as_node(floatX(0.0))
        super().__init__(defaults=("mean",), *args, **kwargs)

    def _vol(self, x, omega, alpha_1, beta_1, initial_vol):
        def step(vol2, x_prev):
            new_vol2 = omega + alpha_1 * x_prev ** 2 + beta_1 * vol2
            return new_vol2, jnp.sqrt(new_vol2)

        iv2 = initial_vol * initial_vol
        _, vols = jax.lax.scan(step, iv2 * jnp.ones_like(x[0]), x[:-1])
        return jnp.concatenate(
            [jnp.sqrt(iv2)[None] * jnp.ones_like(x[:1]), vols])

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        omega, alpha_1, beta_1, initial_vol = self._ev_params(
            ("omega", "alpha_1", "beta_1", "initial_vol"), env, memo)
        x = jnp.asarray(value)
        vol = self._vol(x, omega, alpha_1, beta_1,
                        jnp.asarray(initial_vol))
        return (-0.5 * (x / vol) ** 2 - jnp.log(vol)
                - 0.5 * jnp.log(2.0 * np.pi))

    def random(self, point=None, size=None):
        raise NotImplementedError("GARCH11.random is not implemented")


class EulerMaruyama(Continuous):
    r"""SDE via Euler-Maruyama discretization (cf. ``timeseries.py:378``).

    ``sde_fn(x, *sde_pars) -> (drift, diffusion)`` must be jnp-traceable.
    """

    def __init__(self, dt, sde_fn, sde_pars, *args, **kwargs):
        self.dt = _an(dt)
        self.sde_fn = sde_fn
        self.sde_pars = [_an(p) for p in sde_pars]
        super().__init__(*args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        dt = evaluate(self.dt, env, memo)
        pars = [evaluate(p, env, memo) for p in self.sde_pars]
        x = jnp.asarray(value)
        xt = x[..., :-1]
        f, g = self.sde_fn(xt, *pars)
        mu = xt + dt * f
        sigma = jnp.sqrt(dt) * g
        return (-0.5 * ((x[..., 1:] - mu) / sigma) ** 2
                - jnp.log(sigma) - 0.5 * jnp.log(2.0 * np.pi))

    def random(self, point=None, size=None):
        raise NotImplementedError("EulerMaruyama.random is not implemented")


class MvGaussianRandomWalk(Continuous):
    r"""Multivariate GRW (cf. ``timeseries.py:426``)."""

    def __init__(self, mu=0.0, cov=None, tau=None, chol=None, lower=True,
                 init=None, *args, **kwargs):
        self.init = init or Flat.dist()
        self.innov = MvNormal.dist(mu=mu, cov=cov, tau=tau, chol=chol,
                                   lower=lower,
                                   shape=kwargs.get("shape", ())[-1:] or None)
        self.mean = as_node(floatX(0.0))
        super().__init__(defaults=("mean",), *args, **kwargs)

    def logp(self, value, env=None, memo=None):
        env, memo = _norm(env, memo)
        x = jnp.asarray(value)
        x_im1 = x[..., :-1, :]
        x_i = x[..., 1:, :]
        innov_logp = self.innov.logp(x_i - x_im1, env, memo)
        init_logp = self.init.logp(x[..., 0, :], env, memo)
        return jnp.sum(innov_logp) + jnp.sum(init_logp)

    def random(self, point=None, size=None):
        raise NotImplementedError


class MvStudentTRandomWalk(MvGaussianRandomWalk):
    r"""Multivariate StudentT random walk (cf. ``timeseries.py:487``)."""

    def __init__(self, nu, *args, **kwargs):
        super().__init__(*args, **kwargs)
        inner = self.innov
        self.innov = MvStudentT.dist(
            nu=nu, mu=inner.mu,
            **{inner._cov_param if inner._cov_param != "chol" else "chol":
               getattr(inner, "cov" if inner._cov_param == "cov" else
                       ("chol_cov" if inner._cov_param == "chol" else "tau"))})
