"""Variational families (cf. ``pymc3/variational/approximations.py``).

MeanField (``approximations.py:39``), FullRank (``:115``), Empirical
(``:228``), NormalizingFlow (``:346``) as parametric samplers over the flat
unconstrained space. All sampling is reparameterized with ``jax.random`` so
objectives differentiate straight through.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..model import modelcontext
from .opvi import Approximation, Group

__all__ = ["MeanField", "FullRank", "Empirical", "NormalizingFlow",
           "MeanFieldGroup", "FullRankGroup", "EmpiricalGroup",
           "NormalizingFlowGroup", "sample_approx"]

_LOG2PI = float(np.log(2 * np.pi))


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _rho2sigma(rho):
    """rho parameterization of std: sigma = softplus(rho)
    (cf. ``dist_math.rho2sd``)."""
    return _softplus(rho)


def _sigma2rho(sigma):
    sigma = np.asarray(sigma, dtype=np.float64)
    return np.log(np.expm1(np.maximum(sigma, 1e-10)))


class MeanFieldGroup(Group):
    """Fully-factorized Gaussian q (cf. ``approximations.py:39``)."""

    short_name = "mean_field"

    def init_params(self, start=None):
        if self.user_params is not None:
            mu = np.asarray(self.user_params["mu"], dtype=floatX())
            rho = np.asarray(self.user_params["rho"], dtype=floatX())
        else:
            if start is None:
                start = self.model.test_point
            mu = np.concatenate([
                np.ravel(np.asarray(start.get(vm.var,
                                              np.zeros(vm.shp))))
                for vm in self.ordering.vmap]).astype(floatX())
            rho = np.full(self.ndim, _sigma2rho(1.0), dtype=floatX())
        return {"mu": jnp.asarray(mu), "rho": jnp.asarray(rho)}

    def sample_q(self, key, params, size):
        mu, rho = params["mu"], params["rho"]
        sigma = _rho2sigma(rho)
        eps = jax.random.normal(key, (size, self.ndim), floatX())
        z = mu[None, :] + sigma[None, :] * eps
        logq = jnp.sum(
            -0.5 * (_LOG2PI + 2 * jnp.log(sigma)[None, :] + eps ** 2),
            axis=-1)
        return z, logq

    def logq(self, params, z):
        mu, rho = params["mu"], params["rho"]
        sigma = _rho2sigma(rho)
        return jnp.sum(-0.5 * (_LOG2PI + 2 * jnp.log(sigma) +
                               ((z - mu) / sigma) ** 2))

    def mean(self, params):
        return params["mu"]

    def std(self, params):
        return _rho2sigma(params["rho"])


class FullRankGroup(Group):
    """Full-rank Gaussian q with packed Cholesky (cf.
    ``approximations.py:115``)."""

    short_name = "full_rank"

    def init_params(self, start=None):
        if start is None:
            start = self.model.test_point
        mu = np.concatenate([
            np.ravel(np.asarray(start.get(vm.var, np.zeros(vm.shp))))
            for vm in self.ordering.vmap]).astype(floatX())
        n = self.ndim
        L = np.eye(n, dtype=floatX())
        tril = L[np.tril_indices(n)]
        return {"mu": jnp.asarray(mu), "L_tril": jnp.asarray(tril)}

    def _L(self, params):
        n = self.ndim
        L = jnp.zeros((n, n), floatX())
        L = L.at[jnp.tril_indices(n)].set(params["L_tril"])
        # ensure positive diagonal via softplus on the packed diagonal
        diag = _softplus(jnp.diag(L))
        return L - jnp.diag(jnp.diag(L)) + jnp.diag(diag)

    def sample_q(self, key, params, size):
        L = self._L(params)
        mu = params["mu"]
        eps = jax.random.normal(key, (size, self.ndim), floatX())
        z = mu[None, :] + eps @ L.T
        logdet = jnp.sum(jnp.log(jnp.diag(L)))
        logq = jnp.sum(-0.5 * (_LOG2PI + eps ** 2), axis=-1) - logdet
        return z, logq

    def logq(self, params, z):
        import jax.scipy.linalg as jsl
        L = self._L(params)
        w = jsl.solve_triangular(L, z - params["mu"], lower=True)
        return jnp.sum(-0.5 * (_LOG2PI + w ** 2)) - \
            jnp.sum(jnp.log(jnp.diag(L)))

    def mean(self, params):
        return params["mu"]

    def std(self, params):
        L = self._L(params)
        return jnp.sqrt(jnp.sum(L ** 2, axis=1))

    def cov(self, params):
        L = self._L(params)
        return L @ L.T


class EmpiricalGroup(Group):
    """Particle histogram q (SVGD / empirical, cf.
    ``approximations.py:228``)."""

    short_name = "empirical"
    has_logq = False

    def __init__(self, *args, size=100, jitter=1, **kwargs):
        self.size = size
        self.jitter = jitter
        super().__init__(*args, **kwargs)

    def init_params(self, start=None):
        if start is None:
            start = self.model.test_point
        mu = np.concatenate([
            np.ravel(np.asarray(start.get(vm.var, np.zeros(vm.shp))))
            for vm in self.ordering.vmap]).astype(floatX())
        particles = mu[None, :] + self.jitter * np.random.randn(
            self.size, self.ndim).astype(floatX())
        return {"particles": jnp.asarray(particles)}

    def sample_q(self, key, params, size):
        particles = params["particles"]
        idx = jax.random.randint(key, (size,), 0, particles.shape[0])
        return particles[idx], jnp.zeros((size,), floatX())

    def mean(self, params):
        return jnp.mean(params["particles"], axis=0)

    def std(self, params):
        return jnp.std(params["particles"], axis=0)

    def cov(self, params):
        p = params["particles"]
        c = p - p.mean(axis=0, keepdims=True)
        return (c.T @ c) / p.shape[0]

    @classmethod
    def from_trace(cls, trace, model=None, **kwargs):
        model = modelcontext(model)
        qs = np.stack([model.dict_to_array(trace.point(i, chain=c))
                       for c in trace.chains for i in range(len(trace))])
        grp = cls(None, size=qs.shape[0], model=model, **kwargs)
        grp_params = {"particles": jnp.asarray(qs.astype(floatX()))}
        grp._from_trace_params = grp_params
        return grp, grp_params


class NormalizingFlowGroup(Group):
    """Flow-based q (cf. ``approximations.py:346``): base N(0,I) pushed
    through a formula-built chain of flows (``variational/flows.py``)."""

    short_name = "flow"
    default_flow = "scale-loc"

    def __init__(self, *args, flow=None, **kwargs):
        from .flows import Formula
        self.formula = Formula(flow if flow is not None else
                               self.default_flow)
        super().__init__(*args, **kwargs)

    def init_params(self, start=None):
        self.flows = self.formula.build(self.ndim)
        params = {}
        for i, fl in enumerate(self.flows):
            for k, v in fl.init_params().items():
                params[f"f{i}_{k}"] = v
        return params

    def _apply_flows(self, params, z0):
        logdet = jnp.zeros(z0.shape[:-1], floatX())
        z = z0
        for i, fl in enumerate(self.flows):
            p = {k[len(f"f{i}_"):]: v for k, v in params.items()
                 if k.startswith(f"f{i}_")}
            z, ld = fl.forward(p, z)
            logdet = logdet + ld
        return z, logdet

    def sample_q(self, key, params, size):
        eps = jax.random.normal(key, (size, self.ndim), floatX())
        logq0 = jnp.sum(-0.5 * (_LOG2PI + eps ** 2), axis=-1)
        z, logdet = self._apply_flows(params, eps)
        return z, logq0 - logdet

    def mean(self, params):
        key = jax.random.PRNGKey(0)
        z, _ = self.sample_q(key, params, 1000)
        return jnp.mean(z, axis=0)

    def std(self, params):
        key = jax.random.PRNGKey(0)
        z, _ = self.sample_q(key, params, 1000)
        return jnp.std(z, axis=0)


# ---------------------------------------------------------------------------
# Single-group wrappers (cf. approximations.py:562-615)
# ---------------------------------------------------------------------------
class MeanField(Approximation):
    def __init__(self, *args, **kwargs):
        model = kwargs.get("model", None)
        start = kwargs.pop("start", None)
        super().__init__(MeanFieldGroup(None, model=model), model=model)
        if start is not None:
            self.params[0] = self.groups[0].init_params(start)


class FullRank(Approximation):
    def __init__(self, *args, **kwargs):
        model = kwargs.get("model", None)
        super().__init__(FullRankGroup(None, model=model), model=model)


class Empirical(Approximation):
    def __init__(self, trace=None, size=None, model=None, **kwargs):
        model = modelcontext(model)
        if trace is not None:
            grp, params = EmpiricalGroup.from_trace(trace, model=model)
            super().__init__(grp, model=model)
            self.params[0] = params
        else:
            super().__init__(EmpiricalGroup(None, size=size or 100,
                                            model=model), model=model)

    @property
    def histogram(self):
        return np.asarray(self.params[0]["particles"])


class NormalizingFlow(Approximation):
    def __init__(self, flow="scale-loc", model=None, **kwargs):
        super().__init__(NormalizingFlowGroup(None, flow=flow, model=model),
                         model=model)


def sample_approx(approx, draws=100, include_transformed=True):
    """Draw samples from variational posterior
    (cf. ``approximations.py:520``)."""
    if not isinstance(approx, Approximation):
        raise TypeError("Need Approximation instance, got "
                        f"{type(approx)}")
    return approx.sample(draws=draws,
                         include_transformed=include_transformed)
