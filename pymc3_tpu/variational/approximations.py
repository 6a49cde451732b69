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
    """Fully-factorized Gaussian q (cf. ``approximations.py:39``).

    With ``local=True`` this is the AEVB group (cf. reference
    ``opvi.py:507,1180``): the variational parameters are user-provided —
    either trainable per-row arrays (``params=dict(mu=..., rho=...)``, the
    reference's shared-variable pattern) or an amortizing encoder
    (``params=dict(encoder=fn, aux=pytree)`` with
    ``fn(aux, mb_key) -> (mu, rho)``) that sees the same per-sample
    minibatch key as the model's Minibatch nodes. Local-group logq is
    scaled by the variables' ``total_size`` scaling, mirroring
    ``symbolic_logq`` in the reference.
    """

    short_name = "mean_field"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._encoder = None
        if self.local and callable((self.user_params or {}).get("encoder")):
            self._encoder = self.user_params["encoder"]

    def init_params(self, start=None):
        if self._encoder is not None:
            aux = self.user_params.get("aux", {})
            return {"aux": jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, floatX()), aux)}
        if self.user_params is not None:
            mu = np.asarray(self.user_params["mu"],
                            dtype=floatX()).ravel()
            rho = np.asarray(self.user_params["rho"],
                             dtype=floatX()).ravel()
            if mu.size != self.ndim or rho.size != self.ndim:
                raise ValueError(
                    f"user params must have {self.ndim} elements, got "
                    f"mu:{mu.size} rho:{rho.size}")
        else:
            if start is None:
                start = self.model.test_point
            mu = np.concatenate([
                np.ravel(np.asarray(start.get(vm.var,
                                              np.zeros(vm.shp))))
                for vm in self.ordering.vmap]).astype(floatX())
            rho = np.full(self.ndim, _sigma2rho(1.0), dtype=floatX())
        return {"mu": jnp.asarray(mu), "rho": jnp.asarray(rho)}

    def _elem_logq(self, sigma, eps):
        return -0.5 * (_LOG2PI + 2 * jnp.log(sigma) + eps ** 2)

    def _reduce_logq(self, elem):
        """Sum per-element logq, with minibatch scaling for local groups."""
        if self.local:
            return elem @ jnp.asarray(self.scale_vec)
        return jnp.sum(elem, axis=-1)

    def sample_q(self, key, params, size, mb_keys=None):
        eps = jax.random.normal(key, (size, self.ndim), floatX())
        if self._encoder is not None:
            enc = self._encoder
            aux = params["aux"]
            if mb_keys is None:
                mu, rho = enc(aux, None)
                mu = jnp.broadcast_to(jnp.ravel(mu), (size, self.ndim))
                rho = jnp.broadcast_to(jnp.ravel(rho), (size, self.ndim))
            else:
                def one(k):
                    m, r = enc(aux, k)
                    return jnp.ravel(m), jnp.ravel(r)
                mu, rho = jax.vmap(one)(mb_keys)
            sigma = _rho2sigma(rho)
            z = mu + sigma * eps
            return z, self._reduce_logq(self._elem_logq(sigma, eps))
        mu, rho = params["mu"], params["rho"]
        sigma = _rho2sigma(rho)
        z = mu[None, :] + sigma[None, :] * eps
        return z, self._reduce_logq(self._elem_logq(sigma[None, :], eps))

    def logq(self, params, z):
        mu, rho = self._mu_rho(params)
        sigma = _rho2sigma(rho)
        elem = -0.5 * (_LOG2PI + 2 * jnp.log(sigma) + ((z - mu) / sigma) ** 2)
        if self.local:
            return elem @ jnp.asarray(self.scale_vec)
        return jnp.sum(elem)

    def _mu_rho(self, params):
        if self._encoder is not None:
            mu, rho = self._encoder(params["aux"], None)
            return jnp.ravel(mu), jnp.ravel(rho)
        return params["mu"], params["rho"]

    def mean(self, params):
        return self._mu_rho(params)[0]

    def std(self, params):
        return _rho2sigma(self._mu_rho(params)[1])


class FullRankGroup(Group):
    """Full-rank Gaussian q with packed Cholesky (cf.
    ``approximations.py:115``).

    ``rowwise=True`` (cf. reference batched groups, ``opvi.py:507``)
    factorizes q over the leading (row/batch) axis of a single grouped
    variable: one small full-rank Gaussian per row — block-diagonal
    covariance — instead of one dense ndim x ndim Cholesky."""

    short_name = "full_rank"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.rowwise:
            if len(self.group_vars) != 1:
                raise ValueError("rowwise groups take exactly one variable")
            shp = np.shape(self.group_vars[0].test_value)
            if len(shp) < 1 or shp[0] < 1:
                raise ValueError("rowwise groups need a leading batch axis")
            self.rows = int(shp[0])
            assert self.ndim % self.rows == 0
            self.row_dim = self.ndim // self.rows

    def init_params(self, start=None):
        if start is None:
            start = self.model.test_point
        mu = np.concatenate([
            np.ravel(np.asarray(start.get(vm.var, np.zeros(vm.shp))))
            for vm in self.ordering.vmap]).astype(floatX())
        if self.rowwise:
            d = self.row_dim
            tril = np.tile(np.eye(d, dtype=floatX())[np.tril_indices(d)],
                           (self.rows, 1))
            return {"mu": jnp.asarray(mu), "L_tril": jnp.asarray(tril)}
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

    def _L_rows(self, params):
        d = self.row_dim
        tril = params["L_tril"]  # (rows, d*(d+1)/2)
        L = jnp.zeros((self.rows, d, d), floatX())
        ii, jj = jnp.tril_indices(d)
        L = L.at[:, ii, jj].set(tril)
        diag = _softplus(L[:, jnp.arange(d), jnp.arange(d)])
        L = L.at[:, jnp.arange(d), jnp.arange(d)].set(diag)
        return L

    def sample_q(self, key, params, size):
        mu = params["mu"]
        eps = jax.random.normal(key, (size, self.ndim), floatX())
        if self.rowwise:
            L = self._L_rows(params)  # (rows, d, d)
            eps_r = eps.reshape(size, self.rows, self.row_dim)
            z = mu.reshape(self.rows, self.row_dim)[None] + jnp.einsum(
                "rij,srj->sri", L, eps_r)
            z = z.reshape(size, self.ndim)
            logdet = jnp.sum(jnp.log(
                L[:, jnp.arange(self.row_dim), jnp.arange(self.row_dim)]))
            logq = jnp.sum(-0.5 * (_LOG2PI + eps ** 2), axis=-1) - logdet
            return z, logq
        L = self._L(params)
        z = mu[None, :] + eps @ L.T
        logdet = jnp.sum(jnp.log(jnp.diag(L)))
        logq = jnp.sum(-0.5 * (_LOG2PI + eps ** 2), axis=-1) - logdet
        return z, logq

    def logq(self, params, z):
        import jax.scipy.linalg as jsl
        if self.rowwise:
            L = self._L_rows(params)
            dz = (z - params["mu"]).reshape(self.rows, self.row_dim)
            w = jax.vmap(lambda Li, di: jsl.solve_triangular(
                Li, di, lower=True))(L, dz)
            logdet = jnp.sum(jnp.log(
                L[:, jnp.arange(self.row_dim), jnp.arange(self.row_dim)]))
            return jnp.sum(-0.5 * (_LOG2PI + w ** 2)) - logdet
        L = self._L(params)
        w = jsl.solve_triangular(L, z - params["mu"], lower=True)
        return jnp.sum(-0.5 * (_LOG2PI + w ** 2)) - \
            jnp.sum(jnp.log(jnp.diag(L)))

    def mean(self, params):
        return params["mu"]

    def std(self, params):
        if self.rowwise:
            L = self._L_rows(params)
            return jnp.sqrt(jnp.sum(L ** 2, axis=-1)).reshape(self.ndim)
        L = self._L(params)
        return jnp.sqrt(jnp.sum(L ** 2, axis=1))

    def cov(self, params):
        if self.rowwise:
            import scipy.linalg
            L = np.asarray(self._L_rows(params))
            return scipy.linalg.block_diag(
                *[Li @ Li.T for Li in L])
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
