"""Hessian-based scaling guesses (cf. ``pymc3/tuning/scaling.py``)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..model import modelcontext, Point

__all__ = ["find_hessian", "find_hessian_diag", "fixed_hessian",
           "guess_scaling", "trace_cov"]


def fixed_hessian(point, vars=None, model=None):
    """Constant Hessian stand-in (cf. ``scaling.py:24``)."""
    model = modelcontext(model)
    point = Point(point, model=model)
    rval = np.ones(model.ordering.size) / 10
    return rval


def find_hessian(point, vars=None, model=None):
    """Hessian of -logp at a point (cf. ``scaling.py:48``): one
    ``jax.hessian`` trace instead of Theano's symbolic double grad."""
    model = modelcontext(model)
    logp = model.make_logp_fn(jacobian=False)
    q = jnp.asarray(model.dict_to_array(
        {k: point[k] for k in model.ordering.by_name}), floatX())
    H = jax.hessian(lambda x: -logp(x))(q)
    return np.asarray(H)


def find_hessian_diag(point, vars=None, model=None):
    """Diagonal of the Hessian (cf. ``scaling.py:64``) via one
    forward-over-reverse pass per coordinate batch."""
    model = modelcontext(model)
    logp = model.make_logp_fn(jacobian=False)
    q = jnp.asarray(model.dict_to_array(
        {k: point[k] for k in model.ordering.by_name}), floatX())
    grad = jax.grad(lambda x: -logp(x))

    def hvp_diag_elem(i):
        e = jnp.zeros_like(q).at[i].set(1.0)
        _, hv = jax.jvp(grad, (q,), (e,))
        return hv[i]

    return np.asarray(jax.vmap(hvp_diag_elem)(jnp.arange(q.shape[0])))


def guess_scaling(point, vars=None, model=None, scaling_bound=1e-8):
    """cf. ``scaling.py:80``."""
    model = modelcontext(model)
    try:
        h = find_hessian_diag(point, vars, model=model)
    except Exception:
        h = fixed_hessian(point, vars, model=model)
    return adjust_scaling(h, scaling_bound)


def adjust_scaling(s, scaling_bound):
    """Clamp a (diagonal or full) scaling into a sane precision range;
    full matrices are clamped in their eigenbasis."""
    if np.ndim(s) < 2:
        return adjust_precision(s, scaling_bound)
    val, vec = np.linalg.eigh(s)
    return (vec * adjust_precision(val, scaling_bound)) @ vec.T


def adjust_precision(tau, scaling_bound=1e-8):
    """Precision magnitudes clipped into [bound, 1/bound] (clipping the
    magnitude directly is the same monotone map as the reference's
    exp(clamp(log .)) round-trip)."""
    mag = np.sqrt(np.abs(tau))
    return np.clip(mag, scaling_bound, 1.0 / scaling_bound) ** 2


def trace_cov(trace, vars=None, model=None):
    """Covariance matrix of trace samples (cf. ``scaling.py:113``)."""
    model = modelcontext(model)
    if model is not None and vars is None:
        vars = model.free_RVs
    elif vars is None:
        vars = trace.varnames

    def flat_t(var):
        x = trace[getattr(var, "name", var)]
        return x.reshape((x.shape[0], np.prod(x.shape[1:], dtype=int)))

    return np.cov(np.concatenate(list(map(flat_t, vars)), 1).T)
