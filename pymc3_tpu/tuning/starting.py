"""MAP estimation (cf. ``pymc3/tuning/starting.py``).

``find_MAP`` (``starting.py:39``) maximizes ``logp_nojac`` with scipy
``minimize``; value and gradient come from one jitted
``jax.value_and_grad`` call instead of the reference's compiled Theano
function (``CostFuncWrapper``, ``starting.py:201``).
"""
from __future__ import annotations

import logging
import warnings
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from ..config import floatX
from ..model import modelcontext, Point, all_continuous
from ..vartypes import discrete_types

_log = logging.getLogger("pymc3_tpu")

__all__ = ["find_MAP"]


def find_MAP(start=None, vars=None, method="L-BFGS-B", return_raw=False,
             include_transformed=True, progressbar=True, maxeval=5000,
             model=None, *args, **kwargs):
    """Find the local maximum a posteriori point given a model
    (cf. ``starting.py:39``)."""
    model = modelcontext(model)
    if start is None:
        start = model.test_point
    else:
        start_ = dict(model.test_point)
        from ..util import update_start_vals
        update_start_vals(start_, start, model)
        start_.update({k: v for k, v in start.items()
                       if k in model.ordering.by_name})
        start = start_

    if vars is None:
        vars = model.cont_vars
    if not vars:
        raise ValueError("Model has no unobserved continuous variables.")

    disc_vars = list(set(model.free_RVs) - set(vars))
    allinmodel(vars, model)
    if disc_vars or not all_continuous(vars):
        _log.warning("Warning: gradient not available." +
                     "(E.g. vars contains discrete variables). MAP " +
                     "estimates may not be accurate for the default " +
                     "parameters. Defaulting to non-gradient minimization " +
                     "'Powell'.")
        method = "Powell"

    q0 = model.dict_to_array({k: start.get(k, model.test_point[k])
                              for k in model.ordering.by_name}).astype(
                                  np.float64)

    logp_fn = model.make_logp_fn(jacobian=False)
    vag = jax.jit(jax.value_and_grad(logp_fn))

    n_eval = [0]

    def neg_logp_grad(q):
        n_eval[0] += 1
        v, g = vag(jnp.asarray(q, floatX()))
        v = np.asarray(v, dtype=np.float64)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            v = np.inf
            g = np.where(np.isfinite(g), g, 0.0)
        return -v, -g

    def neg_logp(q):
        n_eval[0] += 1
        v = np.asarray(jax.jit(logp_fn)(jnp.asarray(q, floatX())),
                       dtype=np.float64)
        return np.inf if not np.isfinite(v) else -v

    use_gradient = method not in ("Powell", "Nelder-Mead", "COBYLA")
    try:
        if use_gradient:
            opt_result = minimize(neg_logp_grad, q0, jac=True, method=method,
                                  options={"maxiter": maxeval}, *args,
                                  **kwargs)
        else:
            opt_result = minimize(neg_logp, q0, method=method,
                                  options={"maxiter": maxeval}, *args,
                                  **kwargs)
        mx0 = opt_result["x"]
    except (KeyboardInterrupt, StopIteration) as e:
        mx0 = q0
        opt_result = None
        if isinstance(e, StopIteration):
            _log.info(e)

    vars_dict = model.array_to_dict(mx0)
    # include untransformed views + deterministics
    mx = dict(vars_dict)
    env = model._point_to_env(vars_dict)
    memo = {}
    for rv in model.free_RVs:
        if rv.transform is not None:
            mx[rv.orig_name] = np.asarray(
                rv.transform.backward(jnp.asarray(mx[rv.name]), env, memo))
    for det in model.deterministics:
        mx[det.name] = np.asarray(det._eval_default(env, memo))
    if not include_transformed:
        mx = {k: v for k, v in mx.items() if not k.endswith("__")}

    if return_raw:
        return mx, opt_result
    return mx


def allinmodel(vars, model):
    notin = [v for v in vars if v not in model.free_RVs]
    if notin:
        raise ValueError(f"Some variables not in the model: {notin}")
