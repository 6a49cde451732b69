"""Elliptical slice sampling (cf. ``pymc3/step_methods/elliptical_slice.py``).

For models with a multivariate-normal prior: proposes on the ellipse through
the current state and an auxiliary Gaussian draw, shrinking the angle bracket
until the likelihood exceeds the slice level (Murray, Adams & MacKay 2010).
The angle-shrink loop is a bounded ``lax.while_loop``.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX
from ..model import modelcontext
from .arraystep import ArrayStepShared, Competence, TuneContext

__all__ = ["EllipticalSlice"]


class ESState(NamedTuple):
    loglik: jnp.ndarray


class EllipticalSlice(ArrayStepShared):
    """cf. ``elliptical_slice.py:51``. ``prior_cov`` (or ``prior_chol``) gives
    the Gaussian-prior covariance of the selected variables; the *likelihood*
    is the model logp minus the Gaussian prior term, computed automatically
    as ``datalogpt``."""

    name = "elliptical_slice"
    default_blocked = True
    generates_stats = False

    def __init__(self, vars=None, prior_cov=None, prior_chol=None,
                 model=None, max_steps=64, **kwargs):
        model = modelcontext(model)
        if vars is None:
            vars = model.cont_vars
        self._setup_vars(vars, model)
        if prior_chol is None:
            if prior_cov is None:
                raise ValueError("Must provide prior_cov or prior_chol")
            prior_chol = np.linalg.cholesky(np.asarray(prior_cov))
        self.prior_chol = np.asarray(prior_chol, dtype=floatX())
        self.max_steps = int(max_steps)
        self._loglik_fn = model.datalogpt_fn()
        self._sub_idx = jnp.asarray(self.q_indices, jnp.int32)

    def kernel_init(self, q0):
        q0 = jnp.asarray(q0, floatX())
        return ESState(loglik=self._loglik_fn(q0))

    def kernel_step(self, key, q, state: ESState, tctx: TuneContext):
        q = jnp.asarray(q, floatX())
        k_nu, k_y, k_theta, k_loop = jax.random.split(key, 4)

        x0 = q[self._sub_idx]
        chol = jnp.asarray(self.prior_chol)
        nu = chol @ jax.random.normal(k_nu, (self.dim,), floatX())

        y = state.loglik + jnp.log(jax.random.uniform(k_y, (), floatX()))
        theta = jax.random.uniform(k_theta, (), floatX(), 0.0,
                                   2.0 * jnp.pi)
        lo, hi = theta - 2.0 * jnp.pi, theta

        def propose(theta):
            return x0 * jnp.cos(theta) + nu * jnp.sin(theta)

        def cond(c):
            theta, lo, hi, k, n, done = c
            return (~done) & (n < self.max_steps)

        def body(c):
            theta, lo, hi, k, n, done = c
            x_prop = propose(theta)
            ll = self._loglik_fn(q.at[self._sub_idx].set(x_prop))
            ok = ll > y
            lo = jnp.where(ok, lo, jnp.where(theta < 0, theta, lo))
            hi = jnp.where(ok, hi, jnp.where(theta >= 0, theta, hi))
            k, ku = jax.random.split(k)
            theta_new = jnp.where(ok, theta,
                                  jax.random.uniform(ku, (), floatX(), lo, hi))
            return (theta_new, lo, hi, k, n + 1, ok)

        theta_f, _, _, _, _, ok = lax.while_loop(
            cond, body, (theta, lo, hi, k_loop,
                         jnp.asarray(0, jnp.int32), jnp.asarray(False)))
        x_new = jnp.where(ok, propose(theta_f), x0)
        q_new = q.at[self._sub_idx].set(x_new)
        loglik_new = self._loglik_fn(q_new)
        return q_new, ESState(loglik=loglik_new), {}

    @staticmethod
    def competence(var, has_grad=False):
        return Competence.INCOMPATIBLE  # must be assigned explicitly
