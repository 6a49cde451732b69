"""Stochastic-gradient MCMC scaffold (cf. ``pymc3/step_methods/sgmcmc.py``).

The reference ships ``BaseStochasticGradient`` (``sgmcmc.py:75``) as
groundwork for SGFS/CSG without a finished production sampler. This build
provides the same scaffold plus a working SGLD kernel: minibatched dlogp
(``sgmcmc.py:45-73``) comes from the Minibatch node machinery — the gradient
of the scaled logp is an unbiased estimate of the full-data gradient.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..data import RNG_ENV_KEY
from ..model import modelcontext
from .arraystep import ArrayStepShared, Competence, TuneContext

__all__ = ["BaseStochasticGradient", "SGLD"]


class SGState(NamedTuple):
    step_count: jnp.ndarray


class BaseStochasticGradient(ArrayStepShared):
    """Base for stochastic-gradient steppers (cf. ``sgmcmc.py:75``).

    Subclasses implement ``_delta(grad, step_size, key)``.
    """

    generates_stats = False

    def __init__(self, vars=None, batch_size=None, total_size=None,
                 step_size=1.0, model=None, random_seed=None, minibatches=None,
                 minibatch_tensors=None, **kwargs):
        model = modelcontext(model)
        if vars is None:
            vars = model.cont_vars
        self._setup_vars(vars, model)
        self.step_size_base = float(step_size)
        # (q, key) -> logp with the key threaded to Minibatch nodes, so the
        # gradient below is the unbiased minibatch estimate (model.py:593)
        self._logp_fn = model.make_logp_fn(with_rng=True)
        self._sub_idx = jnp.asarray(self.q_indices, jnp.int32)

    def kernel_init(self, q0):
        return SGState(step_count=jnp.asarray(0, jnp.int32))

    def _delta(self, grad, step_size, key):
        raise NotImplementedError

    def _step_size(self, t):
        # Robbins-Monro schedule a(b+t)^-gamma
        a, b, gamma = self.step_size_base, 10.0, 0.55
        return a * (b + t.astype(floatX())) ** (-gamma)

    def kernel_step(self, key, q, state: SGState, tctx: TuneContext):
        q = jnp.asarray(q, floatX())
        k_mb, k_noise = jax.random.split(key)
        # minibatch selection rides the env RNG key (pymc3_tpu.data)
        grad = jax.grad(self._logp_fn)(q, k_mb)
        eps = self._step_size(state.step_count)
        delta = self._delta(grad, eps, k_noise)
        mask = jnp.zeros(q.shape[-1], floatX()).at[self._sub_idx].set(1.0)
        q_new = q + delta * mask
        return q_new, SGState(state.step_count + 1), {}

    @staticmethod
    def competence(var, has_grad=False):
        return Competence.INCOMPATIBLE  # must be assigned explicitly


class SGLD(BaseStochasticGradient):
    """Stochastic Gradient Langevin Dynamics (Welling & Teh 2011)."""

    name = "sgld"

    def _delta(self, grad, step_size, key):
        noise = jax.random.normal(key, grad.shape, floatX())
        return 0.5 * step_size * grad + jnp.sqrt(step_size) * noise
