"""Variational operators (cf. ``pymc3/variational/operators.py``).

``KL`` (negative ELBO, ``operators.py:28``) and ``KSD`` (kernelized Stein
discrepancy for SVGD, ``operators.py:95``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import floatX
from .opvi import Operator, ObjectiveFunction

__all__ = ["KL", "KSD"]


class KL(Operator):
    """Kullback-Leibler divergence operator: per-sample ``logq - logp``
    (cf. ``operators.py:56``)."""

    def __init__(self, approx, beta=1.0):
        super().__init__(approx)
        self.beta = float(beta)

    def apply(self, f):
        logp = self.model.make_logp_fn(with_rng=True)

        def per_sample(z, logq, key):
            return self.beta * logq - logp(z, key)
        return per_sample


class KSDObjective(ObjectiveFunction):
    """cf. ``operators.py:62`` — SVGD is not loss-based; the "gradient" is
    the Stein variational direction applied to the particle set."""

    def step_function(self, obj_n_mc=1, obj_optimizer=None,
                      more_obj_params=None, total_grad_norm_constraint=None,
                      score=False, fn_kwargs=None):
        from .updates import get_optimizer, adagrad_window
        if obj_optimizer is None:
            obj_optimizer = adagrad_window()
        obj_optimizer = get_optimizer(obj_optimizer)
        op = self.op
        approx = self.approx
        logp_grad = jax.grad(op.model.make_logp_fn())
        temperature = op.temperature

        def step(params, opt_state, key):
            x = params[0]["particles"]  # (N, n)
            n_part = x.shape[0]
            glogp = jax.vmap(logp_grad)(x)
            kxy, dxkxy = op.tf(x)
            # phi* = (K @ grad_logp / T + sum_y dK) / N  (SVGD direction)
            phi = (kxy @ glogp / temperature + dxkxy) / n_part
            # optimizer DEscends, so negate the ascent direction
            grads = ({"particles": -phi},)
            tree_grads = {0: grads[0]}
            new_params, new_state = obj_optimizer.update(tree_grads,
                                                         opt_state, params)
            loss = jnp.asarray(0.0, floatX())
            return new_params, new_state, loss
        return step, obj_optimizer


class KSD(Operator):
    """Kernelized Stein Discrepancy operator (cf. ``operators.py:95``)."""

    has_test_function = True
    returns_loss = False
    require_logq = False
    objective_class = KSDObjective

    def __init__(self, approx, temperature=1.0):
        super().__init__(approx)
        self.temperature = float(temperature)

    def __call__(self, f=None):
        if f is None:
            from .test_functions import RBF
            f = RBF()
        self.tf = f
        return self.objective_class(self, f)

    def apply(self, f):
        raise NotImplementedError("KSD uses a custom step function")
