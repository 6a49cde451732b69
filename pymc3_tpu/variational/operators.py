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
    the Stein variational direction.

    Two regimes, selected by the approximation:

    - **Empirical** (plain SVGD, ``inference.py:522``): the particles ARE
      the parameters; the direction moves them directly.
    - **parametric sampler** (amortized SVGD / ASVGD, ``inference.py:596``):
      particles are reparameterized draws ``x_i = R_theta(eps_i)``; the
      parameter update is ``Delta theta = (1/n) sum_i phi*(x_i)^T
      dx_i/dtheta``, i.e. the VJP of the sampler with the Stein direction
      as cotangent — the exact amortized formulation (Wang & Liu 2016,
      arXiv:1611.01722).
    """

    def _stein_phi(self, x, logp_grad):
        """phi*(x) = (K grad_logp / T + sum_y dK) / N over the particle
        batch."""
        op = self.op
        n_part = x.shape[0]
        glogp = jax.vmap(logp_grad)(x)
        kxy, dxkxy = op.tf(x)
        return (kxy @ glogp / op.temperature + dxkxy) / n_part

    def step_function(self, obj_n_mc=100, obj_optimizer=None,
                      more_obj_params=None, total_grad_norm_constraint=None,
                      score=False, fn_kwargs=None):
        from .updates import get_optimizer, adagrad_window
        if obj_optimizer is None:
            obj_optimizer = adagrad_window()
        obj_optimizer = get_optimizer(obj_optimizer)
        approx = self.approx
        logp_grad = jax.grad(self.op.model.make_logp_fn())
        is_empirical = "particles" in approx.params.get(0, {})

        if is_empirical:
            def step(params, opt_state, key):
                x = params[0]["particles"]  # (N, n)
                phi = self._stein_phi(x, logp_grad)
                # optimizer DEscends, so negate the ascent direction
                tree_grads = {0: {"particles": -phi}}
                new_params, new_state = obj_optimizer.update(
                    tree_grads, opt_state, params)
                return new_params, new_state, jnp.asarray(0.0, floatX())
        else:
            def step(params, opt_state, key):
                def sampler(p):
                    z, _ = approx.sample_q(key, p, obj_n_mc)
                    return z
                x, vjp_fn = jax.vjp(sampler, params)
                phi = self._stein_phi(x, logp_grad)
                # Delta theta = phi^T dx/dtheta, negated for descent; the
                # 1/n average is already inside phi
                (tree_grads,) = vjp_fn(-phi)
                tree_grads = jax.tree_util.tree_map(
                    lambda g: jnp.where(jnp.isfinite(g), g,
                                        jnp.zeros_like(g)), tree_grads)
                new_params, new_state = obj_optimizer.update(
                    tree_grads, opt_state, params)
                return new_params, new_state, jnp.asarray(0.0, floatX())
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
