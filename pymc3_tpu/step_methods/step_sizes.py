"""Step-size adaptation (cf. ``pymc3/step_methods/step_sizes.py``).

Nesterov dual averaging (``DualAverageAdaptation``, ``step_sizes.py:21``) as a
pure pytree state so it lives inside the jitted warmup scan and vmaps over
chains.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..config import floatX

__all__ = ["DAState", "da_init", "da_update", "da_current",
           "DualAverageAdaptation"]


class DAState(NamedTuple):
    """Dual-averaging state (one scalar per chain under vmap)."""

    log_step: jnp.ndarray       # current log step size
    log_bar_step: jnp.ndarray   # averaged log step size
    hbar: jnp.ndarray           # running average of (target - accept)
    count: jnp.ndarray          # t
    mu: jnp.ndarray             # shrinkage target log(10 * eps0)
    tuned_accept_sum: jnp.ndarray   # accept-rate bookkeeping post-warmup
    tuned_count: jnp.ndarray


def da_init(initial_step, target=0.8, mu_scale=10.0):
    """``mu_scale`` sets the shrinkage target mu = log(mu_scale * eps0).

    The reference's 10x (Hoffman & Gelman) assumes eps0 is a blind
    dimension heuristic worth exploring above. When eps0 comes from the
    one-leapfrog probe (``nuts.find_reasonable_eps``) the 10x target
    forces a first-draws overshoot whose low acceptance poisons hbar and
    crashes eps ~20x below eps0 for ~25 draws — at 8192 lockstep chains
    that was 75% of the first tuning block's wall (max-depth trees, zero
    divergences; r5 decomposition). Probed inits pass mu_scale=2."""
    initial_step = jnp.asarray(initial_step, dtype=floatX())
    z = jnp.zeros_like(initial_step)
    return DAState(
        log_step=jnp.log(initial_step),
        log_bar_step=jnp.log(initial_step),
        hbar=z,
        count=jnp.ones_like(initial_step),
        mu=jnp.log(mu_scale) + jnp.log(initial_step),
        tuned_accept_sum=z,
        tuned_count=z,
    )


def da_update(state: DAState, accept_stat, tune, target=0.8, gamma=0.05,
              k=0.75, t0=10.0) -> DAState:
    """One dual-averaging update (cf. ``step_sizes.py:40-66``).

    When ``tune`` is False the step size is frozen at the averaged value and
    only the acceptance bookkeeping advances (used for the low-acceptance
    warning, ``step_sizes.py:68-79``).
    """
    accept_stat = jnp.asarray(accept_stat, dtype=floatX())
    count = state.count
    w = 1.0 / (count + t0)
    hbar_new = (1.0 - w) * state.hbar + w * (target - accept_stat)
    log_step_new = state.mu - hbar_new * jnp.sqrt(count) / gamma
    mk = count ** -k
    log_bar_new = mk * log_step_new + (1.0 - mk) * state.log_bar_step

    tune = jnp.asarray(tune)
    return DAState(
        log_step=jnp.where(tune, log_step_new, state.log_step),
        log_bar_step=jnp.where(tune, log_bar_new, state.log_bar_step),
        hbar=jnp.where(tune, hbar_new, state.hbar),
        count=jnp.where(tune, count + 1, count),
        mu=state.mu,
        tuned_accept_sum=jnp.where(
            tune, state.tuned_accept_sum, state.tuned_accept_sum + accept_stat),
        tuned_count=jnp.where(tune, state.tuned_count, state.tuned_count + 1),
    )


def da_current(state: DAState, tune):
    """Step size to use this draw: adapting value while tuning, else the
    dual-averaged final value (cf. ``step_sizes.py:34-38``)."""
    return jnp.where(jnp.asarray(tune), jnp.exp(state.log_step),
                     jnp.exp(state.log_bar_step))


class DualAverageAdaptation:
    """Host-side wrapper retaining the reference class API
    (cf. ``step_sizes.py:21``)."""

    def __init__(self, initial_step, target, gamma=0.05, k=0.75, t0=10):
        self._target = float(target)
        self._gamma = gamma
        self._k = k
        self._t0 = t0
        self.reset(initial_step)

    def reset(self, initial_step):
        self._state = da_init(np.asarray(initial_step), target=self._target)
        self._tuned_accepts = []

    def current(self, tune):
        return float(np.asarray(da_current(self._state, tune)))

    def update(self, accept_stat, tune):
        self._state = da_update(self._state, accept_stat, tune,
                                target=self._target, gamma=self._gamma,
                                k=self._k, t0=self._t0)
        if not tune:
            self._tuned_accepts.append(float(accept_stat))

    def stats(self):
        return {
            "step_size": float(np.exp(np.asarray(self._state.log_step))),
            "step_size_bar": float(np.exp(np.asarray(self._state.log_bar_step))),
        }

    def warnings(self):
        from ..backends.report import SamplerWarning, WarningType
        accept = np.asarray(self._tuned_accepts)
        if len(accept) == 0:
            return []
        mean_accept = accept.mean()
        target_accept = self._target
        # Try to find a reasonable interval for acceptable acceptance
        # probabilities. Finding this was mostly trial and error.
        n_bound = min(100, len(accept))
        n_good, n_bad = mean_accept * n_bound, (1 - mean_accept) * n_bound
        from scipy import stats as st
        lower, upper = st.beta(n_good + 1, n_bad + 1).interval(0.95)
        if target_accept < lower or target_accept > upper:
            msg = (
                f"The acceptance probability does not match the target. It is "
                f"{mean_accept:g}, but should be close to {target_accept:g}. "
                "Try to increase the number of tuning steps."
            )
            info = {"target": target_accept, "actual": mean_accept,
                    "lower": lower, "upper": upper}
            return [SamplerWarning(WarningType.BAD_ACCEPTANCE, msg, "warn",
                                   None, None, info)]
        return []
