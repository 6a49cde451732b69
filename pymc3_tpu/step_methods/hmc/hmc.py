"""Static Hamiltonian Monte Carlo (cf. ``pymc3/step_methods/hmc/hmc.py``).

One trajectory of ``path_length/step_size`` leapfrog steps via ``lax.scan``
(fixed per draw by padding to a static bound with masking), then a Metropolis
accept (cf. ``hmc.py:30``). Pure kernel: scans over draws, vmaps over chains.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...config import floatX
from ...model import modelcontext
from ..arraystep import Competence, GradientSharedStep, TuneContext
from ..step_sizes import DAState, da_init, da_update, da_current
from .integration import IntegrationState, leapfrog
from .nuts import NutsKernelState  # same state layout
from .quadpotential import (
    QuadPotentialDiagAdapt, diag_adapt_update, diag_random,
    DenseAdaptState, dense_adapt_update, mass_velocity, kernel_mass,
    kernel_momentum,
)

__all__ = ["HamiltonianMC"]


class HamiltonianMC(GradientSharedStep):
    """Static-trajectory HMC (cf. ``hmc.py:30``)."""

    name = "hmc"
    default_blocked = True
    generates_stats = True
    stats_dtypes = [{
        "step_size": np.float64,
        "n_steps": np.int64,
        "tune": bool,
        "step_size_bar": np.float64,
        "accept": np.float64,
        "diverging": bool,
        "energy_error": np.float64,
        "energy": np.float64,
        "path_length": np.float64,
        "accepted": bool,
        "model_logp": np.float64,
    }]

    def __init__(self, vars=None, path_length=2.0, max_steps=1024,
                 target_accept=0.65, step_scale=0.25, Emax=1000,
                 adapt_step_size=True, potential=None, model=None,
                 scaling=None, is_cov=False, gamma=0.05, k=0.75, t0=10,
                 axis_name=None, **kwargs):
        model = modelcontext(model)
        if vars is None:
            vars = model.cont_vars
        kwargs.pop("blocked", None)
        super().__init__(vars, model=model, blocked=True, **kwargs)

        self.path_length = float(path_length)
        self.max_steps = int(max_steps)
        self.target_accept = float(target_accept)
        self.Emax = float(Emax)
        self.adapt_step_size = bool(adapt_step_size)
        self.gamma, self.k, self.t0 = gamma, k, t0
        self.tune = True
        self.axis_name = axis_name

        size = self.dim
        self.step_size = float(step_scale) / (size ** 0.25)

        if scaling is not None:
            from .quadpotential import quad_potential
            potential = quad_potential(scaling, is_cov)
        if potential is not None:
            self.potential = potential
        else:
            mean = np.asarray(
                np.concatenate([np.ravel(v.test_value) for v in self.vars])
                if self.vars else np.zeros(size), dtype=floatX())
            self.potential = QuadPotentialDiagAdapt(size, mean)

        self._partial = self.q_indices.size != model.ordering.size
        self._sub_idx = jnp.asarray(self.q_indices, jnp.int32)
        full_logp = self._logp_fn
        if self._partial:
            idx = self._sub_idx
            self._kernel_logp = lambda x, q_ctx: full_logp(q_ctx.at[idx].set(x))
        else:
            self._kernel_logp = lambda x, q_ctx: full_logp(x)

    def kernel_init(self, q0):
        q0 = jnp.asarray(q0, floatX())
        x0 = q0[self._sub_idx] if self._partial else q0
        logp, grad = jax.value_and_grad(
            lambda x: self._kernel_logp(x, q0))(x0)
        da = da_init(jnp.asarray(self.step_size, floatX()),
                     target=self.target_accept)
        pot = self.potential.init_kernel_state()
        return NutsKernelState(q=x0, logp=logp, grad=grad, da=da, pot=pot,
                               rescue_cnt=jnp.asarray(0, jnp.int32),
                               eps_scale=jnp.asarray(1.0, floatX()))

    def kernel_step(self, key, q, state: NutsKernelState, tctx: TuneContext):
        q = jnp.asarray(q, floatX())
        lp_fn = jax.value_and_grad(lambda x: self._kernel_logp(x, q))
        k_mom, k_acc = jax.random.split(key)

        eps = da_current(state.da, tctx.tune)
        var = kernel_mass(state.pot)
        p0 = kernel_momentum(k_mom, state.pot)

        x0 = q[self._sub_idx] if self._partial else q
        if self._partial:
            # other steppers moved the context coords since our last call —
            # the cached logp/grad no longer describe (x0, q): recompute
            logp0, grad0 = lp_fn(x0)
        else:
            logp0, grad0 = state.logp, state.grad
        v0 = mass_velocity(var, p0)
        h0 = 0.5 * jnp.dot(p0, v0) - logp0
        start = IntegrationState(q=x0, p=p0, v=v0, q_grad=grad0,
                                 energy=h0, model_logp=logp0)

        # number of leapfrog steps for this trajectory (traced, bounded)
        n_steps = jnp.maximum(
            1, (self.path_length / eps).astype(jnp.int32))
        n_steps = jnp.minimum(n_steps, self.max_steps)

        def body(carry):
            i, st = carry
            return i + 1, leapfrog(lp_fn, var, eps, st)

        _, end = lax.while_loop(lambda c: c[0] < n_steps, body,
                                (jnp.asarray(0, jnp.int32), start))

        energy_error = end.energy - h0
        energy_error = jnp.where(jnp.isnan(energy_error), jnp.inf,
                                 energy_error)
        diverging = energy_error > self.Emax
        accept_stat = jnp.exp(jnp.minimum(jnp.asarray(0.0, floatX()),
                                          -energy_error))
        accepted = (jnp.log(jax.random.uniform(k_acc, (), floatX()))
                    < -energy_error)

        x_new = jnp.where(accepted, end.q, x0)
        logp_new = jnp.where(accepted, end.model_logp, logp0)
        grad_new = jnp.where(accepted, end.q_grad, grad0)

        da_new = da_update(state.da, accept_stat,
                           tctx.tune & self.adapt_step_size,
                           target=self.target_accept, gamma=self.gamma,
                           k=self.k, t0=self.t0)
        pool = None
        if self.axis_name is not None:
            from ...parallel import pooled_axes
            pool = pooled_axes(self.axis_name)
        if not getattr(self.potential, "adapts", False):
            pot_new = state.pot
        elif isinstance(state.pot, DenseAdaptState):
            pot_new = dense_adapt_update(
                state.pot, x_new, tctx.tune,
                window_multiplier=getattr(
                    self.potential, "adaptation_window_multiplier", 2.0),
                axis_name=pool)
        else:
            pot_new = diag_adapt_update(
                state.pot, x_new, tctx.tune,
                adaptation_window=getattr(
                    self.potential, "adaptation_window", 101),
                axis_name=pool)

        q_new = q.at[self._sub_idx].set(x_new) if self._partial else x_new
        new_state = NutsKernelState(q=x_new, logp=logp_new, grad=grad_new,
                                    rescue_cnt=state.rescue_cnt,
                                    eps_scale=state.eps_scale,
                                    da=da_new, pot=pot_new)
        stats = {
            "step_size": eps,
            "n_steps": n_steps,
            "tune": tctx.tune,
            "step_size_bar": jnp.exp(da_new.log_bar_step),
            "accept": accept_stat,
            "diverging": diverging & ~tctx.tune,
            "energy_error": energy_error,
            "energy": end.energy,
            "path_length": jnp.asarray(self.path_length, floatX()),
            "accepted": accepted,
            "model_logp": logp_new,
        }
        return q_new, new_state, stats

    @staticmethod
    def competence(var, has_grad=False):
        from ...vartypes import continuous_types
        dist = getattr(var, "distribution", None)
        dtype = getattr(dist, "dtype", None) or getattr(var, "dtype", None)
        if str(np.dtype(dtype)) in continuous_types and has_grad:
            return Competence.COMPATIBLE
        return Competence.INCOMPATIBLE

    def warnings(self):
        return []
