"""Bayesian ODEs (cf. ``pymc3/ode/ode.py``).

The reference wraps ``scipy.integrate.odeint`` (LSODA) in a Theano Op whose
gradient comes from forward sensitivities integrated alongside the state
(``ode/ode.py:27``, ``augment_system``, ``ode/utils.py:60``). On TPU the
solver itself is traced JAX: a fixed-grid RK4 integrator written with
``lax.scan``, differentiated *natively* by JAX (reverse-mode through the
scan replaces the hand-built sensitivity system) — no host round trip, and
the whole posterior logp including the ODE solve is one XLA program.
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX
from ..node import Node, apply as node_apply, as_node

__all__ = ["DifferentialEquation"]


def _rk4_step(func, y, t, dt, theta):
    k1 = func(y, t, theta)
    k2 = func(y + 0.5 * dt * k1, t + 0.5 * dt, theta)
    k3 = func(y + 0.5 * dt * k2, t + 0.5 * dt, theta)
    k4 = func(y + dt * k3, t + dt, theta)
    return y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


class DifferentialEquation:
    """Specify an ODE solved on a fixed time grid (cf. ``ode/ode.py:27``).

    Parameters
    ----------
    func : callable
        ``func(y, t, p)`` returning dy/dt (jax-traceable; list/tuple returns
        are stacked).
    times : array
        Output times (must be increasing; t0 prepended).
    n_states : int
    n_theta : int
    t0 : float
    n_substeps : int
        RK4 substeps between consecutive output times (accuracy knob —
        replaces LSODA's adaptivity with a static-shape grid XLA can fuse).
    """

    def __init__(self, func, times, n_states, n_theta, t0=0,
                 n_substeps=4):
        if not callable(func):
            raise ValueError("Argument func must be callable.")
        if n_states < 1:
            raise ValueError("Argument n_states must be at least 1.")
        if n_theta <= 0:
            raise ValueError("Argument n_theta must be positive.")
        self.func = func
        self.t0 = float(t0)
        self.times = np.asarray(times, dtype=np.float64)
        if np.any(np.diff(np.concatenate([[t0], self.times])) <= 0):
            raise ValueError("The initial time t0 must be smaller than the "
                             "first observation time, and times must be "
                             "strictly increasing.")
        self.n_states = int(n_states)
        self.n_theta = int(n_theta)
        self.n_times = len(self.times)
        self.n_substeps = int(n_substeps)

    def _solve(self, y0, theta):
        """(n_times, n_states) solution, fully traceable."""
        func = self.func

        def f(y, t, p):
            out = func(y, t, p)
            if isinstance(out, (list, tuple)):
                out = jnp.stack([jnp.asarray(o, floatX()).reshape(())
                                 for o in out])
            return jnp.asarray(out, floatX()).reshape(y.shape)

        y0 = jnp.asarray(y0, floatX()).reshape((self.n_states,))
        theta = jnp.asarray(theta, floatX()).reshape((self.n_theta,))

        grid = np.concatenate([[self.t0], self.times])
        # substep time points between outputs, shape (n_times, n_substeps)
        starts = grid[:-1]
        ends = grid[1:]
        dts = ((ends - starts) / self.n_substeps).astype(floatX())
        sub_ts = (starts[:, None] +
                  np.arange(self.n_substeps)[None, :] *
                  ((ends - starts) / self.n_substeps)[:, None]).astype(
                      floatX())

        def advance(y, inp):
            ts_i, dt_i = inp

            def sub(y, t):
                return _rk4_step(f, y, t, dt_i, theta), None
            y, _ = lax.scan(sub, y, ts_i)
            return y, y

        _, ys = lax.scan(advance, y0, (jnp.asarray(sub_ts),
                                       jnp.asarray(dts)))
        return ys

    def __call__(self, y0, theta, return_sens=False, **kwargs):
        """Build the symbolic solution node (cf. ``ode/ode.py:84``)."""
        if isinstance(y0, (list, tuple)) and len(y0) != self.n_states:
            raise ValueError(f"Length of y0 is wrong. Expected {self.n_states}"
                             f", got {len(y0)}.")
        if isinstance(theta, (list, tuple)) and len(theta) != self.n_theta:
            raise ValueError(f"Length of theta is wrong. Expected "
                             f"{self.n_theta}, got {len(theta)}.")

        def pack(*vals):
            return jnp.stack([jnp.asarray(v, floatX()).reshape(())
                              for v in vals]) if len(vals) > 1 else \
                jnp.asarray(vals[0], floatX()).reshape(-1)

        if isinstance(y0, (list, tuple)):
            y0_node = node_apply(pack, *y0)
        else:
            y0_node = as_node(y0)
        if isinstance(theta, (list, tuple)):
            theta_node = node_apply(pack, *theta)
        else:
            theta_node = as_node(theta)

        sol = node_apply(lambda y0_, th_: self._solve(y0_, th_),
                         y0_node, theta_node)
        return sol

    def __repr__(self):
        return (f"DifferentialEquation(n_states={self.n_states}, "
                f"n_theta={self.n_theta})")
