"""Univariate slice sampler (cf. ``pymc3/step_methods/slicer.py``).

Coordinate-wise stepping-out slice sampling (Neal 2003). Each coordinate
update is a pair of bounded ``lax.while_loop``s (step-out, then shrink); the
coordinate sweep is a ``lax.scan``. Pure kernel: vmappable over chains.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX
from ..model import modelcontext
from ..vartypes import continuous_types
from .arraystep import ArrayStepShared, Competence, TuneContext

__all__ = ["Slice"]


class SliceState(NamedTuple):
    logp: jnp.ndarray
    w: jnp.ndarray         # per-dim step-out widths (tuned)
    n_tunes: jnp.ndarray


class Slice(ArrayStepShared):
    """Univariate slice sampler step (cf. ``slicer.py:30``)."""

    name = "slice"
    default_blocked = False
    generates_stats = True
    stats_dtypes = [{"tune": bool, "nstep_out": np.int64, "nstep_in": np.int64}]

    def __init__(self, vars=None, w=1.0, tune=True, model=None,
                 iter_limit=np.inf, max_steps=64, **kwargs):
        model = modelcontext(model)
        if vars is None:
            vars = model.cont_vars
        self._setup_vars(vars, model)
        self.w = float(np.atleast_1d(w)[0])
        self.tune = bool(tune)
        self.max_steps = int(min(max_steps,
                                 iter_limit if np.isfinite(iter_limit) else
                                 max_steps))
        self._logp_fn = model.make_logp_fn()
        self._sub_idx = jnp.asarray(self.q_indices, jnp.int32)

    def kernel_init(self, q0):
        q0 = jnp.asarray(q0, floatX())
        return SliceState(
            logp=self._logp_fn(q0),
            w=jnp.full((self.dim,), self.w, floatX()),
            n_tunes=jnp.asarray(0.0, floatX()),
        )

    def kernel_step(self, key, q, state: SliceState, tctx: TuneContext):
        q = jnp.asarray(q, floatX())
        k_scan, _ = jax.random.split(key)
        logp_fn = self._logp_fn
        max_steps = self.max_steps

        def coord_update(carry, i):
            q, logp, w_all, key = carry
            key, k_y, k_u, k_shrink = jax.random.split(key, 4)
            gidx = self._sub_idx[i]
            x0 = q[gidx]
            wi = w_all[i]

            # vertical level: y = logp - Exp(1)
            y = logp - jax.random.exponential(k_y, (), floatX())

            # initial bracket around x0
            u = jax.random.uniform(k_u, (), floatX())
            left0 = x0 - u * wi
            right0 = left0 + wi

            lp_at = lambda x: logp_fn(q.at[gidx].set(x))

            def out_cond(c):
                left, right, nl, nr = c
                grow_l = (lp_at(left) > y) & (nl < max_steps)
                grow_r = (lp_at(right) > y) & (nr < max_steps)
                return grow_l | grow_r

            def out_body(c):
                left, right, nl, nr = c
                grow_l = lp_at(left) > y
                grow_r = lp_at(right) > y
                left = jnp.where(grow_l & (nl < max_steps), left - wi, left)
                right = jnp.where(grow_r & (nr < max_steps), right + wi, right)
                return (left, right,
                        nl + grow_l.astype(jnp.int32),
                        nr + grow_r.astype(jnp.int32))

            left, right, nl, nr = lax.while_loop(
                out_cond, out_body,
                (left0, right0, jnp.asarray(0, jnp.int32),
                 jnp.asarray(0, jnp.int32)))

            # shrinkage
            def in_cond(c):
                x, l, r, k, n, done = c
                return (~done) & (n < 2 * max_steps)

            def in_body(c):
                x, l, r, k, n, done = c
                k, ku = jax.random.split(k)
                x_new = jax.random.uniform(ku, (), floatX(), l, r)
                ok = lp_at(x_new) > y
                l = jnp.where(ok, l, jnp.where(x_new < x0, x_new, l))
                r = jnp.where(ok, r, jnp.where(x_new >= x0, x_new, r))
                x = jnp.where(ok, x_new, x)
                return (x, l, r, k, n + 1, ok)

            x_new, _, _, _, n_in, ok = lax.while_loop(
                in_cond, in_body,
                (x0, left, right, k_shrink, jnp.asarray(0, jnp.int32),
                 jnp.asarray(False)))
            x_new = jnp.where(ok, x_new, x0)
            q = q.at[gidx].set(x_new)
            logp = logp_fn(q)

            # width tuning (cf. slicer.py:103-113): w <- 2*|bracket|/2 avg
            w_new = jnp.where(
                jnp.asarray(self.tune) & tctx.tune,
                0.9 * w_all[i] + 0.1 * (right - left), w_all[i])
            w_all = w_all.at[i].set(w_new)
            return (q, logp, w_all, key), (nl + nr, n_in)

        (q_new, logp_new, w_new, _), (n_out, n_in) = lax.scan(
            coord_update,
            (q, self._refresh_logp(q, state.logp), state.w, k_scan),
            jnp.arange(self.dim, dtype=jnp.int32))

        stats = {
            "tune": tctx.tune,
            "nstep_out": jnp.sum(n_out).astype(jnp.int32),
            "nstep_in": jnp.sum(n_in).astype(jnp.int32),
        }
        return q_new, SliceState(logp_new, w_new, state.n_tunes + 1), stats

    @staticmethod
    def competence(var, has_grad=False):
        dist = getattr(var, "distribution", None)
        dtype = getattr(dist, "dtype", None) or getattr(var, "dtype", None)
        if str(np.dtype(dtype)) in continuous_types:
            return Competence.PREFERRED
        return Competence.INCOMPATIBLE
