"""Categorical Gibbs (cf. ``pymc3/step_methods/gibbs.py``).

``ElemwiseCategorical`` resamples each categorical element from its full
conditional by evaluating the joint logp at every category — vectorized over
categories on-device.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..model import modelcontext
from .arraystep import ArrayStepShared, Competence, TuneContext

__all__ = ["ElemwiseCategorical"]


class _GState(NamedTuple):
    dummy: jnp.ndarray


class ElemwiseCategorical(ArrayStepShared):
    """Gibbs sampling for categorical variables (cf. ``gibbs.py:32``)."""

    name = "elemwise_categorical"
    generates_stats = False

    def __init__(self, vars, values=None, model=None, **kwargs):
        model = modelcontext(model)
        self._setup_vars(vars, model)
        if values is None:
            ks = []
            for v in self.vars:
                k = getattr(v.distribution, "k", None)
                try:
                    k = int(np.asarray(
                        k if not hasattr(k, "test_value") else
                        k.test_value).item())
                except Exception:
                    p = getattr(v.distribution, "p", None)
                    k = int(np.shape(p.test_value)[-1])
                ks.append(k)
            self.k = max(ks)
        else:
            self.k = len(values)
        self._logp_fn = model.make_logp_fn()
        self._sub_idx = jnp.asarray(self.q_indices, jnp.int32)

    def kernel_init(self, q0):
        return _GState(dummy=jnp.asarray(0.0, floatX()))

    def kernel_step(self, key, q, state, tctx: TuneContext):
        q = jnp.asarray(q, floatX())

        def coord(carry, i):
            q, key = carry
            key, kc = jax.random.split(key)
            gidx = self._sub_idx[i]
            cats = jnp.arange(self.k, dtype=floatX())
            logps = jax.vmap(
                lambda c: self._logp_fn(q.at[gidx].set(c)))(cats)
            logps = jnp.where(jnp.isnan(logps), -jnp.inf, logps)
            new = jax.random.categorical(kc, logps).astype(floatX())
            return (q.at[gidx].set(new), key), None

        (q_new, _), _ = jax.lax.scan(
            coord, (q, key), jnp.arange(self.dim, dtype=jnp.int32))
        return q_new, state, {}

    @staticmethod
    def competence(var, has_grad=False):
        dist = getattr(var, "distribution", None)
        if type(dist).__name__ == "Categorical":
            return Competence.COMPATIBLE
        return Competence.INCOMPATIBLE
