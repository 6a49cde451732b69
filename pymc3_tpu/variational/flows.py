"""Normalizing flows (cf. ``pymc3/variational/flows.py``).

Formula parser (``Formula``, ``flows.py:35``: e.g. ``'scale-loc'``,
``'planar*4'``) and the flow zoo: Planar (``:382``), Radial (``:513``),
Loc (``:526``), Scale (``:549``), Householder (``:574``). Each flow is a
pure parametric bijection ``forward(params, z) -> (z', logdet)`` batched
over the sample axis.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX

__all__ = ["Formula", "AbstractFlow", "PlanarFlow", "RadialFlow", "LocFlow",
           "ScaleFlow", "HouseholderFlow", "flow_for_short_name"]


class AbstractFlow:
    """cf. ``flows.py:117``."""

    short_name = ""

    def __init__(self, dim):
        self.dim = dim

    def init_params(self) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def forward(self, params, z):
        """(params, z (..., dim)) -> (z', logdet (...,))."""
        raise NotImplementedError


class PlanarFlow(AbstractFlow):
    """f(z) = z + u h(w·z + b) (cf. ``flows.py:382``)."""

    short_name = "planar"

    def init_params(self):
        rng = np.random.default_rng()
        return {
            "u": jnp.asarray(rng.normal(size=self.dim) * 0.01, floatX()),
            "w": jnp.asarray(rng.normal(size=self.dim) * 0.01, floatX()),
            "b": jnp.asarray(0.0, floatX()),
        }

    def forward(self, params, z):
        u, w, b = params["u"], params["w"], params["b"]
        # enforce invertibility: u_hat = u + (m(w·u) - w·u) w/|w|^2
        wu = jnp.dot(w, u)
        m_wu = -1.0 + jnp.logaddexp(0.0, wu)  # -1 + softplus
        u_hat = u + (m_wu - wu) * w / (jnp.dot(w, w) + 1e-10)
        a = z @ w + b                      # (...,)
        h = jnp.tanh(a)
        z_new = z + u_hat[None, :] * h[..., None] if z.ndim > 1 else \
            z + u_hat * h
        psi = (1 - jnp.tanh(a) ** 2)[..., None] * w  # (..., dim)
        logdet = jnp.log(jnp.abs(1 + psi @ u_hat) + 1e-10)
        return z_new, logdet


class RadialFlow(AbstractFlow):
    """f(z) = z + beta h(alpha, r)(z - z0) (cf. ``flows.py:513``)."""

    short_name = "radial"

    def init_params(self):
        rng = np.random.default_rng()
        return {
            "z0": jnp.asarray(rng.normal(size=self.dim) * 0.01, floatX()),
            "a_": jnp.asarray(0.0, floatX()),   # alpha = softplus(a_)
            "b_": jnp.asarray(0.0, floatX()),   # beta via reparam
        }

    def forward(self, params, z):
        z0, a_, b_ = params["z0"], params["a_"], params["b_"]
        alpha = jnp.logaddexp(a_, 0.0)
        # invertibility: beta = -alpha + softplus(b_)
        beta = -alpha + jnp.logaddexp(b_, 0.0)
        diff = z - z0
        r = jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + 1e-10)
        h = 1.0 / (alpha + r)
        z_new = z + (beta * h)[..., None] * diff
        hprime = -1.0 / (alpha + r) ** 2
        d = self.dim
        logdet = (d - 1) * jnp.log(jnp.abs(1 + beta * h) + 1e-10) + \
            jnp.log(jnp.abs(1 + beta * h + beta * hprime * r) + 1e-10)
        return z_new, logdet


class LocFlow(AbstractFlow):
    """f(z) = z + loc (cf. ``flows.py:526``)."""

    short_name = "loc"

    def init_params(self):
        return {"loc": jnp.zeros(self.dim, floatX())}

    def forward(self, params, z):
        return z + params["loc"], jnp.zeros(z.shape[:-1], floatX())


class ScaleFlow(AbstractFlow):
    """f(z) = exp(log_scale) * z (cf. ``flows.py:549``)."""

    short_name = "scale"

    def init_params(self):
        return {"log_scale": jnp.zeros(self.dim, floatX())}

    def forward(self, params, z):
        ls = params["log_scale"]
        return z * jnp.exp(ls), jnp.broadcast_to(jnp.sum(ls),
                                                 z.shape[:-1])


class HouseholderFlow(AbstractFlow):
    """f(z) = H z, H = I - 2 vv^T/|v|^2 (cf. ``flows.py:574``)."""

    short_name = "hh"

    def init_params(self):
        rng = np.random.default_rng()
        return {"v": jnp.asarray(rng.normal(size=self.dim), floatX())}

    def forward(self, params, z):
        v = params["v"]
        vv = jnp.dot(v, v) + 1e-10
        proj = (z @ v)[..., None] * v[None, :] if z.ndim > 1 else \
            jnp.dot(z, v) * v
        return z - 2 * proj / vv, jnp.zeros(z.shape[:-1], floatX())


_FLOWS = {f.short_name: f for f in
          (PlanarFlow, RadialFlow, LocFlow, ScaleFlow, HouseholderFlow)}


def flow_for_short_name(name):
    return _FLOWS[name]


class Formula:
    """Flow-chain formula parser (cf. ``flows.py:35``): ``'planar*4-loc'``
    means 4 planar flows followed by a loc flow, applied base→posterior."""

    def __init__(self, formula: str):
        self.formula = formula = formula.lower().replace(" ", "")
        specs = []
        for part in formula.split("-"):
            if "*" in part:
                name, count = part.split("*")
                count = int(count)
            else:
                name, count = part, 1
            if name not in _FLOWS:
                raise ValueError(
                    f"Unknown flow {name!r}; known: {sorted(_FLOWS)}")
            specs.extend([name] * count)
        self.specs = specs

    def build(self, dim) -> List[AbstractFlow]:
        return [_FLOWS[name](dim) for name in self.specs]

    def __call__(self, dim):
        return self.build(dim)

    def __repr__(self):
        return f"Formula({self.formula!r})"
