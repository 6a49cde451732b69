"""Stein variational helpers (cf. ``pymc3/variational/stein.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import floatX

__all__ = ["Stein"]


class Stein:
    """Stein variational gradient pieces (cf. ``stein.py:26``)."""

    def __init__(self, approx, kernel, temperature=1.0):
        self.approx = approx
        self.kernel = kernel
        self.temperature = float(temperature)

    def grad(self, particles):
        """SVGD ascent direction phi*(x) for the particle set."""
        logp_grad = jax.vmap(jax.grad(self.approx.model.make_logp_fn()))
        glogp = logp_grad(particles)
        kxy, dxkxy = self.kernel(particles)
        n = particles.shape[0]
        return (kxy @ glogp / self.temperature + dxkxy) / n
