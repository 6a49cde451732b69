"""Kernels for SVGD (cf. ``pymc3/variational/test_functions.py``)."""
from __future__ import annotations

import jax.numpy as jnp

from ..config import floatX
from .opvi import TestFunction

__all__ = ["Kernel", "RBF"]


class Kernel(TestFunction):
    """Dual kernel K(x, y) returning (kxy, dxkxy)
    (cf. ``test_functions.py:24``)."""


class RBF(Kernel):
    """RBF kernel with the median heuristic bandwidth
    (cf. ``test_functions.py:35``)."""

    def __call__(self, X):
        X = jnp.asarray(X, floatX())
        XY = X @ X.T
        x2 = jnp.sum(X ** 2, axis=1)
        pdist2 = x2[:, None] - 2 * XY + x2[None, :]
        n = X.shape[0]
        med2 = jnp.median(pdist2)
        h = jnp.sqrt(0.5 * med2 / jnp.log(n + 1.0) + 1e-12)
        kxy = jnp.exp(-pdist2 / (h ** 2) / 2.0)
        dxkxy = -(kxy @ X)
        sumkxy = jnp.sum(kxy, axis=1, keepdims=True)
        dxkxy = (dxkxy + X * sumkxy) / (h ** 2)
        return kxy, dxkxy
