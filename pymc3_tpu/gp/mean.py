"""GP mean functions (cf. ``pymc3/gp/mean.py``)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import floatX
from ..node import Node, apply as node_apply

__all__ = ["Zero", "Constant", "Linear", "Mean"]


class Mean:
    """Base mean class (cf. ``mean.py:22``)."""

    def __call__(self, X):
        raise NotImplementedError

    def __add__(self, other):
        return Add(self, other)

    def __mul__(self, other):
        return Prod(self, other)


class Zero(Mean):
    """cf. ``mean.py:42``."""

    def __call__(self, X):
        return node_apply(
            lambda X_: jnp.zeros(jnp.shape(jnp.atleast_2d(X_))[0],
                                 floatX()), X)


class Constant(Mean):
    """cf. ``mean.py:51``."""

    def __init__(self, c=0):
        self.c = c

    def __call__(self, X):
        return node_apply(
            lambda X_, c: jnp.full(jnp.shape(jnp.atleast_2d(X_))[0], c,
                                   floatX()), X, self.c)


class Linear(Mean):
    """m(X) = X @ coeffs + intercept (cf. ``mean.py:69``)."""

    def __init__(self, coeffs, intercept=0):
        self.b = intercept
        self.A = coeffs

    def __call__(self, X):
        return node_apply(
            lambda X_, A, b: jnp.squeeze(
                jnp.atleast_2d(jnp.asarray(X_, floatX())) @ A) + b,
            X, self.A, self.b)


class Add(Mean):
    def __init__(self, first_mean, second_mean):
        self.m1 = first_mean
        self.m2 = second_mean

    def __call__(self, X):
        return self.m1(X) + self.m2(X)


class Prod(Mean):
    def __init__(self, first_mean, second_mean):
        self.m1 = first_mean
        self.m2 = second_mean

    def __call__(self, X):
        return self.m1(X) * self.m2(X)
