"""Bound factory: truncate any distribution, mirroring
``pymc3/distributions/bound.py`` (320 LoC)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import floatX
from ..node import Node, as_node
from . import transforms
from .dist_math import bound as bound_mask
from .distribution import Distribution, Discrete, Continuous, draw_values

__all__ = ["Bound"]


class _Bounded(Distribution):
    """Wrapper distribution adding truncation (cf. ``bound.py:34``).

    Note: like the reference, the truncated density is *unnormalized* — fine
    for sampling, not for model comparison.
    """

    def __init__(self, distribution, lower, upper, default, *args, **kwargs):
        self.lower = lower
        self.upper = upper
        self._wrapped = distribution.dist(*args, **kwargs)

        if default is None:
            defaults = self._wrapped.defaults
            for name in defaults:
                setattr(self, name, getattr(self._wrapped, name))
        else:
            defaults = ("_default",)
            self._default = default

        super().__init__(
            shape=self._wrapped.shape, dtype=self._wrapped.dtype,
            testval=self._wrapped.testval, defaults=defaults,
            transform=self._wrapped.transform)

        if default is None:
            self.testval = self._get_bounded_testval()

    def _get_bounded_testval(self):
        tv = np.asarray(self._wrapped.default())
        lo = -np.inf if self.lower is None else np.asarray(
            as_node(self.lower).test_value)
        hi = np.inf if self.upper is None else np.asarray(
            as_node(self.upper).test_value)
        span_lo = np.where(np.isfinite(lo), lo, tv)
        span_hi = np.where(np.isfinite(hi), hi, tv)
        out = np.clip(tv, span_lo, span_hi)
        both = np.isfinite(lo) & np.isfinite(hi)
        out = np.where(both & ((out <= lo) | (out >= hi)),
                       (lo + hi) / 2.0, out)
        only_lo = np.isfinite(lo) & ~np.isfinite(hi)
        out = np.where(only_lo & (out <= lo), lo + 1.0, out)
        only_hi = ~np.isfinite(lo) & np.isfinite(hi)
        out = np.where(only_hi & (out >= hi), hi - 1.0, out)
        return out.astype(self._wrapped.dtype)

    def logp(self, value, env=None, memo=None):
        logp = self._wrapped.logp(value, env, memo)
        conds = []
        if self.lower is not None:
            conds.append(jnp.asarray(value) >= jnp.asarray(
                floatX(np.asarray(self.lower))
                if not isinstance(self.lower, Node) else
                as_node(self.lower).test_value))
        if self.upper is not None:
            conds.append(jnp.asarray(value) <= jnp.asarray(
                floatX(np.asarray(self.upper))
                if not isinstance(self.upper, Node) else
                as_node(self.upper).test_value))
        if not conds:
            return logp
        return bound_mask(logp, *conds)

    def random(self, point=None, size=None):
        """Rejection sampling (cf. ``bound.py:84``)."""
        lo = -np.inf if self.lower is None else np.asarray(
            as_node(self.lower).test_value)
        hi = np.inf if self.upper is None else np.asarray(
            as_node(self.upper).test_value)
        out = np.asarray(self._wrapped.random(point=point, size=size),
                         dtype=float)
        bad = (out < lo) | (out > hi)
        tries = 0
        while np.any(bad) and tries < 1000:
            resampled = np.asarray(
                self._wrapped.random(point=point, size=size), dtype=float)
            out = np.where(bad, resampled, out)
            bad = (out < lo) | (out > hi)
            tries += 1
        if np.any(bad):
            raise RuntimeError(
                "Could not sample from bounded distribution in 1000 tries")
        return out.astype(self._wrapped.dtype)


class _DiscreteBounded(_Bounded, Discrete):
    """cf. ``bound.py:155``."""

    def __init__(self, distribution, lower, upper, transform="infer",
                 *args, **kwargs):
        if transform == "infer":
            transform = None
        if transform is not None:
            raise ValueError("Can't transform discrete variable.")
        if lower is None and upper is None:
            default = None
        elif lower is not None and upper is not None:
            default = (int(np.asarray(lower)) + int(np.asarray(upper))) // 2
        elif lower is not None:
            default = int(np.asarray(lower)) + 1
        else:
            default = int(np.asarray(upper)) - 1
        super().__init__(distribution, lower, upper, default, *args, **kwargs)


class _ContinuousBounded(_Bounded, Continuous):
    """cf. ``bound.py:176``."""

    def __init__(self, distribution, lower, upper, transform="infer",
                 *args, **kwargs):
        if transform == "infer":
            if lower is None and upper is None:
                transform = None
            elif lower is not None and upper is not None:
                transform = transforms.interval(lower, upper)
            elif lower is not None:
                transform = transforms.lowerbound(lower)
            else:
                transform = transforms.upperbound(upper)
        default = None
        super().__init__(distribution, lower, upper, default, *args, **kwargs)
        self.transform = transform


class Bound:
    r"""Create a new bounded distribution factory (cf. ``bound.py:223``).

    Example::

        NegativeNormal = pm.Bound(pm.Normal, upper=0.0)
        x = NegativeNormal('x', mu=0., sigma=1.)
    """

    def __init__(self, distribution, lower=None, upper=None):
        if isinstance(distribution, _Bounded):
            raise ValueError("Cannot bound a bounded distribution")
        self.distribution = distribution
        self.lower = lower
        self.upper = upper

    def __call__(self, name, *args, **kwargs):
        if "observed" in kwargs:
            raise ValueError(
                "Observed Bound distributions are not supported. If you want "
                "to model truncated data you can use a pm.Potential in "
                "combination with the cumulative probability function.")
        transform = kwargs.pop("transform", "infer")
        if issubclass(self.distribution, Continuous):
            return _ContinuousBounded(
                name, self.distribution, self.lower, self.upper,
                transform, *args, **kwargs)
        return _DiscreteBounded(
            name, self.distribution, self.lower, self.upper,
            transform, *args, **kwargs)

    def dist(self, *args, **kwargs):
        transform = kwargs.pop("transform", "infer")
        if issubclass(self.distribution, Continuous):
            return _ContinuousBounded.dist(
                self.distribution, self.lower, self.upper, transform,
                *args, **kwargs)
        return _DiscreteBounded.dist(
            self.distribution, self.lower, self.upper, transform,
            *args, **kwargs)
