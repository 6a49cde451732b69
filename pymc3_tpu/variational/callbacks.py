"""VI fit callbacks (cf. ``pymc3/variational/callbacks.py``)."""
from __future__ import annotations

import collections
from typing import Callable

import numpy as np

__all__ = ["Callback", "CheckParametersConvergence", "Tracker"]


class Callback:
    def __call__(self, approx, loss_hist, i):
        raise NotImplementedError


def relative(current, prev, eps=1e-6):
    return (np.abs(current - prev) + eps) / (np.abs(prev) + eps)


def absolute(current, prev):
    return np.abs(current - prev)


_diff = {"relative": relative, "absolute": absolute}


class CheckParametersConvergence(Callback):
    """Convergence check on flat parameter deltas
    (cf. ``callbacks.py:45``; used by NUTS-ADVI init,
    ``sampling.py:1910-1913``)."""

    def __init__(self, every=100, tolerance=1e-3, diff="relative",
                 ord=np.inf):
        self._diff = _diff[diff]
        self.ord = ord
        self.every = every
        self.prev = None
        self.tolerance = tolerance

    def __call__(self, approx, _, i):
        if i % self.every or i < self.every:
            return
        current = self.flatten_shared(approx)
        if self.prev is None:
            self.prev = current
            return
        prev = self.prev
        delta = self._diff(current, prev)
        self.prev = current
        norm = np.linalg.norm(delta, self.ord)
        if norm < self.tolerance:
            raise StopIteration(f"Convergence achieved at {i}")

    @staticmethod
    def flatten_shared(approx):
        import jax
        leaves = jax.tree_util.tree_leaves(approx.params)
        return np.concatenate([np.ravel(np.asarray(l)) for l in leaves])


class Tracker(Callback):
    """Record arbitrary stats during fit (cf. ``callbacks.py:98``).

    >>> tracker = Tracker(mean=lambda approx, *_: approx.mean)
    """

    def __init__(self, **kwargs):
        self.whatchdict = kwargs
        self.hist = collections.defaultdict(list)

    def record(self, approx, hist, i):
        for key, fn in self.whatchdict.items():
            self.hist[key].append(fn(approx, hist, i))

    __call__ = record

    def clear(self):
        self.hist = collections.defaultdict(list)

    def __getitem__(self, item):
        return self.hist[item]
