"""VI fit callbacks (cf. ``pymc3/variational/callbacks.py``)."""
from __future__ import annotations

import collections

import numpy as np

__all__ = ["Callback", "CheckParametersConvergence", "Tracker"]


class Callback:
    def __call__(self, approx, loss_hist, i):
        raise NotImplementedError


class CheckParametersConvergence(Callback):
    """Early-stop when the flat variational parameter vector stops moving
    (cf. ``callbacks.py:45``; the NUTS-ADVI init paths attach one absolute
    and one relative instance, ``sampling.py:1910-1913``).

    Every ``every`` iterations the current parameter snapshot is compared
    to the previous one; if the ``ord``-norm of the (absolute or
    relative) per-element change drops below ``tolerance``, fit() is
    stopped by raising ``StopIteration``.
    """

    def __init__(self, every=100, tolerance=1e-3, diff="relative",
                 ord=np.inf):
        if diff not in ("relative", "absolute"):
            raise ValueError(f"diff must be 'relative' or 'absolute', "
                             f"got {diff!r}")
        self.diff = diff
        self.every = int(every)
        self.tolerance = tolerance
        self.ord = ord
        self.prev = None

    def __call__(self, approx, _, i):
        if i < self.every or i % self.every:
            return
        snapshot = self.flatten_shared(approx)
        previous, self.prev = self.prev, snapshot
        if previous is None:
            return
        change = np.abs(snapshot - previous)
        if self.diff == "relative":
            change = (change + 1e-6) / (np.abs(previous) + 1e-6)
        if np.linalg.norm(change, self.ord) < self.tolerance:
            raise StopIteration(f"Convergence achieved at {i}")

    @staticmethod
    def flatten_shared(approx):
        """All variational parameters as one flat vector (the pytree
        analog of the reference's shared-variable concat)."""
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
