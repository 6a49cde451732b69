"""Shape algebra for forward sampling, mirroring
``pymc3/distributions/shape_utils.py``."""
from __future__ import annotations

import numpy as np

__all__ = [
    "to_tuple",
    "shapes_broadcasting",
    "broadcast_dist_samples_shape",
    "get_broadcastable_dist_samples",
    "broadcast_distribution_samples",
    "broadcast_dist_samples_to",
]


def to_tuple(shape):
    """None -> (), int -> (int,), iterable -> tuple (cf. ``shape_utils.py:33``)."""
    if shape is None:
        return tuple()
    temp = np.atleast_1d(shape)
    if temp.size == 0:
        return tuple()
    return tuple(int(s) for s in temp)


def shapes_broadcasting(*args, raise_exception=False):
    """Broadcast shape of the supplied shapes, or None (cf. ``:73``)."""
    x = list(args[0]) if args else []
    for arg in args[1:]:
        y = list(arg)
        if len(x) < len(y):
            x, y = y, x
        if len(y) > 0:
            x[-len(y):] = [
                j if i == 1 else i if j == 1 else i if i == j else None
                for i, j in zip(x[-len(y):], y)
            ]
        if any(a is None for a in x):
            if raise_exception:
                raise ValueError(f"Supplied shapes {args} do not broadcast together")
            return None
    return tuple(x)


def broadcast_dist_samples_shape(shapes, size=None):
    """Broadcast shapes which may carry a leading ``size`` prepend
    (cf. ``shape_utils.py:114``).  The prepend is ignored while deciding
    whether the core shapes broadcast; it re-enters the result only through
    the shapes that actually carried it (with broadcasting axes inserted
    between the prepend and the core), so plain shapes never get a
    spurious ``size`` prefix."""
    if size is None:
        return shapes_broadcasting(*shapes, raise_exception=True)
    shapes = [tuple(s) for s in shapes]
    _size = to_tuple(size)

    def _has_prepend(s):
        return _size == s[:min(len(_size), len(s))]

    cores = [s[len(_size):] if _has_prepend(s) else s for s in shapes]
    core_shape = shapes_broadcasting(*cores, raise_exception=True)
    padded = [
        _size + (1,) * (len(core_shape) - len(core)) + core
        if _has_prepend(s) else s
        for s, core in zip(shapes, cores)
    ]
    return shapes_broadcasting(*padded, raise_exception=True)


def get_broadcastable_dist_samples(samples, size=None, must_bcast_with=None,
                                   return_out_shape=False):
    """Reshape samples (which may carry a leading size prepend) so they all
    broadcast together (cf. ``:203``)."""
    samples = [np.asarray(s) for s in samples]
    _size = to_tuple(size)
    if must_bcast_with is not None:
        must_bcast_with = to_tuple(must_bcast_with)
    shapes = [s.shape for s in samples]
    out_shape = broadcast_dist_samples_shape(
        shapes + ([must_bcast_with] if must_bcast_with else []), size=size)
    outs = []
    for s in samples:
        # min-slice prepend test matches the reference (``:285``): an empty
        # size counts as a universal prepend, so everything pads to rank
        if _size == s.shape[:min(len(_size), s.ndim)]:
            core = s.shape[len(_size):]
            core_out = out_shape[len(_size):]
            pad = len(core_out) - len(core)
            new_shape = _size + (1,) * pad + core
            outs.append(s.reshape(new_shape))
        else:
            outs.append(s)
    if return_out_shape:
        return outs, out_shape
    return outs


def broadcast_distribution_samples(samples, size=None):
    """Broadcast all samples to their common shape (cf. ``:305``)."""
    outs, out_shape = get_broadcastable_dist_samples(
        samples, size=size, return_out_shape=True)
    return [np.broadcast_to(o, out_shape) for o in outs]


def broadcast_dist_samples_to(to_shape, samples, size=None):
    """Broadcast samples to ``size + to_shape`` (cf. ``:351``)."""
    samples, to_shape = get_broadcastable_dist_samples(
        samples, size=size, must_bcast_with=to_shape, return_out_shape=True)
    return [np.broadcast_to(o, to_shape) for o in samples]
