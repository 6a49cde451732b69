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
    """Broadcast shapes which may have a leading ``size`` prepend (cf. ``:114``)."""
    if size is None:
        return shapes_broadcasting(*shapes, raise_exception=True)
    _size = to_tuple(size)
    _shapes = [
        s if s[:len(_size)] != _size else s[len(_size):]
        for s in (tuple(sh) for sh in shapes)
    ]
    try:
        broadcast_shape = shapes_broadcasting(*_shapes, raise_exception=True)
    except ValueError:
        b = shapes_broadcasting(*shapes, raise_exception=True)
        return b
    return _size + broadcast_shape


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
        if _size and s.shape[:len(_size)] == _size:
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
