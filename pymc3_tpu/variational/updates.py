"""Optimizer update rules (cf. ``pymc3/variational/updates.py``).

The reference ships Lasagne-derived *symbolic* update dicts; here each rule
is a pure functional optimizer ``(init(params) -> state,
update(grads, state, params) -> (new_params, new_state))`` over flat jnp
arrays, so one VI step is a single fused XLA program and the whole fit loop
is a ``lax.scan``. The Lasagne calling convention (``adam(loss, params)``)
is kept for API parity: calling a rule *without* loss/params returns a
curried optimizer object (as the reference does via ``partial``).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX

__all__ = [
    "sgd", "momentum", "nesterov_momentum", "adagrad", "adagrad_window",
    "rmsprop", "adadelta", "adam", "adamax", "norm_constraint",
    "total_norm_constraint", "Optimizer", "apply_momentum",
    "apply_nesterov_momentum",
]


class Optimizer:
    """Functional optimizer: ``init(params)``, ``update(g, state, params)``."""

    def __init__(self, name, init_fn, update_fn, **hyper):
        self.name = name
        self._init = init_fn
        self._update = update_fn
        self.hyper = hyper

    def init(self, params):
        return self._init(params)

    def update(self, grads, state, params):
        return self._update(grads, state, params)

    def __call__(self, *args, **kwargs):
        # curried re-parameterization: adam()(learning_rate=...) etc.
        return self

    def __repr__(self):
        return f"Optimizer({self.name}, {self.hyper})"


def _curried(fn):
    @functools.wraps(fn)
    def wrapper(loss_or_grads=None, params=None, *args, **kwargs):
        if loss_or_grads is None and params is None:
            return fn(*args, **kwargs)
        opt = fn(*args, **kwargs)
        # Theano-style immediate application is not supported in the
        # functional build; return the optimizer itself.
        return opt
    return wrapper


@_curried
def sgd(learning_rate=1e-3):
    """Stochastic gradient descent (cf. ``updates.py:184``)."""
    lr = learning_rate

    def init(p):
        return ()

    def update(g, s, p):
        return jax.tree_util.tree_map(lambda p_, g_: p_ - lr * g_, p, g), s
    return Optimizer("sgd", init, update, learning_rate=lr)


@_curried
def momentum(learning_rate=1e-3, momentum=0.9):
    """SGD with momentum (cf. ``updates.py:286``)."""
    lr, mom = learning_rate, momentum

    def init(p):
        return jax.tree_util.tree_map(jnp.zeros_like, p)

    def update(g, v, p):
        v_new = jax.tree_util.tree_map(
            lambda v_, g_: mom * v_ - lr * g_, v, g)
        p_new = jax.tree_util.tree_map(lambda p_, v_: p_ + v_, p, v_new)
        return p_new, v_new
    return Optimizer("momentum", init, update, learning_rate=lr,
                     momentum=mom)


@_curried
def nesterov_momentum(learning_rate=1e-3, momentum=0.9):
    """Nesterov momentum (cf. ``updates.py:402``)."""
    lr, mom = learning_rate, momentum

    def init(p):
        return jax.tree_util.tree_map(jnp.zeros_like, p)

    def update(g, v, p):
        v_new = jax.tree_util.tree_map(
            lambda v_, g_: mom * v_ - lr * g_, v, g)
        p_new = jax.tree_util.tree_map(
            lambda p_, v_, vn: p_ + mom * vn - lr * v_, p, g, v_new)
        return p_new, v_new
    return Optimizer("nesterov_momentum", init, update, learning_rate=lr,
                     momentum=mom)


def apply_momentum(opt_or_lr=None, momentum_=0.9, **kwargs):
    """Wrap plain-SGD updates with momentum (cf. ``updates.py:229``
    ``apply_momentum(updates, params, momentum)``). In the functional build
    this simply returns a momentum optimizer at the given rate."""
    lr = kwargs.pop("learning_rate", None)
    if lr is None and not isinstance(opt_or_lr, Optimizer):
        lr = opt_or_lr if opt_or_lr is not None else 1e-3
    elif isinstance(opt_or_lr, Optimizer):
        lr = opt_or_lr.hyper.get("learning_rate", 1e-3)
    return momentum(learning_rate=lr, momentum=momentum_)


def apply_nesterov_momentum(opt_or_lr=None, momentum_=0.9, **kwargs):
    """Nesterov variant of :func:`apply_momentum` (cf. ``updates.py:345``)."""
    lr = kwargs.pop("learning_rate", None)
    if lr is None and not isinstance(opt_or_lr, Optimizer):
        lr = opt_or_lr if opt_or_lr is not None else 1e-3
    elif isinstance(opt_or_lr, Optimizer):
        lr = opt_or_lr.hyper.get("learning_rate", 1e-3)
    return nesterov_momentum(learning_rate=lr, momentum=momentum_)


@_curried
def adagrad(learning_rate=1.0, epsilon=1e-6):
    """Adagrad (cf. ``updates.py:469``)."""
    lr, eps = learning_rate, epsilon

    def init(p):
        return jax.tree_util.tree_map(jnp.zeros_like, p)

    def update(g, acc, p):
        acc_new = jax.tree_util.tree_map(
            lambda a, g_: a + g_ ** 2, acc, g)
        p_new = jax.tree_util.tree_map(
            lambda p_, g_, a: p_ - lr * g_ / jnp.sqrt(a + eps), p, g, acc_new)
        return p_new, acc_new
    return Optimizer("adagrad", init, update, learning_rate=lr)


@_curried
def adagrad_window(learning_rate=0.001, epsilon=0.1, n_win=10):
    """Windowed Adagrad — the reference's **default** VI optimizer
    (cf. ``updates.py:549``): accumulates squared grads over a rolling
    window of ``n_win`` steps."""
    lr, eps = learning_rate, epsilon

    class WState(NamedTuple):
        hist: object   # pytree of (n_win, *shape)
        t: jnp.ndarray

    def init(p):
        hist = jax.tree_util.tree_map(
            lambda x: jnp.zeros((n_win,) + x.shape, x.dtype), p)
        return WState(hist, jnp.asarray(0, jnp.int32))

    def update(g, s, p):
        slot = s.t % n_win
        hist = jax.tree_util.tree_map(
            lambda h, g_: h.at[slot].set(g_ ** 2), s.hist, g)
        p_new = jax.tree_util.tree_map(
            lambda p_, g_, h: p_ - lr * g_ / jnp.sqrt(
                jnp.sum(h, axis=0) + eps),
            p, g, hist)
        return p_new, WState(hist, s.t + 1)
    return Optimizer("adagrad_window", init, update, learning_rate=lr,
                     n_win=n_win)


@_curried
def rmsprop(learning_rate=1.0, rho=0.9, epsilon=1e-6):
    """RMSProp (cf. ``updates.py:597``)."""
    lr, eps = learning_rate, epsilon

    def init(p):
        return jax.tree_util.tree_map(jnp.zeros_like, p)

    def update(g, acc, p):
        acc_new = jax.tree_util.tree_map(
            lambda a, g_: rho * a + (1 - rho) * g_ ** 2, acc, g)
        p_new = jax.tree_util.tree_map(
            lambda p_, g_, a: p_ - lr * g_ / jnp.sqrt(a + eps), p, g, acc_new)
        return p_new, acc_new
    return Optimizer("rmsprop", init, update, learning_rate=lr, rho=rho)


@_curried
def adadelta(learning_rate=1.0, rho=0.95, epsilon=1e-6):
    """Adadelta (cf. ``updates.py:682``)."""
    lr, eps = learning_rate, epsilon

    def init(p):
        z = jax.tree_util.tree_map(jnp.zeros_like, p)
        return (z, jax.tree_util.tree_map(jnp.zeros_like, p))

    def update(g, s, p):
        acc, delta_acc = s
        acc_new = jax.tree_util.tree_map(
            lambda a, g_: rho * a + (1 - rho) * g_ ** 2, acc, g)
        upd = jax.tree_util.tree_map(
            lambda g_, a, d: g_ * jnp.sqrt(d + eps) / jnp.sqrt(a + eps),
            g, acc_new, delta_acc)
        p_new = jax.tree_util.tree_map(
            lambda p_, u: p_ - lr * u, p, upd)
        delta_new = jax.tree_util.tree_map(
            lambda d, u: rho * d + (1 - rho) * u ** 2, delta_acc, upd)
        return p_new, (acc_new, delta_new)
    return Optimizer("adadelta", init, update, learning_rate=lr, rho=rho)


@_curried
def adam(learning_rate=0.001, beta1=0.9, beta2=0.999, epsilon=1e-8):
    """Adam (cf. ``updates.py:789``)."""
    lr, b1, b2, eps = learning_rate, beta1, beta2, epsilon

    def init(p):
        z = jax.tree_util.tree_map(jnp.zeros_like, p)
        return (z, jax.tree_util.tree_map(jnp.zeros_like, p),
                jnp.asarray(0, jnp.int32))

    def update(g, s, p):
        m, v, t = s
        t = t + 1
        m = jax.tree_util.tree_map(
            lambda m_, g_: b1 * m_ + (1 - b1) * g_, m, g)
        v = jax.tree_util.tree_map(
            lambda v_, g_: b2 * v_ + (1 - b2) * g_ ** 2, v, g)
        tf = t.astype(floatX())
        a_t = lr * jnp.sqrt(1 - b2 ** tf) / (1 - b1 ** tf)
        p_new = jax.tree_util.tree_map(
            lambda p_, m_, v_: p_ - a_t * m_ / (jnp.sqrt(v_) + eps), p, m, v)
        return p_new, (m, v, t)
    return Optimizer("adam", init, update, learning_rate=lr)


@_curried
def adamax(learning_rate=0.002, beta1=0.9, beta2=0.999, epsilon=1e-8):
    """Adamax (cf. ``updates.py:878``)."""
    lr, b1, b2, eps = learning_rate, beta1, beta2, epsilon

    def init(p):
        z = jax.tree_util.tree_map(jnp.zeros_like, p)
        return (z, jax.tree_util.tree_map(jnp.zeros_like, p),
                jnp.asarray(0, jnp.int32))

    def update(g, s, p):
        m, u, t = s
        t = t + 1
        m = jax.tree_util.tree_map(
            lambda m_, g_: b1 * m_ + (1 - b1) * g_, m, g)
        u = jax.tree_util.tree_map(
            lambda u_, g_: jnp.maximum(b2 * u_, jnp.abs(g_)), u, g)
        tf = t.astype(floatX())
        a_t = lr / (1 - b1 ** tf)
        p_new = jax.tree_util.tree_map(
            lambda p_, m_, u_: p_ - a_t * m_ / (u_ + eps), p, m, u)
        return p_new, (m, u, t)
    return Optimizer("adamax", init, update, learning_rate=lr)


def norm_constraint(tensor_var, max_norm, norm_axes=None, epsilon=1e-7):
    """Rescale so norms along ``norm_axes`` are <= max_norm
    (cf. ``updates.py:964``)."""
    x = jnp.asarray(tensor_var)
    if norm_axes is not None:
        sum_over = tuple(norm_axes)
    elif x.ndim == 2:
        sum_over = (0,)
    elif x.ndim in (3, 4, 5):
        sum_over = tuple(range(1, x.ndim))
    else:
        sum_over = (0,)
    dtype = x.dtype
    norms = jnp.sqrt(jnp.sum(x ** 2, axis=sum_over, keepdims=True))
    target = jnp.clip(norms, 0, max_norm)
    return x * (target / (epsilon + norms)).astype(dtype)


def total_norm_constraint(tensor_vars, max_norm, epsilon=1e-7,
                          return_norm=False):
    """Rescale a list by their joint norm (cf. ``updates.py:1044``)."""
    norm = jnp.sqrt(sum(jnp.sum(jnp.asarray(t) ** 2) for t in tensor_vars))
    dtype = jnp.asarray(tensor_vars[0]).dtype
    target = jnp.clip(norm, 0, max_norm)
    multiplier = (target / (epsilon + norm)).astype(dtype)
    out = [jnp.asarray(t) * multiplier for t in tensor_vars]
    if return_norm:
        return out, norm
    return out


def get_optimizer(obj, **kwargs):
    """Normalize user input to an Optimizer."""
    if isinstance(obj, Optimizer):
        return obj
    if callable(obj):
        out = obj(**kwargs) if kwargs else obj()
        if isinstance(out, Optimizer):
            return out
    if isinstance(obj, str):
        table = {
            "sgd": sgd, "momentum": momentum,
            "nesterov_momentum": nesterov_momentum, "adagrad": adagrad,
            "adagrad_window": adagrad_window, "rmsprop": rmsprop,
            "adadelta": adadelta, "adam": adam, "adamax": adamax,
        }
        return table[obj](**kwargs)
    raise TypeError(f"Cannot interpret optimizer {obj!r}")
