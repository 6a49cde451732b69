"""Mixture distributions, mirroring ``pymc3/distributions/mixture.py``
(636 LoC)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.special as jss

from ..config import floatX, intX
from ..node import Node, as_node, apply, evaluate
from .dist_math import bound
from .distribution import (
    Distribution, Discrete, Continuous, draw_values, generate_samples,
)
from .continuous import get_tau_sigma, Normal

__all__ = ["Mixture", "NormalMixture"]


def _an(x):
    return x if isinstance(x, Node) else as_node(floatX(np.asarray(x)))


def all_discrete(comp_dists):
    if isinstance(comp_dists, Distribution):
        return isinstance(comp_dists, Discrete)
    return all(isinstance(c, Discrete) for c in comp_dists)


class Mixture(Distribution):
    r"""Finite mixture (cf. ``mixture.py:42``).

    ``comp_dists`` is either an iterable of ``.dist()`` instances or a single
    distribution whose *last* batch axis indexes components.
    """

    def __init__(self, w, comp_dists, *args, **kwargs):
        self.w = _an(w)
        self.comp_dists = comp_dists
        defaults = kwargs.pop("defaults", [])
        if all_discrete(comp_dists):
            default_dtype = intX()
        else:
            default_dtype = floatX()
            try:
                self.mean = apply(
                    lambda w, *means: jnp.sum(
                        w * jnp.stack(jnp.broadcast_arrays(*means), axis=-1),
                        axis=-1) if len(means) > 1 else
                    jnp.sum(w * means[0], axis=-1),
                    self.w, *self._comp_means())
                if "mean" not in defaults:
                    defaults.append("mean")
            except (AttributeError, ValueError):
                pass
        dtype = kwargs.pop("dtype", default_dtype)
        try:
            comp_modes = self._comp_modes()

            def _mode(w, *modes):
                if len(modes) > 1:
                    stacked = jnp.stack(jnp.broadcast_arrays(
                        *[jnp.asarray(m, dtype=floatX()) for m in modes]),
                        axis=-1)
                else:
                    stacked = jnp.asarray(modes[0], dtype=floatX())
                bshape = jnp.broadcast_shapes(stacked.shape, jnp.shape(w))
                stacked = jnp.broadcast_to(stacked, bshape)
                idx = jnp.argmax(jnp.broadcast_to(w, bshape), axis=-1,
                                 keepdims=True)
                return jnp.take_along_axis(stacked, idx, axis=-1)[..., 0] \
                    .astype(dtype)

            self.mode = apply(_mode, self.w, *comp_modes)
            if "mode" not in defaults:
                defaults.append("mode")
        except (AttributeError, ValueError, NotImplementedError):
            pass
        super().__init__(dtype=dtype, defaults=defaults, *args, **kwargs)

    def _comp_means(self):
        if isinstance(self.comp_dists, Distribution):
            return [self.comp_dists.mean]
        return [d.mean for d in self.comp_dists]

    def _comp_modes(self):
        if isinstance(self.comp_dists, Distribution):
            return [self.comp_dists.mode]
        return [d.mode for d in self.comp_dists]

    def _comp_logp(self, value, env, memo):
        """Stacked component logp with trailing component axis
        (cf. ``mixture.py:241`` ``_comp_logp``)."""
        value = jnp.asarray(value)
        if isinstance(self.comp_dists, Distribution):
            # batched component dist: broadcast value against component axis
            return self.comp_dists.logp(value[..., None], env, memo)
        logps = [d.logp(value, env, memo) for d in self.comp_dists]
        return jnp.stack(jnp.broadcast_arrays(*[jnp.asarray(l) for l in logps]),
                         axis=-1)

    def logp(self, value, env=None, memo=None):
        env = env or {}
        memo = {} if memo is None else memo
        w = evaluate(self.w, env, memo)
        comp_logp = self._comp_logp(value, env, memo)
        w_ok = (jnp.all(w >= 0) & jnp.all(w <= 1)
                & jnp.all(jnp.abs(jnp.sum(w, axis=-1) - 1.0) < 1e-4))
        out = jss.logsumexp(jnp.log(jnp.where(w > 0, w, 1e-30)) + comp_logp,
                            axis=-1)
        return jnp.where(w_ok, out, -jnp.inf)

    def random(self, point=None, size=None):
        w, = draw_values([self.w], point=point, size=size)
        w = np.asarray(w)
        size_t = () if size is None else (
            (size,) if isinstance(size, int) else tuple(size))
        shape = size_t + tuple(self.shape)
        n = int(np.prod(shape, dtype=int)) if shape else 1
        K = w.shape[-1]
        p = w / w.sum(axis=-1, keepdims=True)
        if p.ndim == 1:
            comps = np.random.choice(K, p=p, size=n)
        else:
            flat_p = np.broadcast_to(p, (n, K)).reshape(n, K) \
                if p.reshape(-1, K).shape[0] != n else p.reshape(-1, K)
            comps = np.array([np.random.choice(K, p=pi / pi.sum())
                              for pi in flat_p])
        if isinstance(self.comp_dists, Distribution):
            full = np.asarray(self.comp_dists.random(point=point, size=n))
            full = full.reshape(n, -1)[:, :K] if full.ndim > 1 else \
                np.broadcast_to(full, (n, K))
            draws = full[np.arange(n), comps]
        else:
            samples = [np.asarray(d.random(point=point, size=n)).reshape(n, -1)[:, 0]
                       for d in self.comp_dists]
            samples = np.stack(samples, axis=-1)
            draws = samples[np.arange(n), comps]
        return draws.reshape(shape) if shape else draws[0]


class NormalMixture(Mixture):
    r"""Mixture of normals (cf. ``mixture.py:578``)."""

    def __init__(self, w, mu, sigma=None, tau=None, sd=None, comp_shape=(),
                 *args, **kwargs):
        if sd is not None:
            sigma = sd
        _, sigma_node = get_tau_sigma(tau=tau, sigma=sigma)
        self.mu = _an(mu)
        self.sigma = self.sd = sigma_node
        super().__init__(w, Normal.dist(mu=mu, sigma=sigma_node,
                                        shape=comp_shape),
                         *args, **kwargs)
