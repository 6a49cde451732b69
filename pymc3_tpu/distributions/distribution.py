"""Distribution base machinery, mirroring
``pymc3/distributions/distribution.py``.

``Distribution.__new__`` registers into the ambient model exactly like the
reference (``distribution.py:46-77``); ``.dist(...)`` builds an unregistered
instance. Log-densities are pure jnp functions of (value, *params); parameters
are symbolic :class:`~pymc3_tpu.node.Node` operands resolved against an
environment at trace time, so the whole joint logp traces into one XLA
program.

Forward sampling (``random``) follows the reference's vectorized semantics:
``draw_values`` resolves parameters against a Point by evaluating the node DAG
(replacing the named-node walk of ``distribution.py:521-640``), and
``generate_samples`` reconciles ``size`` vs ``dist_shape``
(cf. ``distribution.py:869-992``).
"""
from __future__ import annotations

import contextvars
import numbers
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..config import floatX, intX, get_config
from ..node import Node, as_node, evaluate, ConstantNode
from .shape_utils import to_tuple, broadcast_dist_samples_shape

__all__ = [
    "DensityDist", "Distribution", "Continuous", "Discrete", "NoDistribution",
    "TensorType", "draw_values", "generate_samples", "TransformedDistribution",
]

vectorized_ppc = contextvars.ContextVar("vectorized_ppc", default=None)


class _Unset:
    pass


UNSET = _Unset()


def TensorType(dtype, shape, broadcastable=None):
    """Shape/dtype spec (Theano TensorType stand-in, cf. ``distribution.py:148``)."""
    return (np.dtype(dtype), tuple(shape))


class _DistMethodNode(Node):
    """Symbolic ``dist.logp(value_node)`` / ``logcdf`` result: evaluating it
    against an environment resolves both the value and the distribution's
    parameters (the reference returns a Theano expression here;
    cf. ``distribution.py:117-137``)."""

    __slots__ = ("dist", "value", "method", "_test_value", "name")

    def __init__(self, dist, value, method):
        self.dist = dist
        self.value = value
        self.method = method
        self.name = None
        raw = getattr(type(dist), method)
        self._test_value = np.asarray(raw(dist, value.test_value, {}, {}))

    def _eval(self, env, memo):
        from ..node import _ev
        raw = getattr(type(self.dist), self.method)
        return raw(self.dist, _ev(self.value, env, memo), env, memo)


class Distribution:
    """Statistical distribution base (cf. ``distribution.py:46``)."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        # dispatch symbolic values: dist.logp(node) -> node
        for method in ("logp", "logcdf"):
            raw = cls.__dict__.get(method)
            if raw is None:
                continue

            def wrapped(self, value, env=None, memo=None, _raw=raw,
                        _name=method):
                if isinstance(value, Node) and env is None:
                    return _DistMethodNode(self, value, _name)
                return _raw(self, value, env, memo)

            wrapped.__name__ = method
            wrapped.__doc__ = raw.__doc__
            setattr(cls, method, wrapped)

    def __new__(cls, name, *args, **kwargs):
        from ..model import Model

        try:
            model = Model.get_context()
        except TypeError:
            raise TypeError(
                "No model on context stack, which is needed to instantiate "
                "distributions. Add variable inside a 'with model:' block, or "
                "use the '.dist' syntax for a standalone distribution."
            )

        if not isinstance(name, str):
            raise TypeError(f"Name needs to be a string but got: {name}")

        data = kwargs.pop("observed", None)
        total_size = kwargs.pop("total_size", None)
        dims = kwargs.pop("dims", None)
        if isinstance(data, Distribution):
            raise TypeError(
                "An observed variable cannot be a distribution instance."
            )
        dist = cls.dist(*args, **kwargs)
        return model.Var(name, dist, data=data, total_size=total_size, dims=dims)

    @classmethod
    def dist(cls, *args, **kwargs):
        dist = object.__new__(cls)
        dist.__init__(*args, **kwargs)
        return dist

    def __init__(self, shape=(), dtype=None, testval=None, defaults=(),
                 transform=None, broadcastable=None):
        self.shape = to_tuple(shape)
        self.dtype = np.dtype(dtype if dtype is not None else floatX())
        self.testval = testval
        self.defaults = tuple(defaults)
        self.transform = transform

    # -- parameter plumbing --------------------------------------------------
    def _infer_shape(self, shape, *param_nodes):
        """shape kwarg wins; else broadcast of parameter test shapes."""
        if shape is not None:
            return to_tuple(shape)
        shapes = [tuple(np.shape(p.test_value)) for p in param_nodes
                  if p is not None]
        if not shapes:
            return ()
        out = np.broadcast_shapes(*shapes)
        return tuple(out)

    def param_nodes(self) -> Dict[str, Node]:
        """Named symbolic parameters of this distribution."""
        out = {}
        for k, v in self.__dict__.items():
            if isinstance(v, Node):
                out[k] = v
        return out

    def _ev_params(self, names, env, memo):
        return [evaluate(getattr(self, n), env, memo) for n in names]

    # -- densities -----------------------------------------------------------
    def logp(self, value, env: Optional[Dict] = None, memo: Optional[Dict] = None):
        """Elementwise log-density at ``value`` (traceable)."""
        raise NotImplementedError

    def logp_sum(self, value, env=None, memo=None):
        """Summed log-density (cf. ``distribution.py:137``)."""
        out = self.logp(value, env, memo)
        if isinstance(out, Node):
            from ..node import apply as node_apply
            return node_apply(jnp.sum, out)
        return jnp.sum(out)

    def logp_nojac(self, value, env=None, memo=None):
        """logp without transform jacobian (cf. ``distribution.py:123``) —
        jacobians are accounted for at the model level in this build, so this
        is an alias."""
        return self.logp(value, env, memo)

    def logcdf(self, value, env=None, memo=None):
        raise NotImplementedError(
            f"logcdf not implemented for {type(self).__name__}")

    # -- testval machinery (cf. distribution.py:90-117) ----------------------
    def default(self):
        return np.asarray(self.get_test_val(self.testval, self.defaults),
                          dtype=self.dtype)

    def get_test_val(self, val, defaults):
        if val is None:
            for v in defaults:
                attr = getattr(self, v, None)
                if attr is not None and np.all(np.isfinite(self.getattr_value(attr))):
                    return self.getattr_value(attr)
            raise AttributeError(
                f"{self} has no finite default value to use, checked: {defaults}."
                " Pass testval argument or adjust so value is finite."
            )
        return self.getattr_value(val)

    def getattr_value(self, val):
        if isinstance(val, str):
            val = getattr(self, val)
        if isinstance(val, Node):
            val = val.test_value
        return np.broadcast_to(np.asarray(val), self.shape) if self.shape else np.asarray(val)

    # -- forward sampling ----------------------------------------------------
    def random(self, point=None, size=None):
        raise NotImplementedError(
            f"random() not implemented for {type(self).__name__}")

    def _distr_parameters_for_repr(self):
        return [k for k in self.param_nodes()]

    def __str__(self):
        return f"{type(self).__name__}"

    __repr__ = __str__

    def _repr_latex_(self, name=None, dist=None):
        return f"$\\text{{{name or ''}}} \\sim \\text{{{type(self).__name__}}}$"


class NoDistribution(Distribution):
    """Distribution with no density — imputation placeholders and simulators
    (cf. ``distribution.py:154``)."""

    def __init__(self, shape, dtype, testval=None, defaults=(), parent_dist=None,
                 *args, **kwargs):
        super().__init__(shape=shape, dtype=dtype, testval=testval,
                         defaults=defaults, *args, **kwargs)
        self.parent_dist = parent_dist

    def __getattr__(self, name):
        # delegate unknown attributes to the parent distribution
        if name in ("parent_dist", "__getstate__", "__setstate__"):
            raise AttributeError(name)
        pd = self.__dict__.get("parent_dist")
        if pd is not None:
            return getattr(pd, name)
        raise AttributeError(name)

    def logp(self, value, env=None, memo=None):
        return jnp.zeros_like(jnp.asarray(value, dtype=floatX()))


class Discrete(Distribution):
    """Base for discrete distributions (cf. ``distribution.py:185``)."""

    def __init__(self, shape=(), dtype=None, defaults=("mode",), *args, **kwargs):
        if dtype is None:
            dtype = intX()
        super().__init__(shape=shape, dtype=dtype, defaults=defaults,
                         *args, **kwargs)


class Continuous(Distribution):
    """Base for continuous distributions (cf. ``distribution.py:205``)."""

    def __init__(self, shape=(), dtype=None, defaults=("median", "mean", "mode"),
                 *args, **kwargs):
        if dtype is None:
            dtype = floatX()
        super().__init__(shape=shape, dtype=dtype, defaults=defaults,
                         *args, **kwargs)


class DensityDist(Distribution):
    """Distribution from a user-supplied log-density (cf. ``distribution.py:215``).

    ``logp`` must be a callable taking jnp arrays (the value, plus any keyword
    parameters captured by closure) and returning the elementwise log density.
    """

    def __init__(self, logp, shape=(), dtype=None, testval=0, random=None,
                 wrap_random_with_dist_shape=True, check_shape_in_random=True,
                 *args, **kwargs):
        if dtype is None:
            dtype = floatX()
        super().__init__(shape=shape, dtype=dtype, testval=testval,
                         *args, **kwargs)
        self._logp_fn = logp
        self.rand = random
        self.wrap_random_with_dist_shape = wrap_random_with_dist_shape
        self.check_shape_in_random = check_shape_in_random

    def logp(self, value, env=None, memo=None):
        out = self._logp_fn(jnp.asarray(value))
        if isinstance(out, Node):
            out = evaluate(out, env or {}, memo)
        return out

    def random(self, point=None, size=None):
        if self.rand is None:
            raise ValueError(
                "Distribution was not passed any random method. Define a "
                "custom random method and pass it as kwarg random")
        return self.rand(point=point, size=size)


class TransformedDistribution(Distribution):
    """A distribution pushed through a transform (cf. ``distribution...
    transforms.py:137``). In this build transforms are applied at the model
    level; this class exists for `.apply` API-compat and for free-standing
    use."""

    @classmethod
    def dist(cls, dist, transform):
        obj = object.__new__(cls)
        obj.dist_ = dist
        obj.transform_used = transform
        obj.shape = transform.forward_shape(dist.shape)
        obj.dtype = dist.dtype
        obj.testval = None
        obj.defaults = ()
        obj.transform = None
        return obj

    def logp(self, value, env=None, memo=None):
        x = self.transform_used.backward(jnp.asarray(value))
        return self.dist_.logp(x, env, memo) + self.transform_used.jacobian_det(
            jnp.asarray(value))


def draw_values(params: Sequence[Any], point: Optional[Dict] = None, size=None):
    """Draw (non-random) values for each param given a Point.

    Replaces the reference's named-node DAG interpreter
    (``distribution.py:521-640``): parameters here *are* the DAG, so we simply
    evaluate them against the point. Free RVs missing from the point fall back
    to prior draws (matching ``_draw_value``, ``distribution.py:772-867``).
    """
    env = dict(point or {})
    out = []
    for p in params:
        if isinstance(p, Node):
            out.append(np.asarray(evaluate(p, env)))
        elif isinstance(p, numbers.Number) or isinstance(p, np.ndarray):
            out.append(np.asarray(p))
        elif isinstance(p, (list, tuple)):
            out.append(np.asarray(p))
        elif isinstance(p, Distribution):
            out.append(np.asarray(p.random(point=point, size=size)))
        else:
            out.append(np.asarray(p))
    return out


def generate_samples(generator, *args, **kwargs):
    """Vectorized forward draws with pymc3 size/dist_shape reconciliation
    (cf. ``distribution.py:869-992``).

    ``generator(*args, size=shape, **kwargs)`` must be a numpy-style sampler
    (e.g. ``np.random.Generator`` method or ``scipy.stats`` ``rvs``).
    """
    dist_shape = to_tuple(kwargs.pop("dist_shape", ()))
    size = kwargs.pop("size", None)
    broadcast_shape = kwargs.pop("broadcast_shape", None)
    not_broadcast_kwargs = kwargs.pop("not_broadcast_kwargs", None) or {}

    args = [np.asarray(a) for a in args]
    if broadcast_shape is None:
        try:
            broadcast_shape = np.broadcast_shapes(
                *[np.shape(a) for a in args]) if args else ()
        except ValueError:
            broadcast_shape = dist_shape

    size_tup = to_tuple(size) if size is not None else ()

    # target core shape: dist_shape wins, else the params' broadcast shape
    core = tuple(dist_shape) if dist_shape else tuple(broadcast_shape)

    # numpy samplers broadcast parameters against `size` themselves; we only
    # need the final size + core target
    out_shape = size_tup + core
    samples = generator(*args, size=out_shape if out_shape else None,
                        **not_broadcast_kwargs, **kwargs)
    samples = np.asarray(samples)
    if size is None and samples.shape == (1,) + core:
        samples = samples.reshape(core)
    return samples
