"""Step-method framework (cf. ``pymc3/step_methods/arraystep.py``).

The reference's ``BlockedStep``/``ArrayStep`` operate on numpy Points, one
draw at a time, inside per-chain worker processes. Here the same classes are
thin wrappers around pure JAX kernels: each stepper owns an index set into
the flat unconstrained vector ``q`` and exposes

    ``kernel_init(q0) -> state``            (pytree of jnp arrays)
    ``kernel_step(key, q, state, tctx) -> (q, state, stats)``

The host-side ``step(point)`` API (used for debugging and API parity) calls
the jitted kernel once; the fast path (``pymc3_tpu/sampling.py``) fuses the
kernels of a :class:`~pymc3_tpu.step_methods.compound.CompoundStep` into one
``lax.scan`` program vmapped over chains.
"""
from __future__ import annotations

from enum import IntEnum, unique
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..blocking import ArrayOrdering, DictToArrayBijection
from ..config import floatX
from ..model import modelcontext

__all__ = ["ArrayStep", "ArrayStepShared", "BlockedStep", "Competence",
           "metrop_select", "TuneContext"]


@unique
class Competence(IntEnum):
    """Usability of a step method for a variable
    (cf. ``arraystep.py:28``)."""

    INCOMPATIBLE = 0
    COMPATIBLE = 1
    PREFERRED = 2
    IDEAL = 3


class TuneContext:
    """Static per-draw tuning context threaded through kernels.

    ``tune`` is a traced boolean (so one compiled program covers warmup and
    sampling); ``step_idx`` is the traced draw counter.
    """

    __slots__ = ("tune", "step_idx", "n_tune")

    def __init__(self, tune, step_idx, n_tune):
        self.tune = tune
        self.step_idx = step_idx
        self.n_tune = n_tune


class BlockedStep:
    """Base class for all steppers (cf. ``arraystep.py:42``).

    ``__new__`` splits unblocked variable lists into a CompoundStep of
    single-variable steppers, exactly like the reference.
    """

    generates_stats = False
    stats_dtypes: List[Dict[str, type]] = []
    name = "blocked"

    def __new__(cls, *args, **kwargs):
        blocked = kwargs.get("blocked")
        if blocked is None:
            # Try to look up default value from class
            blocked = getattr(cls, "default_blocked", True)
            kwargs["blocked"] = blocked

        if len(args) > 0:
            vars = args[0]
            args = args[1:]
        elif "vars" in kwargs:
            vars = kwargs.pop("vars")
        else:  # Assume all model variables
            vars = None

        if vars is not None and not isinstance(vars, (tuple, list)):
            vars = [vars]

        if vars is not None and not blocked and len(vars) > 1:
            from .compound import CompoundStep
            _kwargs = dict(kwargs)
            _kwargs["blocked"] = True
            steps = []
            for var in vars:
                step = super().__new__(cls)
                step.__init__([var], *args, **_kwargs)
                steps.append(step)
            return CompoundStep(steps)
        else:
            step = super().__new__(cls)
            step._init_args = (vars,) + tuple(args)
            step._init_kwargs = kwargs
            return step

    def __init__(self, *args, **kwargs):
        pass

    def __getnewargs_ex__(self):
        # pickling support (cf. arraystep.py:91-93)
        return self._init_args, self._init_kwargs

    @staticmethod
    def competence(var, has_grad=False):
        return Competence.INCOMPATIBLE

    def stop_tuning(self):
        if hasattr(self, "tune"):
            self.tune = False

    # -- flat-vector plumbing ------------------------------------------------
    def _setup_vars(self, vars, model):
        """Resolve the stepper's variables and their indices into the model's
        global flat vector."""
        self.model = model
        if vars is None:
            vars = model.cont_vars
        vars = [model.named_vars.get(getattr(v, "name", v), v) for v in vars]
        # map user-facing transformed views to their FreeRVs
        resolved = []
        for v in vars:
            tr = getattr(v, "transformed", None)
            resolved.append(tr if tr is not None else v)
        self.vars = resolved
        self.ordering = ArrayOrdering(resolved)
        self.dim = self.ordering.size
        global_order = model.ordering
        idx = []
        for vm in self.ordering.vmap:
            g = global_order.by_name[vm.var]
            idx.extend(range(g.slc.start, g.slc.stop))
        self.q_indices = np.asarray(idx, dtype=np.int64)
        self.bij = DictToArrayBijection(self.ordering, model.test_point)
        # True when this stepper owns a strict subset of the model's flat
        # vector — i.e. it runs inside a CompoundStep and other steppers
        # move q between its calls, invalidating any cached logp/grad.
        self.is_partial = self.dim != model.ordering.size

    def _refresh_logp(self, q, cached):
        """Current-point logp: the cached value from our own previous call
        is stale whenever another stepper has moved q (is_partial)."""
        if self.is_partial:
            return self._logp_fn(q)
        return cached

    # -- functional kernel interface -----------------------------------------
    def kernel_init(self, q0):
        """Initial kernel state for flat start vector ``q0`` (host or jnp)."""
        return ()

    def kernel_step(self, key, q, state, tctx: TuneContext):
        raise NotImplementedError

    # -- host-side single-draw API (parity with reference `step(point)`) -----
    def step(self, point):
        model = self.model
        q = jnp.asarray(model.dict_to_array(point), dtype=floatX())
        if not hasattr(self, "_host_state") or self._host_state is None:
            self._host_state = self.kernel_init(q)
            self._host_key = jax.random.PRNGKey(
                np.random.randint(0, 2**31 - 1))
            self._host_i = 0
            self._host_jit = jax.jit(
                lambda k, q, s, t, i: self.kernel_step(
                    k, q, s, TuneContext(t, i, 0)))
        self._host_key, sub = jax.random.split(self._host_key)
        tune = bool(getattr(self, "tune", True))
        q_new, self._host_state, stats = self._host_jit(
            sub, q, self._host_state, jnp.asarray(tune),
            jnp.asarray(self._host_i, dtype=jnp.int32))
        self._host_i += 1
        new_point = model.array_to_dict(np.asarray(q_new))
        for k, v in point.items():
            if k not in new_point:
                new_point[k] = v
        if self.generates_stats:
            host_stats = {k: np.asarray(v).item() if np.ndim(v) == 0
                          else np.asarray(v) for k, v in stats.items()}
            return new_point, [host_stats]
        return new_point

    def reset_tuning(self):
        self._host_state = None

    def __repr__(self):
        return f"{type(self).__name__}"


class ArrayStep(BlockedStep):
    """Stepper operating on the flat array slice (cf. ``arraystep.py:125``)."""


class ArrayStepShared(BlockedStep):
    """In the reference this is the shared-variable fast path
    (``arraystep.py:160``); with JAX everything is already closed over at
    trace time, so this is an alias kept for API parity."""


class GradientSharedStep(ArrayStepShared):
    """Stepper owning the fused logp+grad function
    (cf. ``arraystep.py:236``)."""

    def __init__(self, vars, model=None, blocked=True, dtype=None,
                 logp_dlogp_func=None, **kwargs):
        model = modelcontext(model)
        self._setup_vars(vars, model)
        self.blocked = blocked
        if logp_dlogp_func is None:
            self._logp_fn = model.make_logp_fn()
        else:
            self._logp_fn = logp_dlogp_func
        self._logp_dlogp_fn = jax.value_and_grad(self._logp_fn)


def metrop_select(mr, q, q0, key=None):
    """Perform rejection/acceptance step (cf. ``arraystep.py:272``).

    Traceable: returns ``(q_new, accepted)`` with a jax.random key.
    """
    if key is None:
        raise ValueError("metrop_select requires an explicit PRNG key")
    u = jax.random.uniform(key, ())
    accept = jnp.log(u) < mr
    q_new = jnp.where(accept, q, q0)
    return q_new, accept
