"""Operator Variational Inference core (cf. ``pymc3/variational/opvi.py``).

The reference's OPVI stack (``ObjectiveFunction``/``Operator``/``Group``/
``Approximation``, ``opvi.py:162-1672``) compiles symbolic Theano update
graphs. Here an :class:`Approximation` is a *pure parametric sampler* over
the model's flat unconstrained space:

    ``sample_q(key, params, size) -> (z (size, n), logq (size,))``

The ELBO (or any operator objective) is a Monte-Carlo estimate traced by JAX;
one optimizer step is ``jax.value_and_grad`` + a functional update rule, and
``fit`` runs the whole loop as a jitted ``lax.scan`` — thousands of VI steps
per host call (cf. SURVEY §3.3 hot loop).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..blocking import ArrayOrdering
from ..config import floatX
from ..model import modelcontext
from .updates import Optimizer, adagrad_window, get_optimizer

__all__ = ["Approximation", "Group", "Operator", "ObjectiveFunction",
           "TestFunction", "node_property"]


def node_property(f):
    """API-parity shim for the reference decorator (``opvi.py:120``)."""
    return property(f)


class TestFunction:
    """cf. ``opvi.py:483``."""

    def __init__(self):
        self._inited = False

    def setup(self, approx):
        pass

    @classmethod
    def from_function(cls, f):
        obj = TestFunction()
        obj.__call__ = f
        return obj


class Group:
    """Variational family over a subset of variables (cf. ``opvi.py:507``).

    In this build a group owns a contiguous index set into the model's flat
    unconstrained vector. The default (``None``) group spans all free RVs.
    """

    # overridden by families
    has_logq = True
    supports_batched = False
    short_name = ""

    def __init__(self, group=None, vfam=None, params=None, model=None,
                 local=False, rowwise=False, options=None, **kwargs):
        model = modelcontext(model)
        self.model = model
        self.local = bool(local)
        self.rowwise = bool(rowwise)
        if self.local and params is None:
            raise ValueError(
                "Local (AEVB) groups need user-provided params "
                "(cf. reference opvi.py:507: local groups take their "
                "variational parameters from the user/encoder)")
        if group is None:
            if self.local:
                raise ValueError("Local groups must name their variables")
            self.group_vars = model.free_RVs
        else:
            def _resolve(v):
                # never use `or` here: Nodes raise on __bool__
                tr = getattr(v, "transformed", None)
                return v if tr is None else tr
            group_vars = [_resolve(v) for v in group]
            group_vars = [model.named_vars.get(getattr(v, "name", v), v)
                          for v in group_vars]
            self.group_vars = [_resolve(v) for v in group_vars]
        self.ordering = ArrayOrdering(self.group_vars)
        self.ndim = self.ordering.size
        glob = model.ordering
        idx = []
        scale = []
        for vm in self.ordering.vmap:
            g = glob.by_name[vm.var]
            idx.extend(range(g.slc.start, g.slc.stop))
            rv_scaling = float(getattr(
                model.named_vars.get(vm.var), "scaling", 1.0) or 1.0)
            scale.extend([rv_scaling] * (g.slc.stop - g.slc.start))
        self.q_indices = np.asarray(idx, dtype=np.int32)
        # per-element minibatch logq scaling (cf. reference symbolic_logq,
        # opvi.py:1180: local-group logq is scaled like the model logp term)
        self.scale_vec = np.asarray(scale, dtype=floatX())
        self.user_params = params

    # family interface -------------------------------------------------------
    def init_params(self, start=None) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def sample_q(self, key, params, size):
        """Return (z (size, ndim), logq (size,)). Reparameterized."""
        raise NotImplementedError

    def mean(self, params):
        raise NotImplementedError

    def std(self, params):
        raise NotImplementedError


class Operator:
    """Base operator class (cf. ``opvi.py:376``)."""

    has_test_function = False
    returns_loss = True
    require_logq = True
    objective_class = None  # set below

    def __init__(self, approx):
        self.approx = approx
        if self.require_logq and not approx.has_logq:
            raise ValueError(
                f"{self} requires logq, but {approx} does not provide it")

    @property
    def model(self):
        return self.approx.model

    def apply(self, f):
        """Return the per-sample objective fn(z, logq) -> scalar."""
        raise NotImplementedError

    def __call__(self, f=None):
        if self.has_test_function:
            if f is None:
                raise ValueError(f"Operator {self} requires TestFunction")
        return self.objective_class(self, f)

    def __repr__(self):
        return type(self).__name__


class ObjectiveFunction:
    """MC objective + fused update step (cf. ``opvi.py:162``)."""

    def __init__(self, op: Operator, tf: Optional[TestFunction] = None):
        self.op = op
        self.tf = tf

    @property
    def approx(self):
        return self.op.approx

    def loss_fn(self, nmc):
        approx = self.approx
        per_sample = self.op.apply(self.tf)

        def loss(params, key):
            k_q, k_mb = jax.random.split(key)
            mb_keys = jax.random.split(k_mb, nmc)
            # the SAME per-sample minibatch key drives both the encoder of
            # local (AEVB) groups and the model's Minibatch slicing, so the
            # amortized posterior sees exactly the rows the likelihood sees
            z, logq = approx.sample_q(k_q, params, nmc, mb_keys=mb_keys)
            vals = jax.vmap(per_sample)(z, logq, mb_keys)
            return jnp.mean(vals)
        return loss

    def step_function(self, obj_n_mc=1, obj_optimizer=None,
                      more_obj_params=None, total_grad_norm_constraint=None,
                      score=True, fn_kwargs=None):
        """Build ``(params, opt_state, key) -> (params, opt_state, loss)``
        as one jitted function (cf. ``opvi.py:277``)."""
        if obj_optimizer is None:
            obj_optimizer = adagrad_window()
        obj_optimizer = get_optimizer(obj_optimizer)
        loss = self.loss_fn(obj_n_mc)

        def step(params, opt_state, key):
            val, grads = jax.value_and_grad(loss)(params, key)
            if total_grad_norm_constraint is not None:
                leaves, treedef = jax.tree_util.tree_flatten(grads)
                from .updates import total_norm_constraint
                leaves = total_norm_constraint(leaves,
                                               total_grad_norm_constraint)
                grads = jax.tree_util.tree_unflatten(treedef, leaves)
            # guard against inf/nan steps (cf. inference.py:141-160)
            finite = jnp.isfinite(val)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite & jnp.isfinite(g), g,
                                    jnp.zeros_like(g)), grads)
            new_params, new_state = obj_optimizer.update(grads, opt_state,
                                                         params)
            return new_params, new_state, val
        return step, obj_optimizer

    def sharded_step_function(self, mesh, obj_n_mc=1, obj_optimizer=None,
                              axis_name=None):
        """Data-parallel SGD step over a device mesh (the multi-device seam
        of BASELINE config #3, cf. the reference's single-process
        ``step_function``, ``opvi.py:277``).

        Each device draws its own minibatch / MC noise from its shard of
        the key batch and computes a local ELBO gradient; gradients (and
        the reported loss) are ``pmean``'d over the mesh axis, so the
        update is identical on every device and the variational params
        stay replicated. Returns ``(step, optimizer)`` where
        ``step(params, opt_state, keys)`` takes a ``(n_devices, 2)`` key
        array sharded over the mesh."""
        import numpy as _np
        from jax.sharding import PartitionSpec as P
        from .updates import get_optimizer, adagrad_window
        if obj_optimizer is None:
            obj_optimizer = adagrad_window()
        obj_optimizer = get_optimizer(obj_optimizer)
        loss = self.loss_fn(obj_n_mc)
        axis = axis_name or mesh.axis_names[0]
        n_dev = int(_np.prod(mesh.devices.shape))

        def local(params, opt_state, keys):
            val, grads = jax.value_and_grad(loss)(params, keys[0])
            grads = jax.lax.pmean(grads, axis)
            val = jax.lax.pmean(val, axis)
            new_params, new_state = obj_optimizer.update(grads, opt_state,
                                                         params)
            return new_params, new_state, val

        sharded = jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P(), P(axis)),
            out_specs=(P(), P(), P()), check_vma=False)

        @jax.jit
        def step(params, opt_state, keys):
            if keys.shape[0] != n_dev:
                raise ValueError(
                    f"need one key per device ({n_dev}), got "
                    f"{keys.shape[0]}")
            return sharded(params, opt_state, keys)

        return step, obj_optimizer

    def __call__(self, nmc, **kwargs):
        return self.loss_fn(nmc)


Operator.objective_class = ObjectiveFunction


class Approximation:
    """Collection-of-groups approximation (cf. ``opvi.py:1229``).

    Most models use one full-space group; the class carries the fitted
    parameters and converts samples to a :class:`MultiTrace`.
    """

    def __init__(self, groups, model=None):
        model = modelcontext(model)
        self.model = model
        if not isinstance(groups, (list, tuple)):
            groups = [groups]
        self.groups = list(groups)
        # validate coverage
        covered = set()
        for g in self.groups:
            covered.update(g.q_indices.tolist())
        if len(covered) != model.ordering.size:
            raise ValueError(
                "Approximation groups must cover all free variables")
        self.params = {i: g.init_params() for i, g in enumerate(self.groups)}
        self.hist = np.asarray([])
        self._seed_counter = 0

    @property
    def has_logq(self):
        return all(g.has_logq for g in self.groups)

    @property
    def ndim(self):
        return self.model.ordering.size

    # -- sampling ------------------------------------------------------------
    def sample_q(self, key, params, size, mb_keys=None):
        """(z (size, ndim), logq (size,)) across all groups.

        ``mb_keys`` (size, 2): per-sample minibatch PRNG keys forwarded to
        local (AEVB) groups so their encoders slice the same minibatch rows
        as the model logp."""
        n = self.ndim
        z = jnp.zeros((size, n), floatX())
        logq = jnp.zeros((size,), floatX())
        keys = jax.random.split(key, len(self.groups))
        for i, g in enumerate(self.groups):
            if getattr(g, "local", False):
                zi, lqi = g.sample_q(keys[i], params[i], size,
                                     mb_keys=mb_keys)
            else:
                zi, lqi = g.sample_q(keys[i], params[i], size)
            z = z.at[:, jnp.asarray(g.q_indices)].set(zi)
            logq = logq + lqi
        return z, logq

    def logq_fn(self, params):
        def logq(z):
            total = jnp.asarray(0.0, floatX())
            for i, g in enumerate(self.groups):
                total = total + g.logq(params[i],
                                       z[jnp.asarray(g.q_indices)])
            return total
        return logq

    # -- moments -------------------------------------------------------------
    @property
    def mean(self) -> np.ndarray:
        out = np.zeros(self.ndim, dtype=floatX())
        for i, g in enumerate(self.groups):
            out[g.q_indices] = np.asarray(g.mean(self.params[i]))
        return out

    @property
    def std(self) -> np.ndarray:
        out = np.zeros(self.ndim, dtype=floatX())
        for i, g in enumerate(self.groups):
            out[g.q_indices] = np.asarray(g.std(self.params[i]))
        return out

    @property
    def cov(self) -> np.ndarray:
        cov = np.zeros((self.ndim, self.ndim), dtype=floatX())
        for i, g in enumerate(self.groups):
            gc = g.cov(self.params[i]) if hasattr(g, "cov") else \
                np.diag(np.asarray(g.std(self.params[i])) ** 2)
            cov[np.ix_(g.q_indices, g.q_indices)] = np.asarray(gc)
        return cov

    # -- conversion ----------------------------------------------------------
    def _next_key(self, random_seed=None):
        if random_seed is None:
            random_seed = np.random.randint(0, 2**31 - 1)
        return jax.random.PRNGKey(int(random_seed))

    def sample(self, draws=500, include_transformed=True, random_seed=None):
        """Draw posterior samples as a MultiTrace (cf. ``opvi.py:1587``)."""
        from ..backends.ndarray import NDArray
        from ..backends.base import MultiTrace
        key = self._next_key(random_seed)
        z, _ = jax.jit(lambda k: self.sample_q(
            k, self.params, draws))(key)
        z = np.asarray(z)
        model = self.model

        # decode flat draws to named values (incl. views + deterministics)
        unobserved = model.unobserved_RVs
        from ..node import _ev

        @jax.jit
        def decode(q):
            env = model._env_from_q(q)
            memo = {}
            return [jnp.asarray(_ev(v, env, memo)) for v in unobserved]

        vals = jax.vmap(decode)(jnp.asarray(z))
        varnames = [v.name for v in unobserved]
        strace = NDArray(model=model, vars=unobserved)
        strace.setup(draws, 0)
        strace.record_batch(
            {n: np.asarray(v) for n, v in zip(varnames, vals)}, draws)
        strace.close()
        return MultiTrace([strace])

    def sample_node(self, node, size=None, more_replacements=None):
        """Posterior-expectation sampling of a symbolic node
        (cf. ``opvi.py:1522``): returns a callable/array of node values under
        q-samples."""
        from ..node import _ev, as_node
        node = as_node(node)
        key = self._next_key()
        n = size or 100
        z, _ = jax.jit(lambda k: self.sample_q(k, self.params, n))(key)
        model = self.model

        def eval_one(q):
            env = model._env_from_q(q)
            return jnp.asarray(_ev(node, env, {}))
        vals = jax.vmap(eval_one)(z)
        if size is None:
            return np.asarray(vals).mean(axis=0)
        return np.asarray(vals)

    apply_replacements = sample_node

    @property
    def sample_dict_fn(self):
        def inner(draws=500):
            tr = self.sample(draws)
            return {v: tr.get_values(v) for v in tr.varnames}
        return inner

    def __repr__(self):
        names = ",".join(type(g).__name__ for g in self.groups)
        return f"<Approximation[{names}] ndim={self.ndim}>"
