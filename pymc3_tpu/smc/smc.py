"""Sequential Monte Carlo kernel (cf. ``pymc3/smc/smc.py``).

Tempered-posterior SMC: particles live as ONE ``(draws, dim)`` device array
(the reference farms logp evaluation and mutation to an ``mp.Pool``,
``smc/smc.py:156-272``; here both are a ``vmap`` over the particle axis, and
the mutation chain is a jitted ``lax.scan``). β-bisection targets
ESS = threshold·N (``update_weights_beta``, ``smc.py:169``); systematic
resampling; independent-MH mutation with an MVN proposal built from the
particle covariance (``update_proposal``, ``smc.py:215``); scaling/n_steps
tuned to acceptance 0.234 (``tune``, ``smc.py:226``).

For multi-chip scale the particle axis shards over the mesh
(``pymc3_tpu.parallel``): weight normalization and ESS are ``psum``
reductions; resampling gathers through HBM (SURVEY §2.4 "SMC particle
parallelism").
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..model import Point, modelcontext
from ..vartypes import discrete_types

logger = logging.getLogger("pymc3_tpu")

__all__ = ["SMC"]


class SMC:
    """cf. ``smc/smc.py:42``."""

    def __init__(self, draws=1000, kernel="metropolis", n_steps=25,
                 parallel=False, start=None, cores=None, tune_steps=True,
                 p_acc_rate=0.99, threshold=0.5, epsilon=1.0, dist_func=None,
                 sum_stat=False, progressbar=False, model=None,
                 random_seed=-1, devices=None, mesh=None):
        self.draws = int(draws)
        # -- particle sharding over a device mesh (SURVEY §2.4 "SMC particle
        # parallelism"; replaces the reference's mp.Pool, smc/smc.py:156) ---
        self.sharding = None
        if mesh is None and devices is not None:
            from ..parallel import make_mesh
            mesh = make_mesh(devices, axis_name="particles")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = int(np.prod(mesh.devices.shape))
            if self.draws % n_dev != 0:
                raise ValueError(
                    f"draws ({self.draws}) must be a multiple of the device "
                    f"count ({n_dev}) for particle sharding")
            self.mesh = mesh
            self.sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        self.kernel = kernel
        self.n_steps = int(n_steps)
        self.start = start
        self.tune_steps = tune_steps
        self.p_acc_rate = p_acc_rate
        self.threshold = threshold
        self.epsilon = epsilon
        self.model = modelcontext(model)
        if random_seed != -1 and random_seed is not None:
            np.random.seed(int(random_seed))
        self._key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))

        self.beta = 0.0
        self.max_steps = n_steps
        self.proposed = self.draws * self.n_steps
        self.acc_rate = 1.0
        self.acc_per_chain = np.ones(self.draws)
        self.variables = self.model.free_RVs
        self.dimension = self.model.ordering.size
        self.scalings = np.ones(self.draws) * min(
            1, 2.38 ** 2 / self.dimension)
        self.discrete = np.concatenate([
            np.full(int(np.prod(v.unconstrained_shape, dtype=int)),
                    str(np.dtype(v.distribution.dtype)) in discrete_types)
            for v in self.variables]) if self.variables else np.array([])
        self.any_discrete = bool(self.discrete.any())
        self.all_discrete = bool(self.discrete.all())
        self.log_marginal_likelihood = 0.0

    def _split(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _shard(self, x, axis_leading=True):
        """Place a particle-leading array on the mesh (no-op single-device).

        With a sharding set, jitted vmapped particle functions run SPMD:
        XLA partitions the particle axis across devices, per-particle logp
        and mutation execute on the owning chip, and cross-device movement
        happens only at the resampling gather — the TPU-native replacement
        for the reference's ``mp.Pool.starmap`` (``smc/smc.py:156-272``)."""
        arr = jnp.asarray(x)
        if self.sharding is None:
            return arr
        return jax.device_put(arr, self.sharding)

    # -- stages (cf. smc.py:101-330) -----------------------------------------
    def initialize_population(self):
        """Draw initial particles from the prior (cf. ``smc.py:101``)."""
        model = self.model
        if self.start is not None:
            pts = self.start if isinstance(self.start, list) else \
                [self.start] * self.draws
            self.posterior = np.stack(
                [model.dict_to_array({k: p[k] for k in
                                      model.ordering.by_name})
                 for p in pts]).astype(floatX())
            return
        fwd = model.sample_forward(self.draws)
        cols = []
        for vm in model.ordering.vmap:
            cols.append(np.asarray(fwd[vm.var]).reshape(self.draws, -1))
        self.posterior = np.concatenate(cols, axis=1).astype(floatX())

    def setup_kernel(self):
        """Compile tempered logp terms (cf. ``smc.py:127``; the reference's
        ``logp_forw`` compile boundary becomes two jitted vmapped fns)."""
        model = self.model
        self.prior_logp_fn = jax.jit(jax.vmap(model.varlogpt_fn()))
        if self.kernel.lower() == "abc":
            self.likelihood_logp_fn = jax.jit(jax.vmap(
                _make_abc_loglike(model, self.epsilon)))
        else:
            self.likelihood_logp_fn = jax.jit(jax.vmap(model.datalogpt_fn()))

    def initialize_logp(self):
        """cf. ``smc.py:152`` — particle-sharded logp evaluation."""
        q = self._shard(self.posterior)
        self.prior_logp = np.asarray(self.prior_logp_fn(q), dtype=np.float64)
        self.likelihood_logp = np.asarray(self.likelihood_logp_fn(q),
                                          dtype=np.float64)

    def update_weights_beta(self):
        """Bisection for the next β targeting ESS=threshold·N and accumulate
        the marginal likelihood (cf. ``smc.py:169-197``)."""
        low_beta = old_beta = self.beta
        up_beta = 2.0
        rN = int(len(self.likelihood_logp) * self.threshold)
        ll = np.where(np.isfinite(self.likelihood_logp),
                      self.likelihood_logp, -1e300)

        while up_beta - low_beta > 1e-6:
            new_beta = (low_beta + up_beta) / 2.0
            log_weights_un = (new_beta - old_beta) * ll
            log_weights = log_weights_un - _logsumexp(log_weights_un)
            ESS = int(np.exp(-_logsumexp(log_weights * 2)))
            if ESS == rN:
                break
            elif ESS < rN:
                up_beta = new_beta
            else:
                low_beta = new_beta
        if new_beta >= 1:
            new_beta = 1
            log_weights_un = (new_beta - old_beta) * ll
            log_weights = log_weights_un - _logsumexp(log_weights_un)
        self.log_marginal_likelihood += _logsumexp(log_weights_un) - \
            np.log(len(ll))
        self.beta = new_beta
        self.weights = np.exp(log_weights)
        self.weights /= self.weights.sum()

    def resample(self):
        """Systematic resampling (cf. multinomial resampling,
        ``smc.py:201-213``)."""
        n = self.draws
        positions = (np.random.random() + np.arange(n)) / n
        cumsum = np.cumsum(self.weights)
        cumsum[-1] = 1.0
        idx = np.searchsorted(cumsum, positions)
        self.posterior = self.posterior[idx]
        self.prior_logp = self.prior_logp[idx]
        self.likelihood_logp = self.likelihood_logp[idx]
        self.acc_per_chain = self.acc_per_chain[idx]
        self.scalings = self.scalings[idx]
        self.tempered_posterior_logp = self.prior_logp + \
            self.beta * self.likelihood_logp

    def update_proposal(self):
        """MVN proposal from weighted particle covariance
        (cf. ``smc.py:215``)."""
        cov = np.cov(self.posterior, ddof=0, rowvar=0)
        cov = np.atleast_2d(cov)
        cov += 1e-6 * np.eye(cov.shape[0])
        if np.isnan(cov).any() or np.isinf(cov).any():
            raise ValueError('Sample covariances not valid! Likely "draws" is '
                             "too small!")
        self.cov = cov
        self.chol = np.linalg.cholesky(cov).astype(floatX())

    def tune(self):
        """Tune scaling and n_steps (cf. ``smc.py:226``: Stan-ish 0.234
        target via the standard log-scaling update)."""
        ave_scaling = np.exp(np.log(self.scalings.mean()) +
                             (self.acc_per_chain.mean() - 0.234))
        self.scalings = 0.5 * (
            ave_scaling + np.exp(np.log(self.scalings) +
                                 (self.acc_per_chain - 0.234)))
        if self.tune_steps:
            acc_rate = max(1.0 / self.proposed, self.acc_rate)
            self.n_steps = min(
                self.max_steps,
                max(2, int(np.log(1 - self.p_acc_rate) /
                           np.log(1 - acc_rate))))
        self.proposed = self.draws * self.n_steps

    def mutate(self):
        """Independent-MH mutation chains, one jitted scan over n_steps with
        all particles vmapped (cf. ``metrop_kernel``, ``smc.py:316``)."""
        model = self.model
        prior_fn = model.varlogpt_fn()
        like_fn = _make_abc_loglike(model, self.epsilon) \
            if self.kernel.lower() == "abc" else model.datalogpt_fn()
        beta = float(self.beta)
        chol = jnp.asarray(self.chol)
        n_steps = int(self.n_steps)
        dim = self.dimension

        def particle_chain(key, q0, scaling, pl0, ll0):
            def body(carry, _):
                q, pl, ll, accs, key = carry
                key, k1, k2 = jax.random.split(key, 3)
                delta = chol @ jax.random.normal(k1, (dim,), floatX()) \
                    * scaling
                q_prop = q + delta
                pl_p = prior_fn(q_prop)
                ll_p = like_fn(q_prop)
                new_tempered = pl_p + beta * ll_p
                old_tempered = pl + beta * ll
                mr = new_tempered - old_tempered
                mr = jnp.where(jnp.isnan(mr), -jnp.inf, mr)
                accept = jnp.log(jax.random.uniform(k2, (), floatX())) < mr
                q = jnp.where(accept, q_prop, q)
                pl = jnp.where(accept, pl_p, pl)
                ll = jnp.where(accept, ll_p, ll)
                return (q, pl, ll, accs + accept.astype(floatX()), key), None

            (q, pl, ll, accs, _), _ = jax.lax.scan(
                body, (q0, pl0, ll0, jnp.asarray(0.0, floatX()), key),
                None, length=n_steps)
            return q, pl, ll, accs / n_steps

        keys = self._shard(jax.random.split(self._split(), self.draws))
        run = jax.jit(jax.vmap(particle_chain))
        q, pl, ll, acc = run(keys, self._shard(self.posterior),
                             self._shard(np.asarray(self.scalings,
                                                    floatX())),
                             self._shard(np.asarray(self.prior_logp,
                                                    floatX())),
                             self._shard(np.asarray(self.likelihood_logp,
                                                    floatX())))
        self.posterior = np.asarray(q)
        self.prior_logp = np.asarray(pl, dtype=np.float64)
        self.likelihood_logp = np.asarray(ll, dtype=np.float64)
        self.acc_per_chain = np.asarray(acc, dtype=np.float64)
        self.acc_rate = float(self.acc_per_chain.mean())

    def posterior_to_trace(self):
        """cf. ``smc.py:295``."""
        from ..backends.base import MultiTrace
        from ..backends.ndarray import NDArray
        model = self.model
        unobserved = model.unobserved_RVs
        from ..node import _ev

        @jax.jit
        def decode(q):
            env = model._env_from_q(q)
            memo = {}
            return [jnp.asarray(_ev(v, env, memo)) for v in unobserved]

        vals = jax.vmap(decode)(jnp.asarray(self.posterior))
        varnames = [v.name for v in unobserved]
        strace = NDArray(model=model, vars=unobserved)
        strace.setup(self.draws, 0)
        strace.record_batch({n: np.asarray(v)
                             for n, v in zip(varnames, vals)}, self.draws)
        strace.close()
        return MultiTrace([strace])


def _make_abc_loglike(model, epsilon):
    """Gaussian-kernel pseudo-likelihood over simulator distance
    (cf. ``PseudoLikelihood``, ``smc.py:386-461``).

    The simulator function must be jax-traceable for the on-device path; a
    numpy simulator falls back to ``jax.pure_callback``.
    """
    from ..distributions.simulator import Simulator
    sims = [rv for rv in model.observed_RVs
            if isinstance(rv.distribution, Simulator)]
    if not sims:
        raise ValueError("SMC-ABC requires a pm.Simulator observed variable")
    rv = sims[0]
    observed = jnp.asarray(rv.data, floatX())
    fn = rv.distribution.function
    params = rv.distribution.params
    from ..node import _ev

    def loglike(q):
        env = model._env_from_q(q)
        memo = {}
        vals = [_ev(p, env, memo) for p in params]
        try:
            sim = fn(*vals)
        except Exception:
            sim = jax.pure_callback(
                lambda *a: np.asarray(fn(*[np.asarray(x) for x in a]),
                                      dtype=floatX()),
                jax.ShapeDtypeStruct(observed.shape, observed.dtype), *vals)
        dist2 = jnp.mean((jnp.asarray(sim, floatX()) - observed) ** 2)
        return -dist2 / (2.0 * epsilon ** 2)
    return loglike


def _logsumexp(a):
    a = np.asarray(a)
    amax = a.max()
    return float(np.log(np.sum(np.exp(a - amax))) + amax)
