"""Mass-matrix tests (cf. the reference's ``tests/test_quadpotential.py``,
285 LoC): construction/dispatch, momentum-draw covariance, Welford
statistics (incl. the pooled psum merge), and posterior correctness of the
dense adaptive potential on a correlated Gaussian — the case a diagonal
mass matrix handles poorly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymc3_tpu as pm
from pymc3_tpu.step_methods.hmc import quadpotential as qp

from . import models


class TestConstruction:
    """cf. ``test_quadpotential.py:15-60``."""

    def test_elemwise_posdef(self):
        scaling = np.array([0, 2, 3])
        with pytest.raises(qp.PositiveDefiniteError):
            qp.quad_potential(scaling, True)

    def test_elemwise_velocity_energy(self):
        scaling = np.array([0.5, 2.0])
        x = np.ones(2)
        pot = qp.quad_potential(scaling, True)
        v = pot.velocity(x)
        assert np.allclose(v, scaling * x)
        assert np.isclose(pot.energy(x), 0.5 * (x * scaling * x).sum())
        # is_cov=False means the array is the mass itself
        pot_inv = qp.quad_potential(scaling, False)
        assert np.allclose(pot_inv.velocity(x), x / scaling)

    def test_equal_diag_full(self):
        """A diagonal matrix passed as full must act like the diag
        potential (``test_quadpotential.py:40``)."""
        np.random.seed(42)
        d = np.array([0.5, 2.0, 3.0])
        x = np.random.randn(3)
        pots = [qp.quad_potential(d, True),
                qp.quad_potential(np.diag(d), True)]
        for pot in pots:
            assert np.allclose(pot.velocity(x), d * x)
            assert np.isclose(pot.energy(x), 0.5 * x @ np.diag(d) @ x)

    def test_full_inv_roundtrip(self):
        rng = np.random.RandomState(3)
        L = np.tril(rng.randn(4, 4)) + 4 * np.eye(4)
        cov = L @ L.T
        x = rng.randn(4)
        a = qp.QuadPotentialFull(cov)
        b = qp.QuadPotentialFullInv(np.linalg.inv(cov))
        assert np.allclose(a.velocity(x), b.velocity(x), atol=1e-5)


class TestMomentumDraws:
    def test_dense_random_covariance(self):
        """p ~ N(0, cov^{-1}): sample covariance of dense_random draws
        matches the precision matrix."""
        rng = np.random.RandomState(0)
        A = rng.randn(3, 3)
        cov = (A @ A.T + 3 * np.eye(3)).astype(np.float32)
        chol = jnp.asarray(np.linalg.cholesky(cov))
        keys = jax.random.split(jax.random.PRNGKey(1), 40000)
        draws = jax.vmap(lambda k: qp.dense_random(k, chol))(keys)
        emp = np.cov(np.asarray(draws).T)
        prec = np.linalg.inv(cov)
        assert np.allclose(emp, prec, atol=0.15 * np.abs(prec).max())

    def test_mass_velocity_dispatch(self):
        var = jnp.asarray([0.5, 2.0])
        p = jnp.asarray([1.0, 3.0])
        assert np.allclose(qp.mass_velocity(var, p), [0.5, 6.0])
        dense = jnp.asarray([[0.5, 0.0], [0.0, 2.0]])
        assert np.allclose(qp.mass_velocity(dense, p), [0.5, 6.0])
        # batched momenta (the checkpoint-row case)
        P = jnp.stack([p, 2 * p])
        assert np.allclose(qp.mass_velocity(dense, P),
                           qp.mass_velocity(var, P))


class TestWelford:
    def test_welford_cov_matches_numpy(self):
        rng = np.random.RandomState(7)
        X = rng.randn(200, 3).astype(np.float32)
        st = qp.welford_cov_init(3)
        for x in X:
            st = qp.welford_cov_add(st, jnp.asarray(x))
        est = np.asarray(st.m2) / (float(st.w) - 1.0)
        assert np.allclose(est, np.cov(X.T), atol=1e-4)

    def test_welford_cov_psum_merge(self):
        """Pooled merge over a vmap axis == the covariance of the pooled
        samples (SURVEY §5 exact-psum claim, dense case)."""
        rng = np.random.RandomState(8)
        X = rng.randn(4, 50, 2).astype(np.float32)  # 4 chains x 50 draws

        def per_chain(xs):
            st = qp.welford_cov_init(2)
            for i in range(xs.shape[0]):
                st = qp.welford_cov_add(st, xs[i])
            return qp.welford_cov_merge_psum(st, "c")

        merged = jax.vmap(per_chain, axis_name="c")(jnp.asarray(X))
        est = np.asarray(merged.m2[0]) / (float(merged.w[0]) - 1.0)
        pooled = X.reshape(-1, 2)
        assert np.allclose(est, np.cov(pooled.T), atol=1e-4)


class TestDenseAdaptSampling:
    """Posterior correctness with a dense mass matrix on a correlated
    Gaussian (cf. ``test_quadpotential.py`` full-adapt sampling tests)."""

    def test_full_adapt_recovers_correlated_gaussian(self):
        start, model, (mu, C) = models.mv_simple()
        with model:
            trace = pm.sample(draws=1000, tune=1000, chains=4,
                              init="adapt_full", progressbar=False,
                              random_seed=42,
                              compute_convergence_checks=False)
        samples = np.asarray(trace["x"]).reshape(-1, 3)
        assert np.allclose(samples.mean(axis=0), mu,
                           atol=4 * np.sqrt(np.diag(C) / samples.shape[0]
                                            * 10))
        rhat = pm.rhat(trace, var_names=["x"])["x"]
        assert float(np.max(np.asarray(rhat))) < 1.05

    def test_jitter_adapt_full_runs(self):
        start, model, _ = models.mv_simple()
        with model:
            trace = pm.sample(draws=200, tune=300, chains=2,
                              init="jitter+adapt_full", progressbar=False,
                              random_seed=1,
                              compute_convergence_checks=False)
        assert len(trace) == 200

    def test_dense_adapt_state_window_doubles(self):
        st = qp.dense_adapt_init(np.zeros(2, np.float32),
                                 adaptation_window=4)
        key = jax.random.PRNGKey(0)
        xs = jax.random.normal(key, (12, 2), jnp.float32)
        for i in range(12):
            st = qp.dense_adapt_update(st, xs[i], True)
        # after >4 tuning draws the first window must have ended and doubled
        assert int(st.window) >= 8
        assert int(st.n_samples) == 12
        # cov stays finite and PD-factorizable throughout
        assert np.isfinite(np.asarray(st.chol)).all()


class TestRaiseOk:
    def test_diag_adapt_raise_ok_names_index(self):
        pot = qp.QuadPotentialDiagAdapt(2, np.zeros(2), np.array([1.0, 0.0]),
                                        10)
        with pytest.raises(ValueError, match="zero"):
            pot.raise_ok(None)
