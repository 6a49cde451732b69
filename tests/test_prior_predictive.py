"""Prior-predictive matrix (cf. ``tests/test_sampling.py:708-866``,
``TestSamplePriorPredictive``): observed-ignoring, shape semantics,
multivariate, layered/transformed/bounded models."""
import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

import pymc3_tpu as pm


class TestSamplePriorPredictive:
    def test_ignores_observed(self):
        """``test_sampling.py:709`` — the prior ignores observed data."""
        rng = np.random.RandomState(0)
        observed = rng.normal(10, 1, size=200)
        with pm.Model():
            observed_data = pm.Data("observed_data", observed)
            mu = pm.Normal("mu", mu=-100, sigma=1)
            positive_mu = pm.Deterministic("positive_mu", abs(mu))
            z = -1 - positive_mu
            pm.Normal("x_obs", mu=z, sigma=1, observed=observed_data)
            prior = pm.sample_prior_predictive(random_seed=2)

        assert "observed_data" not in prior
        assert (prior["mu"] < 90).all()
        assert (prior["positive_mu"] > 90).all()
        assert (prior["x_obs"] < 90).all()
        assert prior["x_obs"].shape == (500, 200)
        npt.assert_array_almost_equal(prior["positive_mu"],
                                      np.abs(prior["mu"]), decimal=4)

    @pytest.mark.parametrize("shape", [2, (2,), (10, 2), (10, 10)])
    def test_respects_shape(self, shape):
        """``test_sampling.py:729``."""
        with pm.Model():
            mu = pm.Gamma("mu", 3, 1, shape=1)
            pm.Poisson("goals", mu, shape=shape)
            trace = pm.sample_prior_predictive(
                10, var_names=["mu", "goals"], random_seed=3)
        expect = (shape,) if isinstance(shape, int) else shape
        assert trace["goals"].shape == (10,) + tuple(expect)

    def test_multivariate(self):
        """``test_sampling.py:742``."""
        with pm.Model():
            m = pm.Multinomial("m", n=5,
                               p=np.array([0.25, 0.25, 0.25, 0.25]),
                               shape=4)
            trace = pm.sample_prior_predictive(10, random_seed=4)
        assert np.asarray(m.random(size=10)).shape == (10, 4)
        assert trace["m"].shape == (10, 4)
        assert np.all(trace["m"].sum(axis=-1) == 5)

    def test_multivariate2(self):
        """``test_sampling.py:750`` — Dirichlet-Multinomial prior + PPC."""
        rng = np.random.RandomState(1)
        mn_data = rng.multinomial(n=100, pvals=[1 / 6.0] * 6, size=10)
        with pm.Model() as dm_model:
            probs = pm.Dirichlet("probs", a=np.ones(6), shape=6)
            obs = pm.Multinomial("obs", n=100, p=probs, observed=mn_data)
            burned_trace = pm.sample(20, tune=10, chains=1,
                                     progressbar=False, random_seed=1,
                                     compute_convergence_checks=False)
        sim_priors = pm.sample_prior_predictive(samples=20, model=dm_model,
                                                random_seed=5)
        sim_ppc = pm.sample_posterior_predictive(burned_trace, samples=20,
                                                 model=dm_model,
                                                 progressbar=False)
        assert sim_priors["probs"].shape == (20, 6)
        assert sim_priors["obs"].shape == (20,) + tuple(
            obs.distribution.shape)
        assert sim_ppc["obs"].shape == (20,) + tuple(obs.distribution.shape)
        fast = pm.fast_sample_posterior_predictive(burned_trace, samples=20,
                                                   model=dm_model)
        assert fast["obs"].shape == (20,) + tuple(obs.distribution.shape)

    def test_layers(self):
        """``test_sampling.py:772`` — hierarchical forward draws mix over
        the parent prior."""
        with pm.Model():
            a = pm.Uniform("a", lower=0, upper=1, shape=10)
            b = pm.Binomial("b", n=1, p=a, shape=10)
            prior = pm.sample_prior_predictive(10000, random_seed=6)
        npt.assert_array_almost_equal(prior["b"].mean(axis=0),
                                      0.5 * np.ones(10), decimal=1)

    def test_transformed(self):
        """``test_sampling.py:780`` — transformed names appear in the
        prior dict."""
        rng = np.random.RandomState(2)
        n = 18
        at_bats = 45 * np.ones(n, dtype=int)
        hits = rng.randint(1, 40, size=n)
        draws = 50
        with pm.Model():
            phi = pm.Beta("phi", alpha=1.0, beta=1.0)
            kappa_log = pm.Exponential("logkappa", lam=5.0)
            kappa = pm.Deterministic("kappa", kappa_log.exp()
                                     if hasattr(kappa_log, "exp")
                                     else kappa_log)
            thetas = pm.Beta("thetas", alpha=phi * kappa,
                             beta=(1.0 - phi) * kappa, shape=n)
            pm.Binomial("y", n=at_bats, p=thetas, observed=hits)
            gen = pm.sample_prior_predictive(draws, random_seed=7)
        assert gen["phi"].shape == (draws,)
        assert gen["y"].shape == (draws, n)
        assert "thetas_logodds__" in gen

    def test_shared(self):
        """``test_sampling.py:803`` — pm.Data resizing flows into the
        prior predictive."""
        rng = np.random.RandomState(3)
        n1, draws = 10, 50
        with pm.Model() as m:
            obs = pm.Data("obs_data", (rng.rand(n1) < 0.5).astype(
                np.int32))
            p = pm.Beta("p", 1.0, 1.0)
            pm.Bernoulli("y", p, observed=obs)
            gen1 = pm.sample_prior_predictive(draws, random_seed=8)
        assert gen1["y"].shape == (draws, n1)

    def test_density_dist(self):
        """``test_sampling.py:822``."""
        rng = np.random.RandomState(4)
        obs = rng.normal(-1, 0.1, size=10)
        with pm.Model():
            mu = pm.Normal("mu", 0, 1)
            sd = pm.Gamma("sd", 1, 2)
            pm.DensityDist("a", pm.Normal.dist(mu, sd).logp,
                           random=pm.Normal.dist(mu, sd).random,
                           observed=obs)
            prior = pm.sample_prior_predictive(random_seed=9)
        npt.assert_almost_equal(prior["a"].mean(), 0, decimal=1)

    def test_shape_edgecase(self):
        """``test_sampling.py:838``."""
        with pm.Model():
            mu = pm.Normal("mu", shape=5)
            sd = pm.Uniform("sd", lower=2, upper=3)
            pm.Normal("x", mu=mu, sigma=sd, shape=5)
            prior = pm.sample_prior_predictive(10, random_seed=10)
        assert prior["mu"].shape == (10, 5)
        assert prior["x"].shape == (10, 5)

    def test_zeroinflatedpoisson(self):
        """``test_sampling.py:846``."""
        with pm.Model():
            theta = pm.Beta("theta", alpha=1, beta=1)
            psi = pm.HalfNormal("psi", sigma=1)
            pm.ZeroInflatedPoisson("suppliers", psi=psi, theta=theta,
                                   shape=20)
            gen = pm.sample_prior_predictive(samples=1000, random_seed=11)
        assert gen["theta"].shape == (1000,)
        assert gen["psi"].shape == (1000,)
        assert gen["suppliers"].shape == (1000, 20)

    def test_bounded_dist(self):
        """``test_sampling.py:856``."""
        with pm.Model() as model:
            BoundedNormal = pm.Bound(pm.Normal, lower=0.0)
            BoundedNormal("x", mu=np.zeros((3, 1)),
                          sigma=np.ones((3, 1)), shape=(3, 1))
        with model:
            prior = pm.sample_prior_predictive(5, random_seed=12)
        assert prior["x"].shape == (5, 3, 1)
        assert np.all(prior["x"] >= 0)
