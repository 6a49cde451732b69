"""Known-posterior sampler tests (cf. ``pymc3/tests/test_posteriors.py``):
cross product of sampler × model fixtures, statistical assertions."""
import pytest

from . import sampler_fixtures as sf


class TestNUTSUniform(sf.NutsFixture, sf.UniformFixture):
    n_samples = 2000
    tune = 500
    chains = 4
    min_n_eff = 500
    atol = 0.05


class TestNUTSNormal(sf.NutsFixture, sf.NormalFixture):
    n_samples = 4000
    tune = 500
    chains = 4
    min_n_eff = 1000
    atol = 0.08


class TestNUTSBetaBinomial(sf.NutsFixture, sf.BetaBinomialFixture):
    n_samples = 2000
    tune = 1000
    chains = 2
    min_n_eff = 400
    atol = 0.04


class TestNUTSStudentT(sf.NutsFixture, sf.StudentTFixture):
    n_samples = 4000
    tune = 1000
    chains = 2
    min_n_eff = 800
    atol = 0.12


class TestMetropolisUniform(sf.MetropolisFixture, sf.UniformFixture):
    n_samples = 5000
    tune = 1000
    chains = 4
    min_n_eff = 200
    atol = 0.07


class TestSliceUniform(sf.SliceFixture, sf.UniformFixture):
    n_samples = 3000
    tune = 500
    chains = 2
    min_n_eff = 800
    atol = 0.06


class TestNUTSLKJCholeskyCov:
    """End-to-end covariance recovery through the packed-cholesky LKJ
    prior (cf. reference ``test_distributions_random.py`` LKJCholeskyCov
    sampling usage and ``examples/LKJ_correlation.py``): NUTS on the
    packed lower-triangle must recover the correlation sign and the
    marginal scales of the generating covariance."""

    def test_recovers_covariance(self):
        import numpy as np
        import pymc3_tpu as pm
        true_cov = np.array([[1.0, 0.6], [0.6, 2.0]])
        rng = np.random.default_rng(99)
        data = rng.multivariate_normal(np.zeros(2), true_cov, size=400)
        with pm.Model() as m:
            packed = pm.LKJCholeskyCov(
                "packed", eta=2.0, n=2,
                sd_dist=pm.HalfCauchy.dist(beta=2.5))
            L = pm.Deterministic(
                "L", pm.math.expand_packed_triangular(2, packed))
            pm.MvNormal("obs", mu=np.zeros(2), chol=L, observed=data)
            trace = pm.sample(draws=500, tune=500, chains=2,
                              progressbar=False,
                              compute_convergence_checks=False,
                              random_seed=7)
        Ls = trace["L"].reshape(-1, 2, 2)
        covs = np.einsum("bij,bkj->bik", Ls, Ls)
        post_cov = covs.mean(0)
        assert abs(post_cov[0, 0] - 1.0) < 0.25
        assert abs(post_cov[1, 1] - 2.0) < 0.5
        corr = post_cov[0, 1] / np.sqrt(post_cov[0, 0] * post_cov[1, 1])
        assert abs(corr - 0.6 / np.sqrt(2.0)) < 0.12
