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
