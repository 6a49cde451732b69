"""Sampler correctness fixtures (cf. ``pymc3/tests/sampler_fixtures.py``).

Mixins assert known posterior moments / exact marginal CDFs (KS test) and
R-hat — the statistical harness the reference uses instead of golden traces.
"""
import numpy as np
import scipy.stats as st

import pymc3_tpu as pm


class KnownMean:
    def test_mean(self):
        for varname, expected in self.means.items():
            samples = self.samples[varname]
            npop = samples.shape[0] * (samples.shape[1] if samples.ndim > 1
                                       else 1)
            close_to(samples.mean(axis=0), expected, self.atol)


class KnownVariance:
    def test_var(self):
        for varname, expected in self.variances.items():
            close_to(self.samples[varname].var(axis=0), expected, self.atol)


class KnownCDF:
    ks_thin = 5
    alpha = 0.001

    def test_kstest(self):
        for varname, cdf in self.cdfs.items():
            samples = self.samples[varname]
            if samples.ndim == 1:
                t = st.kstest(samples[:: self.ks_thin], cdf=cdf)
                assert t.pvalue > self.alpha, (varname, t)
            else:
                for i in range(samples.shape[1]):
                    t = st.kstest(samples[:: self.ks_thin, i], cdf=cdf)
                    assert t.pvalue > self.alpha, (varname, i, t)


class UniformFixture(KnownMean, KnownVariance, KnownCDF):
    means = {"x": 0}
    variances = {"x": 1.0 / 3}
    cdfs = {"x": st.uniform(-1, 2).cdf}

    @classmethod
    def make_model(cls):
        with pm.Model() as model:
            pm.Uniform("x", lower=-1, upper=1)
        return model


class NormalFixture(KnownMean, KnownVariance, KnownCDF):
    means = {"x": 0}
    variances = {"x": 1}
    cdfs = {"x": st.norm(0, 1).cdf}

    @classmethod
    def make_model(cls):
        with pm.Model() as model:
            pm.Normal("x", mu=0.0, sigma=1.0, shape=3)
        return model


class BetaBinomialFixture(KnownMean):
    # analytic posterior means: (0.5 + obs) / (1 + n)
    means = {"p": np.array([0.5 / 5.0, 5.5 / 13.0, 7.5 / 10.0])}

    @classmethod
    def make_model(cls):
        with pm.Model() as model:
            p = pm.Beta("p", [0.5, 0.5, 0.5], [0.5, 0.5, 0.5], shape=3)
            pm.Binomial("y", p=p, n=[4, 12, 9],
                        observed=[0, 5, 7])
        return model


class StudentTFixture(KnownMean, KnownCDF):
    means = {"a": 0}
    cdfs = {"a": st.t(df=4).cdf}
    ks_thin = 10

    @classmethod
    def make_model(cls):
        with pm.Model() as model:
            pm.StudentT("a", nu=4, mu=0, sigma=1)
        return model


class BaseSampler:
    """cf. ``sampler_fixtures.py:136``."""

    @classmethod
    def setup_class(cls):
        # the jitter+adapt_diag init draws start jitter from the global
        # numpy RNG; pin it so results don't depend on suite ordering
        np.random.seed(20231123)
        cls.model = cls.make_model()
        cls.trace = pm.sample(
            draws=cls.n_samples, tune=cls.tune, chains=cls.chains,
            step=cls.make_step(cls.model) if hasattr(cls, "make_step")
            else None, model=cls.model, progressbar=False,
            random_seed=123, compute_convergence_checks=False)
        cls.samples = {}
        for var in cls.model.unobserved_RVs:
            if not var.name.endswith("__"):
                cls.samples[var.name] = cls.trace.get_values(
                    var.name, burn=getattr(cls, "burn", 0))

    def test_neff(self):
        if hasattr(self, "min_n_eff"):
            for varname in self.samples:
                n_eff = pm.ess(self.trace, var_names=[varname])[varname]
                assert np.all(np.asarray(n_eff) > self.min_n_eff), \
                    (varname, n_eff)

    def test_Rhat(self):
        for varname in self.samples:
            rhat = pm.rhat(self.trace, var_names=[varname])[varname]
            assert np.all(np.abs(np.asarray(rhat) - 1) < 0.1), (varname, rhat)


class NutsFixture(BaseSampler):
    @classmethod
    def make_step(cls, model):
        return pm.NUTS(model=model,
                       target_accept=getattr(cls, "step_args", {}).get(
                           "target_accept", 0.8))


class MetropolisFixture(BaseSampler):
    @classmethod
    def make_step(cls, model):
        return pm.Metropolis(model=model, vars=model.free_RVs, blocked=True)


class SliceFixture(BaseSampler):
    @classmethod
    def make_step(cls, model):
        return pm.Slice(model=model, vars=model.free_RVs, blocked=True)


def close_to(x, v, bound, name="value"):
    assert np.all(np.logical_or(np.abs(np.asarray(x) - np.asarray(v)) <
                                bound, np.asarray(x) == np.asarray(v))), \
        f"{name} out of bounds: {x}, {v}, {bound}"
