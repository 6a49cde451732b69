"""pm.Data container matrix, mirroring the reference's
``pymc3/tests/test_data_container.py:1`` (157 LoC): Data in
deterministics, train/predict swap via set_data for both sampling and
posterior predictive, resizing, error paths, and naming."""
import numpy as np
import pytest

import pymc3_tpu as pm


class TestDataContainer:
    def test_data_as_observed_and_in_deterministic(self):
        """Data can serve directly as observed (reference ``:22``) and
        flow through deterministics recorded in the trace."""
        data = np.array([0.5, 0.4, 5.0, 2.0])
        with pm.Model() as m:
            X = pm.Data("X", data)
            mu = pm.Normal("mu", 0.0, 1.0)
            pm.Deterministic("shifted", X + mu)
            pm.Normal("y", mu=mu, sigma=1.0, observed=X)
            assert np.isfinite(m.logp(m.test_point))
            tr = pm.sample(draws=30, tune=30, chains=1, progressbar=False,
                           compute_convergence_checks=False, random_seed=4)
        np.testing.assert_allclose(tr["shifted"][0], data + tr["mu"][0],
                                   rtol=1e-4)

    def test_sample_with_data_likelihood(self):
        rng = np.random.default_rng(0)
        x = np.linspace(0.0, 1.0, 30)
        y = 2.0 * x + rng.normal(scale=0.05, size=30)
        with pm.Model() as m:
            xs = pm.Data("xs", x)
            beta = pm.Normal("beta", 0.0, 5.0)
            pm.Normal("obs", mu=beta * xs, sigma=0.05, observed=y)
            tr = pm.sample(draws=200, tune=200, chains=2, progressbar=False,
                           compute_convergence_checks=False, random_seed=1)
        assert abs(tr["beta"].mean() - 2.0) < 0.05

    def test_posterior_predictive_after_set_data(self):
        """Train on one grid, predict on another (reference ``:68``)."""
        x_train = np.array([0.0, 1.0, 2.0, 3.0])
        y_train = np.array([0.1, 2.0, 3.9, 6.1])
        x_test = np.array([10.0, 20.0])
        with pm.Model() as m:
            xs = pm.Data("xs", x_train)
            ys = pm.Data("ys", y_train)
            beta = pm.Normal("beta", 0.0, 10.0)
            pm.Normal("obs", mu=beta * xs, sigma=0.2, observed=ys)
            tr = pm.sample(draws=200, tune=200, chains=2, progressbar=False,
                           compute_convergence_checks=False, random_seed=2)
            # documented predict workflow: swap the predictors and resize
            # the observed container (values unused — shape drives the draw)
            pm.set_data({"xs": x_test, "ys": np.zeros_like(x_test)})
            ppc = pm.sample_posterior_predictive(tr, samples=100,
                                                 progressbar=False)
        assert ppc["obs"].shape == (100, 2)
        # predictions extrapolate with the fitted slope (~2)
        np.testing.assert_allclose(ppc["obs"].mean(0), 2.0 * x_test,
                                   rtol=0.1)

    def test_sample_after_set_data_resizes(self):
        """Re-sampling after swapping both sides of the likelihood
        (reference ``:89``) works with a different number of rows."""
        with pm.Model() as m:
            xs = pm.Data("xs", np.array([1.0, 2.0, 3.0]))
            ys = pm.Data("ys", np.array([1.1, 2.1, 2.9]))
            b = pm.Normal("b", 0.0, 10.0)
            pm.Normal("obs", mu=b * xs, sigma=0.1, observed=ys)
            pm.sample(draws=50, tune=50, chains=1, progressbar=False,
                      compute_convergence_checks=False)
            pm.set_data({"xs": np.linspace(0.0, 5.0, 10),
                         "ys": 3.0 * np.linspace(0.0, 5.0, 10)})
            tr2 = pm.sample(draws=200, tune=200, chains=2, progressbar=False,
                            compute_convergence_checks=False, random_seed=3)
        assert abs(tr2["b"].mean() - 3.0) < 0.1

    def test_creation_outside_model_raises(self):
        with pytest.raises(TypeError):
            pm.Data("x", np.arange(3))

    def test_set_data_on_non_data_variable_raises(self):
        with pm.Model() as m:
            pm.Normal("x", 0.0, 1.0)
            with pytest.raises((KeyError, TypeError, ValueError)):
                pm.set_data({"x": np.array([1.0])})

    def test_data_naming_nested(self):
        """Data containers respect sub-model name prefixing
        (reference test_data_naming)."""
        with pm.Model() as outer:
            with pm.Model(name="sub"):
                d = pm.Data("d", np.array([1.0, 2.0]))
        assert "sub_d" in outer.named_vars

    def test_data_value_roundtrip(self):
        with pm.Model() as m:
            d = pm.Data("d", np.array([1.0, 2.0, 3.0]))
            np.testing.assert_allclose(np.asarray(d.test_value),
                                       [1.0, 2.0, 3.0])
            pm.set_data({"d": np.array([4.0, 5.0])})
            np.testing.assert_allclose(np.asarray(d.test_value), [4.0, 5.0])
