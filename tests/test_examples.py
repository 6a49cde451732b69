"""Smoke tests for packaged example models (cf.
``pymc3/tests/test_examples.py``): build, check the test point is finite,
and run a short sample."""
import numpy as np
import pytest

import pymc3_tpu as pm


def _finite_test_point(model):
    pt = model.check_test_point()
    assert np.all(np.isfinite(np.asarray(pt.values, dtype=np.float64))), pt


def test_gelman_bioassay():
    from pymc3_tpu.examples.gelman_bioassay import build_model
    model = build_model()
    _finite_test_point(model)
    with model:
        trace = pm.sample(draws=150, tune=150, chains=2, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    # theta rates are increasing in dose on average (monotone logit-linear)
    theta = np.asarray(trace["theta"]).reshape(-1, 4).mean(axis=0)
    assert np.all(np.diff(theta) > 0)
    assert float(np.asarray(trace["beta"]).mean()) > 0


def test_lasso_missing_imputation():
    """End-to-end imputation: masked Bernoulli/Poisson predictors become
    free RVs sampled by the compound step (model.py:231-301)."""
    from pymc3_tpu.examples.lasso_missing import build_model
    model = build_model()
    _finite_test_point(model)
    # siblings has no NaNs in the dataset, so only these two impute
    missing_names = {v.name for v in model.free_RVs if "missing" in v.name}
    assert {"disability_imp_missing", "mother_imp_missing"} <= missing_names
    with model:
        trace = pm.sample(draws=60, tune=60, chains=1, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    imputed = np.asarray(trace["disability_imp_missing"])
    assert set(np.unique(imputed)) <= {0.0, 1.0}
    # imputed trace actually mixes (not frozen at init)
    assert np.unique(np.asarray(trace["mother_imp_missing"]).sum(1)).size > 1


def test_factor_potential():
    from pymc3_tpu.examples.factor_potential import build_model
    model = build_model()
    _finite_test_point(model)
    with model:
        trace = pm.sample(draws=300, tune=300, chains=2, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    # N(1,1) x exp(-x^2) => posterior N(1/3, 1/3)
    x = np.asarray(trace["x"])
    assert abs(x.mean() - 1.0 / 3.0) < 0.1
    assert abs(x.var() - 1.0 / 3.0) < 0.1


def test_custom_dists():
    from pymc3_tpu.examples.custom_dists import build_model, theta_true
    model = build_model()
    _finite_test_point(model)
    with model:
        trace = pm.sample(draws=300, tune=400, chains=2, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    assert abs(float(np.asarray(trace["slope"]).mean())
               - theta_true[1]) < 0.4


def test_rankdata_ordered():
    from pymc3_tpu.examples.rankdata_ordered import build_model, yreal, K
    model = build_model()
    _finite_test_point(model)
    with model:
        trace = pm.sample(draws=150, tune=300, chains=1, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    latentmu = np.hstack(
        [[0], np.asarray(trace["mu_hat"]).reshape(-1, K - 1).mean(0)])
    # adjacent items are confusable at noise sd 1 (the reference example
    # asserts nothing); require the unambiguous extremes to be recovered
    order = list(np.argsort(latentmu))
    true = list(yreal.flatten())
    assert order[0] == true[0] and order[-1] == true[-1], (order, true)
