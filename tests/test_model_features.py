"""Model-core feature tests: set_data, imputation, Potential/Deterministic,
nested models, total_size minibatch scaling, flatten/bijection."""
import numpy as np
import pytest

import pymc3_tpu as pm


def test_set_data_resample():
    x_obs = np.array([0.0, 1.0, 2.0], dtype=np.float32)
    with pm.Model() as model:
        x = pm.Data("x", x_obs)
        beta = pm.Normal("beta", 0, 10)
        pm.Normal("obs", mu=beta * x, sigma=1.0,
                  observed=np.array([0.0, 2.0, 4.0], dtype=np.float32))
        tr1 = pm.sample(draws=300, tune=300, chains=1, progressbar=False,
                        random_seed=1, compute_convergence_checks=False)
        pt = {"beta": np.float32(2.0)}
        lp1 = model.logp(pt)
        pm.set_data({"x": np.array([0.0, 10.0, 20.0], dtype=np.float32)},
                    model=model)
        lp2 = model.logp(pt)
    assert lp1 != lp2
    assert abs(tr1["beta"].mean() - 2.0) < 0.3


def test_missing_data_imputation():
    data = np.ma.masked_values([1.0, 2.0, -1.0, 4.0, -1.0], value=-1.0)
    with pytest.warns(pm.ImputationWarning):
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 5)
            pm.Normal("y", mu=mu, sigma=1.0, observed=data)
    assert "y_missing" in model.named_vars
    assert model.ndim == 1 + 2  # mu + two imputed entries
    with model:
        trace = pm.sample(draws=300, tune=300, chains=1, progressbar=False,
                          random_seed=2, compute_convergence_checks=False)
    missing = trace["y_missing"]
    # imputed entries concentrate near posterior mean of mu (~2.3)
    assert abs(missing.mean() - trace["mu"].mean()) < 0.5


def test_potential_changes_logp():
    with pm.Model() as m1:
        x = pm.Normal("x", 0, 1)
    with pm.Model() as m2:
        x = pm.Normal("x", 0, 1)
        pm.Potential("pot", x * 0 + 1.0)
    assert abs((m2.logp() - m1.logp()) - 1.0) < 1e-5


def test_deterministic_in_trace():
    with pm.Model() as model:
        x = pm.Normal("x", 0, 1)
        pm.Deterministic("x2", x ** 2)
        trace = pm.sample(draws=100, tune=100, chains=1, progressbar=False,
                          random_seed=3, compute_convergence_checks=False)
    np.testing.assert_allclose(trace["x2"], trace["x"] ** 2, rtol=1e-5)


def test_nested_model_prefix():
    with pm.Model() as outer:
        x = pm.Normal("x", 0, 1)
        with pm.Model(name="sub") as inner:
            y = pm.Normal("y", 0, 1)
    assert "sub_y" in outer.named_vars
    assert outer is inner.root


def test_total_size_scaling():
    data = np.random.randn(10).astype(np.float32)
    with pm.Model() as m1:
        mu = pm.Normal("mu", 0, 1)
        pm.Normal("y", mu=mu, sigma=1, observed=data, total_size=100)
    with pm.Model() as m2:
        mu = pm.Normal("mu", 0, 1)
        pm.Normal("y", mu=mu, sigma=1, observed=data)
    # scaled likelihood term is 10x the unscaled one
    lp1 = m1.logp_elemwise()["y"]
    lp2 = m2.logp_elemwise()["y"]
    np.testing.assert_allclose(lp1, 10 * lp2, rtol=1e-5)


def test_bijection_roundtrip():
    with pm.Model() as model:
        pm.Normal("a", 0, 1, shape=(2, 3))
        pm.HalfNormal("b", 1, shape=4)
    pt = model.test_point
    q = model.dict_to_array(pt)
    assert q.shape == (10,)
    pt2 = model.array_to_dict(q)
    for k in pt:
        np.testing.assert_allclose(pt[k], pt2[k])


def test_duplicate_name_raises():
    with pm.Model() as model:
        pm.Normal("x", 0, 1)
        with pytest.raises(ValueError):
            pm.Normal("x", 0, 1)
    # failed registration must not corrupt model state
    assert len(model.free_RVs) == 1


def test_model_no_context_raises():
    with pytest.raises(TypeError):
        pm.Normal("x", 0, 1)


def test_find_MAP_conjugate():
    data = np.random.default_rng(0).normal(2.0, 1.0, 50).astype(np.float32)
    with pm.Model() as model:
        mu = pm.Normal("mu", 0, 100)
        pm.Normal("y", mu=mu, sigma=1.0, observed=data)
        map_est = pm.find_MAP()
    assert abs(map_est["mu"] - data.mean()) < 0.05


def test_check_test_point_and_profile():
    with pm.Model() as model:
        x = pm.Normal("x", 0, 1)
        pm.Normal("y", mu=x, sigma=1, observed=np.float32(1.0))
    s = model.check_test_point()
    assert np.isfinite(s.values).all()
    prof = model.profile(model.logp_from_env is not None and
                         model.named_vars["y"], n=5)
    assert prof["n_calls"] == 5


def test_model_graph_deps():
    from pymc3_tpu.model_graph import ModelGraph
    with pm.Model() as model:
        a = pm.Normal("a", 0, 1)
        b = pm.Normal("b", mu=a, sigma=1)
        c = pm.Deterministic("c", a + b)
        pm.Normal("obs", mu=c, sigma=1, observed=np.float32(0.5))
    g = ModelGraph(model).make_compute_graph()
    assert "a" in g["b"]
    assert {"a", "b"} <= g["c"]
    assert "c" in g["obs"]
