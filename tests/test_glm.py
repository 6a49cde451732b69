"""GLM tests (cf. ``pymc3/tests/test_glm.py``)."""
import numpy as np
import pandas as pd
import pytest

import pymc3_tpu as pm
from pymc3_tpu.glm.utils import design_matrices


@pytest.fixture(scope="module")
def lin_data():
    np.random.seed(10)
    n = 200
    x = np.linspace(-1, 1, n)
    y = 0.5 + 2.0 * x + np.random.normal(0, 0.3, n)
    return pd.DataFrame({"x": x, "y": y})


def test_design_matrix(lin_data):
    y, X, labels = design_matrices("y ~ x", lin_data)
    assert labels == ["Intercept", "x"]
    assert X.shape == (200, 2)
    np.testing.assert_allclose(X[:, 0], 1.0)

    y, X, labels = design_matrices("y ~ 0 + x", lin_data)
    assert labels == ["x"]

    df = pd.DataFrame({"y": [1.0, 2, 3, 4], "a": [1.0, 2, 3, 4],
                       "g": ["u", "v", "u", "v"]})
    y, X, labels = design_matrices("y ~ a + C(g)", df)
    assert "C(g)[T.v]" in labels
    np.testing.assert_allclose(X[:, labels.index("C(g)[T.v]")],
                               [0, 1, 0, 1])

    y, X, labels = design_matrices("y ~ a * a", df)  # interaction expansion
    assert any(":" in l for l in labels)


def test_glm_from_formula_recovers(lin_data):
    with pm.Model() as model:
        pm.GLM.from_formula("y ~ x", lin_data)
        trace = pm.sample(draws=500, tune=500, chains=2, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    assert abs(trace["Intercept"].mean() - 0.5) < 0.1
    assert abs(trace["x"].mean() - 2.0) < 0.15


def test_glm_binomial():
    np.random.seed(11)
    n = 300
    x = np.linspace(-2, 2, n)
    p = 1 / (1 + np.exp(-(0.3 + 1.5 * x)))
    y = (np.random.uniform(size=n) < p).astype(int)
    df = pd.DataFrame({"x": x, "y": y})
    with pm.Model() as model:
        pm.GLM.from_formula("y ~ x", df, family="binomial")
        trace = pm.sample(draws=500, tune=500, chains=2, progressbar=False,
                          random_seed=2, compute_convergence_checks=False)
    assert abs(trace["x"].mean() - 1.5) < 0.5


def test_linear_component(lin_data):
    with pm.Model() as model:
        lc = pm.LinearComponent(lin_data[["x"]], lin_data["y"].values)
        sigma = pm.HalfCauchy("sigma", 5)
        pm.Normal("obs", mu=lc.y_est, sigma=sigma,
                  observed=lin_data["y"].values.astype(np.float32))
    assert "Intercept" in model.named_vars
    assert np.isfinite(model.logp())
