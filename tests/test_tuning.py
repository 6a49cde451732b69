"""MAP / scaling tuning matrix (cf. ``tests/test_tuning.py`` and
``tests/test_starting.py`` in the reference)."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu.tuning import scaling
from pymc3_tpu.tuning.starting import find_MAP

from . import models


def test_adjust_precision():
    """``test_tuning.py:22`` — all outputs positive and bounded even for
    0 / inf inputs."""
    a = np.array([-10, -0.01, 0, 10, 1e300, -np.inf, np.inf])
    a1 = scaling.adjust_precision(a)
    assert np.all((a1 > 0) & (a1 < 1e200))


def test_guess_scaling():
    """``test_tuning.py:28``."""
    start, model = models.non_normal(n=5)
    a1 = scaling.guess_scaling(start, model=model)
    # bound by the array's own dtype max (float32 under the default width)
    assert np.all((a1 > 0) & (a1 < np.finfo(a1.dtype).max))


def test_find_hessian_matches_finite_differences():
    _, model, _ = models.simple_model()
    H = scaling.find_hessian(model.test_point, model=model)
    # simple_model: iid Normal(mu, tau=1.3) => Hessian = tau * I
    np.testing.assert_allclose(H, 1.3 * np.eye(2), atol=1e-4)
    d = scaling.find_hessian_diag(model.test_point, model=model)
    np.testing.assert_allclose(d, np.diag(H), atol=1e-4)


def test_accuracy_normal():
    """``test_starting.py:23`` — MAP from a far-away start."""
    _, model, (mu, _) = models.simple_model()
    with model:
        newstart = find_MAP(pm.Point(x=[-10.5, 100.5], model=model),
                            progressbar=False)
    np.testing.assert_allclose(newstart["x"], [mu, mu], atol=1e-3)


def test_accuracy_non_normal():
    """``test_starting.py:30`` — Beta(3,3) mode at 0.5."""
    start, model = models.non_normal(4)
    with model:
        newstart = find_MAP(pm.Point(x=[0.5, 0.01, 0.95, 0.99],
                                     model=model), progressbar=False)
    np.testing.assert_allclose(newstart["x"], 0.5 * np.ones(4), atol=1e-3)


def test_find_MAP():
    """``test_starting.py:64`` — gradient and gradient-free methods."""
    rng = np.random.RandomState(5)
    data = rng.randn(100)
    data = (data - np.mean(data)) / np.std(data)
    with pm.Model():
        mu = pm.Uniform("mu", -1, 1)
        sigma = pm.Uniform("sigma", 0.5, 1.5)
        pm.Normal("y", mu=mu, tau=sigma ** -2, observed=data)
        map_est1 = find_MAP(progressbar=False)
        map_est2 = find_MAP(progressbar=False, method="Powell")
    tol = 1e-3
    np.testing.assert_allclose(map_est1["mu"], 0, atol=tol)
    np.testing.assert_allclose(map_est1["sigma"], 1, atol=tol)
    np.testing.assert_allclose(map_est2["mu"], 0, atol=tol)
    np.testing.assert_allclose(map_est2["sigma"], 1, atol=tol)


def test_find_MAP_discrete():
    """``test_starting.py:37`` — MAP with a discrete RV held fixed."""
    alpha, beta, n, yes = 4, 4, 20, 15
    with pm.Model() as model:
        p = pm.Beta("p", alpha, beta)
        pm.Binomial("ss", n=n, p=p)
        pm.Binomial("s", n=n, p=p, observed=yes)
        map_est1 = find_MAP(progressbar=False)
    # marginal MAP of p given the observed Binomial + fixed latent count
    assert 0.4 < float(map_est1["p"]) < 0.8


def test_bfgs_flat_prior_mle():
    """``test_tuning.py:34`` — with a flat prior the MAP is the MLE."""
    truth = 10.0
    with pm.Model() as model:
        mu = pm.Flat("mu_i")
        pm.Normal("y", mu=mu, sigma=1.0,
                  observed=np.full(50, truth, dtype=np.float32))
        est = find_MAP(method="BFGS", progressbar=False)
    np.testing.assert_allclose(est["mu_i"], truth, rtol=1e-4)
