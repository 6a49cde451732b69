"""Diagnostics tests: rhat/ess/hpd/loo/waic behave correctly on synthetic
chains with known properties."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu import stats

from . import models


def test_rhat_iid_close_to_one():
    rng = np.random.default_rng(0)
    chains = rng.normal(size=(4, 2000))
    r = stats._rhat_rank(chains)
    assert abs(r - 1.0) < 0.02


def test_rhat_detects_divergent_means():
    rng = np.random.default_rng(0)
    chains = rng.normal(size=(4, 500))
    chains[0] += 5.0
    r = stats._rhat_rank(chains)
    assert r > 1.5


def test_ess_iid():
    rng = np.random.default_rng(1)
    chains = rng.normal(size=(4, 1000))
    e = stats._ess_single(chains)
    assert 2500 < e < 6000  # ~4000 for iid


def test_ess_correlated_lower():
    rng = np.random.default_rng(2)
    n = 2000
    rho = 0.95
    x = np.zeros((2, n))
    eps = rng.normal(size=(2, n))
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho ** 2) * eps[:, t]
    e = stats._ess_single(x)
    assert e < 0.3 * 2 * n


def test_hpd_normal():
    rng = np.random.default_rng(3)
    x = rng.normal(size=50000)
    lo, hi = stats.hpd(x, alpha=0.05)
    assert abs(lo + 1.96) < 0.1
    assert abs(hi - 1.96) < 0.1


def test_geweke_stationary():
    rng = np.random.default_rng(4)
    z = stats.geweke(rng.normal(size=2000))
    assert np.all(np.abs(z[:, 1]) < 3)


def test_summary_and_loo():
    _, model = models.beta_bernoulli()
    with model:
        trace = pm.sample(draws=300, tune=300, chains=2, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    df = pm.summary(trace)
    assert "mean" in df.columns and "r_hat" in df.columns
    l = pm.loo(trace, model=model)
    w = pm.waic(trace, model=model)
    assert np.isfinite(l.loo)
    assert np.isfinite(w.waic)
    # deviance-scale information criteria should roughly agree
    assert abs(l.loo - w.waic) < 5


def test_bfmi():
    _, model, _ = models.simple_model()
    with model:
        trace = pm.sample(draws=300, tune=300, chains=2, progressbar=False,
                          random_seed=2, compute_convergence_checks=False)
    vals = pm.bfmi(trace)
    assert np.all(vals > 0.2)


def test_device_diagnostics_match_host():
    """On-device batched rhat/ess agree with the host implementations."""
    rng = np.random.default_rng(6)
    n = 1000
    rho = 0.7
    x = np.zeros((4, n, 3))
    eps = rng.normal(size=(4, n, 3))
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho ** 2) * eps[:, t]
    r_dev = stats.rhat_device(x)
    e_dev = stats.ess_device(x)
    for i in range(3):
        r_host = stats._rhat_single(x[:, :, i])
        e_host = stats._ess_single(x[:, :, i])
        assert abs(r_dev[i] - r_host) < 0.02
        assert abs(e_dev[i] - e_host) / e_host < 0.25


def test_r2_score():
    rng = np.random.default_rng(5)
    y = rng.normal(size=100)
    y_pred = y + rng.normal(0, 0.1, size=100)
    r2 = pm.r2_score(y, y_pred)
    assert r2.r2 > 0.9
