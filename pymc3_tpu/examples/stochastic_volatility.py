"""Stochastic volatility on S&P500 returns
(cf. ``pymc3/examples/stochastic_volatility.py``): GaussianRandomWalk latent
log-volatility — a ``lax.scan`` logp in this build."""
import os

import numpy as np

import pymc3_tpu as pm


def build_model(n_obs=400):
    rng = np.random.default_rng(42)
    # synthetic returns with time-varying volatility
    s = np.cumsum(rng.normal(0, 0.1, n_obs))
    returns = (rng.normal(0, 1, n_obs) * np.exp(s / 2) * 0.01).astype(
        np.float32)
    with pm.Model() as model:
        step_size = pm.Exponential("sigma", 50.0)
        s = pm.GaussianRandomWalk("s", sigma=step_size, shape=n_obs)
        nu = pm.Exponential("nu", 0.1)
        pm.StudentT("r", nu=nu, sigma=pm.math.exp(s / 2) * 0.01,
                    observed=returns)
    return model


def run(n=500):
    model = build_model()
    with model:
        trace = pm.sample(draws=n, tune=500, chains=2, progressbar=False,
                          nuts={"target_accept": 0.9})
    print(pm.summary(trace, var_names=["sigma", "nu"]))
    return trace


if __name__ == "__main__":
    run()
