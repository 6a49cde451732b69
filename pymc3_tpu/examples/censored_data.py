"""Censored-data likelihoods via Potential with logcdf terms
(cf. ``pymc3/examples/censored_data.py``)."""
import numpy as np

import pymc3_tpu as pm
from pymc3_tpu.node import apply as node_apply

np.random.seed(123)
high = 3.0
low = -1.0
samples = np.random.normal(1.0, 1.5, 500).astype(np.float32)
censored = np.clip(samples, low, high)
uncensored = censored[(censored > low) & (censored < high)]
n_left = int((censored <= low).sum())
n_right = int((censored >= high).sum())


def build_model():
    import jax.numpy as jnp

    with pm.Model() as model:
        mu = pm.Normal("mu", 0.0, 5.0)
        sigma = pm.HalfNormal("sigma", 5.0)
        pm.Normal("obs", mu=mu, sigma=sigma, observed=uncensored)
        # censored tails enter via the cdf mass (imputed-free formulation)
        dist = pm.Normal.dist(mu, sigma)
        left = node_apply(lambda lc: n_left * lc,
                          dist.logcdf(pm.node.as_node(np.float32(low))))
        pm.Potential("left_censored", left)
        right = node_apply(
            lambda c: n_right * jnp.log1p(-jnp.exp(c)),
            dist.logcdf(pm.node.as_node(np.float32(high))))
        pm.Potential("right_censored", right)
    return model


def run(n=500):
    model = build_model()
    with model:
        trace = pm.sample(draws=n, tune=500, chains=2, progressbar=False)
    print(pm.summary(trace))
    return trace


if __name__ == "__main__":
    run()
