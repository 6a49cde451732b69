"""DensityDist example (cf. ``pymc3/examples/arbitrary_stochastic.py``)."""
import numpy as np
import jax.numpy as jnp

import pymc3_tpu as pm


def build_model():
    with pm.Model() as model:
        def logp(value):
            return -(jnp.abs(value) + value ** 2 / 2)
        pm.DensityDist("custom", logp, testval=0.0)
    return model


def run(n=1000):
    model = build_model()
    with model:
        trace = pm.sample(draws=n, tune=500, chains=2, progressbar=False)
    print(pm.summary(trace))
    return trace


if __name__ == "__main__":
    run()
