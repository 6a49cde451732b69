"""ARMA(1,1) with a scan-built innovation sequence
(cf. ``pymc3/examples/arma_example.py``)."""
import numpy as np

import pymc3_tpu as pm
from pymc3_tpu.node import apply as node_apply

np.random.seed(0)
n = 100
y_data = np.cumsum(np.random.normal(0, 1, n)).astype(np.float32) * 0.1


def build_model(y=y_data):
    import jax.numpy as jnp
    from jax import lax

    with pm.Model() as arma_model:
        sigma = pm.HalfNormal("sigma", 5.0)
        theta = pm.Normal("theta", 0.0, 1.0)
        phi = pm.Normal("phi", 0.0, 2.0)
        mu = pm.Normal("mu", 0.0, 10.0)

        def err_seq(mu_, phi_, theta_, y_):
            """err_t = y_t - (mu + phi y_{t-1} + theta err_{t-1})."""
            y_ = jnp.asarray(y_)
            err0 = y_[0] - (mu_ + phi_ * mu_)

            def step(e_prev, t):
                yl = y_[t - 1]
                e = y_[t] - (mu_ + phi_ * yl + theta_ * e_prev)
                return e, e
            _, errs = lax.scan(step, err0, jnp.arange(1, y_.shape[0]))
            return jnp.concatenate([err0[None], errs])

        err = node_apply(err_seq, mu, phi, theta, y)
        pm.Potential("like", pm.Normal.dist(0.0, sigma=sigma).logp_sum(err))
    return arma_model


def run(n_draws=500):
    model = build_model()
    with model:
        trace = pm.sample(draws=n_draws, tune=1000, chains=2,
                          progressbar=False, nuts={"target_accept": 0.9})
    print(pm.summary(trace))
    return trace


if __name__ == "__main__":
    run()
