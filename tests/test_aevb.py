"""AEVB / local variational groups (cf. reference ``opvi.py:507-1227``,
``test_variational_inference.py::test_aevb`` / ``test_vae`` /
``test_rowwise_approx``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pymc3_tpu as pm
from pymc3_tpu.variational.approximations import (FullRankGroup,
                                                  MeanFieldGroup)
from pymc3_tpu.variational.inference import KLqp
from pymc3_tpu.variational.opvi import Approximation, Group


def aevb_model():
    """cf. reference ``aevb_model`` fixture
    (test_variational_inference.py:802)."""
    with pm.Model() as model:
        x = pm.HalfNormal("x", shape=(2,), total_size=5)
        y = pm.Normal("y", shape=(2,))
    return model, x, y


def test_aevb_trainable_local_params():
    model, x, y = aevb_model()
    mu0 = np.zeros(2, dtype=np.float32)
    rho0 = np.zeros(2, dtype=np.float32)
    with model:
        inference = pm.ADVI(local_rv={x: dict(mu=mu0, rho=rho0)})
        approx = inference.fit(200, obj_n_mc=2, progressbar=False,
                               random_seed=1)
    tr = approx.sample(10)
    assert len(tr) == 10
    assert np.all(np.asarray(tr.get_values("x")) > 0)
    # the local group's params were actually trained
    local_params = approx.params[0]
    assert not np.allclose(np.asarray(local_params["mu"]), mu0)


def test_local_group_logq_scaling():
    """Local-group logq carries the total_size minibatch scaling
    (cf. reference symbolic_logq, opvi.py:1180)."""
    model, x, y = aevb_model()
    g = MeanFieldGroup([x], local=True,
                       params=dict(mu=np.zeros(2), rho=np.zeros(2)),
                       model=model)
    np.testing.assert_allclose(g.scale_vec, 2.5)  # total_size 5 / rows 2
    gg = MeanFieldGroup([y], model=model)
    np.testing.assert_allclose(gg.scale_vec, 1.0)


def test_local_group_requires_params():
    model, x, y = aevb_model()
    with pytest.raises(ValueError, match="user-provided params"):
        MeanFieldGroup([x], local=True, model=model)


def test_vae_minibatch_encoder():
    """End-to-end amortized inference: the encoder sees exactly the
    minibatch rows the likelihood sees (cf. reference ``test_vae``)."""
    rng = np.random.default_rng(0)
    data = rng.normal(1.5, 0.8, size=100).astype(np.float32)
    minibatch_size = 10

    with pm.Model() as model:
        x_mini = pm.Minibatch(data, minibatch_size)
        zs = pm.Normal("zs", mu=0, sigma=1, shape=minibatch_size,
                       total_size=100)
        pm.Normal("xs_", mu=zs, sigma=0.1, observed=x_mini,
                  total_size=100)

    def encoder(aux, key):
        rows = jnp.asarray(data)[x_mini.indices(key)]
        mu = rows * aux["w"] + aux["b"]
        rho = jnp.broadcast_to(aux["rho"], rows.shape)
        return mu, rho

    aux0 = {"w": np.float32(0.1), "b": np.float32(0.0),
            "rho": np.float32(-2.0)}
    from pymc3_tpu.variational.updates import adam
    with model:
        inference = pm.ADVI(local_rv={zs: dict(encoder=encoder, aux=aux0)})
        approx = inference.fit(2000, obj_n_mc=2, progressbar=False,
                               random_seed=2,
                               obj_optimizer=adam(learning_rate=0.02))
    hist = np.asarray(approx.hist)
    assert np.isfinite(hist[-50:]).all()
    assert hist[-50:].mean() < hist[:50].mean()  # ELBO improved
    # with sigma_obs=0.1 << sigma_prior=1, optimal amortization is mu ~= x,
    # i.e. w -> ~1
    w = float(np.asarray(approx.params[0]["aux"]["w"]))
    assert w > 0.5, w
    tr = approx.sample(7)
    assert np.asarray(tr.get_values("zs")).shape == (7, minibatch_size)


def test_fit_dispatcher_local_rv():
    model, x, y = aevb_model()
    with model:
        approx = pm.fit(50, method="advi",
                        local_rv={x: dict(mu=np.zeros(2),
                                          rho=np.zeros(2))},
                        progressbar=False, random_seed=3)
    assert len(approx.groups) == 2
    with pytest.raises(NotImplementedError):
        with model:
            pm.fit(5, method="svgd",
                   local_rv={x: dict(mu=np.zeros(2), rho=np.zeros(2))})


def test_rowwise_fullrank_group():
    """cf. reference ``test_rowwise_approx``: block-diagonal full-rank over
    the leading axis."""
    with pm.Model() as model:
        one = pm.Normal("one", shape=(3, 2))
        two = pm.Normal("two", shape=(2,))
    g_row = FullRankGroup([one], rowwise=True, model=model)
    g_rest = MeanFieldGroup([two], model=model)
    assert g_row.rows == 3 and g_row.row_dim == 2
    approx = Approximation([g_row, g_rest], model=model)
    # block-diagonal covariance: off-block entries exactly zero
    cov = np.asarray(g_row.cov(approx.params[0]))
    assert cov.shape == (6, 6)
    assert np.all(cov[0:2, 2:6] == 0) and np.all(cov[2:4, 4:6] == 0)
    with model:
        approx = KLqp(approx).fit(60, obj_n_mc=2, progressbar=False,
                                  random_seed=4)
    tr = approx.sample(5)
    assert np.asarray(tr.get_values("one")).shape == (5, 3, 2)


def test_rowwise_sampling_consistency():
    """A rowwise full-rank group with identity blocks samples like a
    standard normal (statistical smoke check)."""
    with pm.Model() as model:
        one = pm.Normal("one", shape=(4, 3))
    g = FullRankGroup([one], rowwise=True, model=model)
    params = g.init_params()
    z, logq = g.sample_q(jax.random.PRNGKey(0), params, 4000)
    z = np.asarray(z)
    # init diag is softplus(1) ~ 1.3133
    s = float(np.log1p(np.exp(1.0)))
    np.testing.assert_allclose(z.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(z.std(0), s, atol=0.12)
    # logq matches the analytic N(0, s^2 I) density of the drawn points
    want = (-0.5 * (np.log(2 * np.pi) + 2 * np.log(s)
                    + (z / s) ** 2)).sum(-1)
    np.testing.assert_allclose(np.asarray(logq), want, rtol=2e-3, atol=2e-3)
