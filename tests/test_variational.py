"""VI tests (cf. ``pymc3/tests/test_variational_inference.py``): ELBO on a
conjugate model, all fit methods, callbacks."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu import variational as v


@pytest.fixture(scope="module")
def conjugate():
    np.random.seed(0)
    data = (np.random.randn(80) + 2.0).astype(np.float32)
    with pm.Model() as model:
        mu = pm.Normal("mu", 0.0, 10.0)
        pm.Normal("obs", mu=mu, sigma=1.0, observed=data)
    # analytic posterior
    n = len(data)
    post_var = 1.0 / (1.0 / 100.0 + n)
    post_mu = post_var * data.sum()
    return model, post_mu, np.sqrt(post_var)


def test_advi_conjugate(conjugate):
    model, post_mu, post_sd = conjugate
    approx = v.fit(n=4000, method="advi", model=model, random_seed=1,
                   progressbar=False,
                   obj_optimizer=v.updates.adam(learning_rate=0.05),
                   obj_n_mc=3)
    assert abs(approx.mean[0] - post_mu) < 0.1
    assert abs(approx.std[0] - post_sd) < 0.05
    assert np.isfinite(approx.hist).all()
    # loss decreased
    assert np.mean(approx.hist[-100:]) < np.mean(approx.hist[:100])


def test_fullrank_conjugate(conjugate):
    model, post_mu, post_sd = conjugate
    approx = v.fit(n=4000, method="fullrank_advi", model=model,
                   random_seed=1, progressbar=False,
                   obj_optimizer=v.updates.adam(learning_rate=0.05),
                   obj_n_mc=3)
    assert abs(approx.mean[0] - post_mu) < 0.15
    assert abs(approx.std[0] - post_sd) < 0.1


def test_svgd(conjugate):
    model, post_mu, post_sd = conjugate
    approx = v.fit(n=400, method="svgd", model=model, progressbar=False,
                   inf_kwargs={"n_particles": 60},
                   obj_optimizer=v.updates.adam(learning_rate=0.1))
    assert abs(approx.mean[0] - post_mu) < 0.3


def test_nfvi(conjugate):
    model, post_mu, post_sd = conjugate
    approx = v.fit(n=4000, method="nfvi=scale-loc", model=model,
                   progressbar=False,
                   obj_optimizer=v.updates.adam(learning_rate=0.05))
    assert abs(approx.mean[0] - post_mu) < 0.15


def test_minibatch_advi():
    """Minibatch ADVI recovers the full-data posterior (baseline config #3:
    logistic-regression-style minibatched VI)."""
    np.random.seed(7)
    N = 2000
    data = (np.random.randn(N) + 1.5).astype(np.float32)
    mb = pm.Minibatch(data, batch_size=100)
    with pm.Model() as model:
        mu = pm.Normal("mu", 0.0, 10.0)
        pm.Normal("obs", mu=mu, sigma=1.0, observed=mb, total_size=N)
    approx = v.fit(n=4000, method="advi", model=model, random_seed=1,
                   progressbar=False,
                   obj_optimizer=v.updates.adam(learning_rate=0.05),
                   obj_n_mc=2)
    post_sd = 1.0 / np.sqrt(1.0 / 100.0 + N)
    assert abs(approx.mean[0] - data.mean()) < 0.1
    # minibatch noise inflates the sd estimate slightly; just sanity-band it
    assert 0.3 * post_sd < approx.std[0] < 5 * post_sd


def test_flow_formula():
    from pymc3_tpu.variational.flows import Formula
    f = Formula("planar*2-radial-loc")
    flows = f.build(3)
    assert len(flows) == 4
    with pytest.raises(ValueError):
        Formula("bogus")


def test_approx_sample_trace(conjugate):
    model, post_mu, _ = conjugate
    approx = v.fit(n=2000, method="advi", model=model, progressbar=False,
                   obj_optimizer=v.updates.adam(learning_rate=0.05))
    tr = approx.sample(400)
    assert len(tr) == 400
    assert "mu" in tr.varnames


def test_fit_dispatch_raises(conjugate):
    model, _, _ = conjugate
    with pytest.raises(KeyError):
        v.fit(10, method="bogus_method", model=model)


def test_tracker_and_convergence(conjugate):
    model, post_mu, _ = conjugate
    tracker = v.callbacks.Tracker(mean=lambda approx, hist, i: approx.mean)
    cb = v.callbacks.CheckParametersConvergence(every=200, tolerance=1e-8)
    approx = v.fit(n=1000, method="advi", model=model, progressbar=False,
                   callbacks=[tracker, cb],
                   obj_optimizer=v.updates.adam(learning_rate=0.05))
    assert len(tracker["mean"]) > 0


def test_optimizers_converge_quadratic():
    """Every update rule must descend a simple quadratic."""
    import jax
    import jax.numpy as jnp
    from pymc3_tpu.variational import updates as u

    target = jnp.asarray([1.0, -2.0, 3.0])

    def loss(p):
        return jnp.sum((p["x"] - target) ** 2)

    for name, opt_f, lr in [
        ("sgd", u.sgd, 0.1), ("momentum", u.momentum, 0.05),
        ("nesterov_momentum", u.nesterov_momentum, 0.05),
        ("adagrad", u.adagrad, 0.5), ("adagrad_window", u.adagrad_window, 0.2),
        ("rmsprop", u.rmsprop, 0.05), ("adadelta", u.adadelta, 20.0),
        ("adam", u.adam, 0.2), ("adamax", u.adamax, 0.2),
    ]:
        opt = opt_f(learning_rate=lr)
        params = {"x": jnp.zeros(3)}
        state = opt.init(params)
        for _ in range(300):
            g = jax.grad(loss)(params)
            params, state = opt.update(g, state, params)
        assert float(loss(params)) < 0.05, (name, params)


def test_asvgd_amortized():
    """ASVGD is the amortized formulation (reference ``inference.py:596``):
    a FullRank sampler trained under KSD via the sampler VJP — not SVGD
    over raw particles."""
    np.random.seed(0)
    data = np.random.randn(100).astype(np.float32) + 2.0
    with pm.Model() as model:
        mu = pm.Normal("mu", 0.0, 10.0)
        sd = pm.HalfNormal("sd", 2.0)
        pm.Normal("obs", mu=mu, sigma=sd, observed=data)
    approx = v.fit(n=2000, method="asvgd", model=model, random_seed=1,
                   progressbar=False,
                   obj_optimizer=v.updates.adam(learning_rate=0.05))
    # trained object is a parametric (FullRank) sampler, not particles
    assert "particles" not in approx.params[0]
    tr = approx.sample(1000)
    assert abs(tr["mu"].mean() - data.mean()) < 0.2
    assert abs(tr["sd"].mean() - data.std()) < 0.4


def test_fit_retraces_after_set_data():
    """set_data between fit() calls must invalidate the cached compiled
    step: the data values are baked into the trace as constants, so a
    stale step would silently keep optimizing against the old data
    (advisor r4; the reference gets this for free from Theano shared
    variables)."""
    np.random.seed(1)
    d1 = (np.random.randn(200) * 0.5 + 3.0).astype(np.float32)
    d2 = (np.random.randn(200) * 0.5 - 3.0).astype(np.float32)
    with pm.Model() as model:
        y = pm.Data("y", d1)
        mu = pm.Normal("mu", 0.0, 10.0)
        pm.Normal("obs", mu=mu, sigma=0.5, observed=y)
        inf = v.ADVI(model=model)
        opt = v.updates.adam(learning_rate=0.1)
        approx = inf.fit(n=1500, progressbar=False, random_seed=1,
                         obj_optimizer=opt)
        assert abs(approx.mean[0] - 3.0) < 0.2
        pm.set_data({"y": d2})
        approx = inf.fit(n=1500, progressbar=False, random_seed=2,
                         obj_optimizer=opt)
    assert abs(approx.mean[0] - (-3.0)) < 0.2


def test_fit_cache_distinguishes_optimizers():
    """Two different optimizer objects must not share a cached step even
    if the first was garbage collected (id() recycling, advisor r4)."""
    np.random.seed(2)
    data = (np.random.randn(100) + 1.0).astype(np.float32)
    with pm.Model() as model:
        mu = pm.Normal("mu", 0.0, 10.0)
        pm.Normal("obs", mu=mu, sigma=1.0, observed=data)
    inf = v.ADVI(model=model)
    inf.fit(n=50, progressbar=False, random_seed=1,
            obj_optimizer=v.updates.adam(learning_rate=0.05))
    cached_step = inf._step_cache[2]
    # fresh optimizer object (the old one is collectable) -> new step
    inf.fit(n=50, progressbar=False, random_seed=1,
            obj_optimizer=v.updates.adam(learning_rate=0.05))
    assert inf._step_cache[2] is not cached_step
    # the SAME object -> cache hit
    opt = v.updates.adam(learning_rate=0.05)
    inf.fit(n=50, progressbar=False, random_seed=1, obj_optimizer=opt)
    cached_step = inf._step_cache[2]
    inf.fit(n=50, progressbar=False, random_seed=2, obj_optimizer=opt)
    assert inf._step_cache[2] is cached_step
