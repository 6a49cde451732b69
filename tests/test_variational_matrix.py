"""VI driver/observability matrix (cf. the reference's
``tests/test_variational_inference.py`` coverage beyond the ELBO grid:
Tracker under fit, refine() continuation, sample_node, callbacks,
Empirical-from-trace, and gradient clipping)."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu import variational as v
from pymc3_tpu.variational.approximations import Empirical
from pymc3_tpu.variational.callbacks import (CheckParametersConvergence,
                                             Tracker)


@pytest.fixture(scope="module")
def conj():
    rng = np.random.RandomState(7)
    data = (rng.randn(120) * 1.0 + 2.5).astype(np.float32)
    with pm.Model() as model:
        mu = pm.Normal("mu", 0.0, 10.0)
        pm.Normal("obs", mu=mu, sigma=1.0, observed=data)
    n = len(data)
    post_var = 1.0 / (1.0 / 100.0 + n)
    post_mu = post_var * data.sum()
    return model, post_mu, np.sqrt(post_var)


def test_tracker_under_fit(conj):
    """Tracker records per-callback-tick snapshots of live quantities
    (cf. reference ``Tracker`` + ``test_tracker_callback``)."""
    model, post_mu, _ = conj
    tracker = Tracker(mean=lambda approx, *_: np.asarray(approx.mean).copy(),
                      i=lambda approx, hist, i: i)
    approx = v.fit(n=1000, method="advi", model=model, random_seed=1,
                   progressbar=False, block=100, callbacks=[tracker],
                   obj_optimizer=v.updates.adam(learning_rate=0.1))
    assert len(tracker["mean"]) == 10  # one per 100-step block
    assert tracker["i"] == [100 * k for k in range(1, 11)]
    # the tracked trajectory ends at the fitted solution
    np.testing.assert_allclose(tracker["mean"][-1], approx.mean)
    # and the trajectory stays in the posterior's neighborhood
    assert abs(float(tracker["mean"][-1][0]) - post_mu) < 0.3
    tracker.clear()
    assert len(tracker["mean"]) == 0


def test_refine_continues_from_fit(conj):
    """refine() keeps optimizing the same objective from the current
    params/optimizer state (cf. reference ``Inference.refine``,
    ``inference.py:277``) and reuses the compiled step."""
    model, post_mu, post_sd = conj
    with model:
        inf = v.ADVI()
    opt = v.updates.adam(learning_rate=0.05)
    inf.fit(n=300, progressbar=False, random_seed=1, obj_optimizer=opt)
    step_before = inf._step_cache[2]
    hist_len = len(inf.hist)
    approx = inf.refine(2000, progressbar=False)
    assert inf._step_cache[2] is step_before  # no retrace
    assert len(inf.hist) == hist_len + 2000   # loss history accumulates
    assert abs(float(approx.mean[0]) - post_mu) < 0.15
    assert abs(float(approx.std[0]) - post_sd) < 0.1


def test_check_parameters_convergence_stops_early(conj):
    """CheckParametersConvergence raises StopIteration once the flat
    parameter vector stalls; fit() treats it as clean convergence
    (cf. reference ``callbacks.py:45`` and ``Inference.fit`` handling)."""
    model, _, _ = conj
    cb = CheckParametersConvergence(every=100, diff="absolute",
                                    tolerance=1e-2)
    approx = v.fit(n=50000, method="advi", model=model, random_seed=1,
                   progressbar=False, block=100, callbacks=[cb],
                   obj_optimizer=v.updates.adam(learning_rate=0.1))
    # converged long before the 50k budget
    assert len(approx.hist) < 50000


def test_sample_node_posterior_expectation(conj):
    """sample_node evaluates a symbolic node under q-draws
    (cf. reference ``opvi.py:1522``): E_q[mu^2] ~= mu_post^2 + sd^2."""
    model, post_mu, post_sd = conj
    approx = v.fit(n=3000, method="advi", model=model, random_seed=1,
                   progressbar=False,
                   obj_optimizer=v.updates.adam(learning_rate=0.05))
    mu_rv = model["mu"]
    expect = approx.sample_node(mu_rv * mu_rv)
    assert abs(float(expect) - (post_mu ** 2 + post_sd ** 2)) < 0.5
    draws = approx.sample_node(mu_rv, size=4000)
    assert draws.shape == (4000,)
    assert abs(draws.mean() - post_mu) < 0.1


def test_empirical_from_trace(conj):
    """Empirical wraps an MCMC trace as a particle approximation
    (cf. reference ``Empirical(trace)``, ``approximations.py:228``)."""
    model, post_mu, post_sd = conj
    with model:
        trace = pm.sample(draws=400, tune=300, chains=2, progressbar=False,
                          random_seed=1, compute_convergence_checks=False)
    approx = Empirical(trace, model=model)
    assert abs(float(approx.mean[0]) - post_mu) < 0.1
    assert abs(float(approx.std[0]) - post_sd) < 0.1
    tr2 = approx.sample(500)
    assert abs(np.mean(tr2["mu"]) - post_mu) < 0.15


def test_total_grad_norm_constraint(conj):
    """Gradient clipping plumbs through (cf. reference
    ``total_norm_constraint``, ``updates.py:1044``): fit still converges
    with a tight clip."""
    model, post_mu, _ = conj
    approx = v.fit(n=3000, method="advi", model=model, random_seed=1,
                   progressbar=False, total_grad_norm_constraint=1.0,
                   obj_optimizer=v.updates.adam(learning_rate=0.1))
    assert abs(float(approx.mean[0]) - post_mu) < 0.2


def test_fit_seed_reproducibility(conj):
    """Same seed + same optimizer config -> identical loss history
    (cf. reference seeded-fit tests)."""
    model, _, _ = conj
    runs = []
    for _ in range(2):
        approx = v.fit(n=200, method="advi", model=model, random_seed=99,
                       progressbar=False,
                       obj_optimizer=v.updates.adam(learning_rate=0.05))
        runs.append(np.asarray(approx.hist))
    np.testing.assert_allclose(runs[0], runs[1])
