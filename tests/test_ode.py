"""ODE tests (cf. ``pymc3/tests/test_ode.py``: solutions and sensitivities
vs closed form / finite differences)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pymc3_tpu as pm
from pymc3_tpu.ode import DifferentialEquation
from pymc3_tpu.node import evaluate


def test_exponential_decay_solution():
    """dy/dt = -a y has closed form y0 exp(-a t)."""
    times = np.linspace(0.25, 4, 12)
    ode = DifferentialEquation(
        func=lambda y, t, p: -p[0] * y[0],
        times=times, n_states=1, n_theta=1, t0=0, n_substeps=8)
    sol = ode(y0=[1.0], theta=[0.7])
    vals = np.asarray(evaluate(sol, {})).ravel()
    np.testing.assert_allclose(vals, np.exp(-0.7 * times), rtol=1e-4)


def test_gradients_vs_finite_difference():
    times = np.linspace(0.5, 3, 6)
    ode = DifferentialEquation(
        func=lambda y, t, p: -p[0] * y[0],
        times=times, n_states=1, n_theta=1, n_substeps=8)

    def loss(a):
        return jnp.sum(ode._solve(jnp.array([1.0]), jnp.array([a])) ** 2)

    g = float(jax.grad(loss)(0.5))
    eps = 1e-3
    fd = (float(loss(0.5 + eps)) - float(loss(0.5 - eps))) / (2 * eps)
    assert abs(g - fd) < 1e-2


def test_freefall_inference():
    """1-state 2-param freefall model (the benchmark ODE,
    cf. ``benchmarks.py:214-263``)."""
    g_true, gamma_true = 9.8, 0.4
    times = np.arange(0.5, 5, 0.5)

    def freefall(y, t, p):
        return 2.0 * p[1] - p[0] * y[0]

    # closed form: dy/dt = g - gamma y  =>  (g/gamma)(1 - exp(-gamma t))
    y_exact = (g_true / gamma_true) * (1 - np.exp(-gamma_true * times))
    np.random.seed(5)
    obs = (y_exact + np.random.normal(0, 1, len(times))).astype(np.float32)

    ode = DifferentialEquation(func=freefall, times=times, n_states=1,
                               n_theta=2, n_substeps=6)
    with pm.Model() as model:
        sigma = pm.HalfCauchy("sigma", 1)
        gamma = pm.Lognormal("gamma", 0, 1)
        ode_sol = ode(y0=[0.0], theta=[gamma, g_true / 2.0])
        pm.Normal("obs", mu=ode_sol.ravel(), sigma=sigma, observed=obs)
        trace = pm.sample(draws=400, tune=400, chains=2, progressbar=False,
                          random_seed=6, compute_convergence_checks=False)
    assert abs(trace["gamma"].mean() - gamma_true) < 0.15


def test_validation_errors():
    with pytest.raises(ValueError):
        DifferentialEquation(func=lambda y, t, p: -y, times=[3, 2, 1],
                             n_states=1, n_theta=1)
    with pytest.raises(ValueError):
        DifferentialEquation(func="notcallable", times=[1, 2],
                             n_states=1, n_theta=1)
    with pytest.raises(ValueError):
        DifferentialEquation(func=lambda y, t, p: -y, times=[1, 2],
                             n_states=0, n_theta=1)
