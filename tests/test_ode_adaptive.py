"""Adaptive (DOPRI5) ODE solver: accuracy on stiff systems where fixed-grid
RK4 visibly fails, and native gradients (cf. reference LSODA adaptivity,
``pymc3/ode/ode.py:110-120``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import odeint as scipy_odeint

import pymc3_tpu as pm
from pymc3_tpu.ode import DifferentialEquation


def test_adaptive_matches_scipy_nonstiff():
    def freefall(y, t, p):
        return 2.0 * p[1] - p[0] * y[0]

    times = np.arange(0.5, 5.0, 0.5)
    ode = DifferentialEquation(freefall, times, n_states=1, n_theta=2,
                               method="rk45")
    got = np.asarray(ode._solve(np.array([0.0]), np.array([0.5, 2.0])))
    ref = scipy_odeint(lambda y, t, p: 2.0 * p[1] - p[0] * y[0], [0.0],
                       np.concatenate([[0.0], times]),
                       args=(np.array([0.5, 2.0]),))[1:]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_stiff_system_rk4_fails_rk45_succeeds():
    """y' = -lam (y - cos t): with lam=60 and 4 substeps over dt=0.5, RK4's
    stability bound (|lam h| <~ 2.78) is violated (lam*h = 7.5) and the
    fixed-grid solution explodes; the adaptive solver shrinks the step and
    stays accurate — exactly the LSODA capability the reference relies on."""
    lam = 60.0

    def stiff(y, t, p):
        return -p[0] * (y[0] - jnp.cos(t))

    times = np.arange(0.5, 3.0, 0.5)
    ref = scipy_odeint(
        lambda y, t, p: -p[0] * (y[0] - np.cos(t)), [1.0],
        np.concatenate([[0.0], times]), args=(np.array([lam]),))[1:]

    rk4 = DifferentialEquation(stiff, times, n_states=1, n_theta=1,
                               method="rk4", n_substeps=4)
    bad = np.asarray(rk4._solve(np.array([1.0]), np.array([lam])))
    assert (~np.isfinite(bad)).any() or np.max(np.abs(bad - ref)) > 1.0

    rk45 = DifferentialEquation(stiff, times, n_states=1, n_theta=1,
                                method="rk45")
    good = np.asarray(rk45._solve(np.array([1.0]), np.array([lam])))
    np.testing.assert_allclose(good, ref, rtol=1e-3, atol=1e-3)


def test_adaptive_gradients_vs_finite_difference():
    def freefall(y, t, p):
        return 2.0 * p[1] - p[0] * y[0]

    times = np.arange(0.5, 5.0, 0.5)
    ode = DifferentialEquation(freefall, times, n_states=1, n_theta=2,
                               method="rk45")

    def total(th):
        return ode._solve(jnp.array([0.0]), th).sum()

    g = np.asarray(jax.grad(total)(jnp.array([0.5, 2.0])))
    eps = 1e-3

    def s(th):
        return float(total(jnp.asarray(th)))

    fd = np.array([
        (s([0.5 + eps, 2.0]) - s([0.5 - eps, 2.0])) / (2 * eps),
        (s([0.5, 2.0 + eps]) - s([0.5, 2.0 - eps])) / (2 * eps)])
    np.testing.assert_allclose(g, fd, rtol=2e-3, atol=2e-3)


def test_max_steps_exhaustion_poisons_with_nan():
    """Running out of steps must yield NaN (-> -inf logp), never a silently
    wrong solution."""
    def stiff(y, t, p):
        return -p[0] * (y[0] - jnp.cos(t))

    times = np.arange(0.5, 3.0, 0.5)
    ode = DifferentialEquation(stiff, times, n_states=1, n_theta=1,
                               method="rk45", max_steps=3)
    out = np.asarray(ode._solve(np.array([1.0]), np.array([60.0])))
    assert np.isnan(out[-1]).all()


def test_adaptive_in_model_logp():
    def freefall(y, t, p):
        return 2.0 * p[1] - p[0] * y[0]

    times = np.arange(0.5, 5.0, 0.5)
    ode = DifferentialEquation(freefall, times, n_states=1, n_theta=2,
                               method="rk45")
    rng = np.random.default_rng(0)
    ref = scipy_odeint(lambda y, t, p: 2.0 * p[1] - p[0] * y[0], [0.0],
                       np.concatenate([[0.0], times]),
                       args=(np.array([0.5, 2.0]),))[1:]
    yobs = ref.ravel() + rng.normal(0, 0.1, ref.size)
    with pm.Model() as m:
        gamma = pm.Lognormal("gamma", 0.0, 0.5)
        g = pm.Lognormal("g", 0.5, 0.5)
        sigma = pm.HalfNormal("sigma", 1.0)
        sol = ode(y0=[0.0], theta=[gamma, g])
        pm.Normal("obs", mu=sol[:, 0], sigma=sigma, observed=yobs)
    lp = m.logp(m.test_point)
    assert np.isfinite(lp)
    # gradient of the whole posterior through the adaptive solver
    grad = m.dlogp()
    assert np.all(np.isfinite(grad))


def test_t0_equal_first_observation():
    """The reference's freefall asv benchmark integrates with
    t0 == times[0] (``benchmarks.py:225``): the first output row is the
    initial condition."""
    import scipy.integrate as si

    def freefall(y, t, p):
        return 2.0 * p[1] - p[0] * y[0]

    times = np.arange(0, 10, 0.5)
    ode = pm.ode.DifferentialEquation(func=freefall, times=times,
                                      n_states=1, n_theta=2, t0=0)
    sol = np.asarray(ode._solve(np.array([0.0]), np.array([0.4, 9.8])))
    ref = si.odeint(freefall, [0.0], times, args=((0.4, 9.8),))
    assert sol[0, 0] == 0.0
    np.testing.assert_allclose(sol, ref, atol=1e-2)
    with pytest.raises(ValueError):
        pm.ode.DifferentialEquation(func=freefall, times=np.array([0.0]),
                                    n_states=1, n_theta=2, t0=0)


def test_calibration_covers_stiffer_parameter_regions():
    """Auto max_steps must budget for posterior draws stiffer than the
    test point (advisor r4: a test-point-only bound NaN-rejects stiffer
    draws, silently truncating the posterior). The calibration probes
    theta at x0.5/x1/x2, so a draw at twice the test-point decay rate
    must still complete within the bound."""
    def decay(y, t, p):
        return -p[0] * y[0]

    times = np.arange(0.25, 6.0, 0.25)
    ode = DifferentialEquation(decay, times, n_states=1, n_theta=1,
                               method="rk45")
    stats = ode.calibrate(np.array([1.0]), np.array([20.0]))
    assert stats["complete"]
    assert ode.max_steps >= 4 * len(times)
    # a posterior draw at 2x the test-point rate completes un-poisoned
    sol = np.asarray(ode._solve(jnp.asarray([1.0]), jnp.asarray([40.0])))
    assert np.isfinite(sol).all()
    np.testing.assert_allclose(
        sol[:, 0], np.exp(-40.0 * times), atol=1e-4)
