"""ODE API grid mirroring the reference's ``pymc3/tests/test_ode.py:303``
``TestDiffEqModel`` surface: scalar/vector ODE x 1/2-parameter cells
solved against scipy, sampled end-to-end with NUTS, plus the full
validation-error matrix (``:246-281``)."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu.ode import DifferentialEquation
from pymc3_tpu.node import evaluate


def _solve(ode, y0, theta):
    return np.asarray(evaluate(ode(y0=y0, theta=theta), {}))


class TestSolutionsVsScipy:
    """Solution grid: each cell vs scipy.integrate.odeint."""

    def _scipy(self, func, y0, theta, times, t0=0.0):
        from scipy.integrate import solve_ivp
        out = solve_ivp(lambda t, y: np.atleast_1d(func(y, t, theta)),
                        (t0, times[-1]), np.atleast_1d(y0), t_eval=times,
                        rtol=1e-8, atol=1e-8)
        return out.y.T

    def test_scalar_ode_1_param(self):
        func = lambda y, t, p: -p[0] * y[0]
        times = np.linspace(0.25, 4.0, 9)
        ode = DifferentialEquation(func=func, times=times, n_states=1,
                                   n_theta=1)
        got = _solve(ode, [2.0], [0.6]).reshape(-1, 1)
        np.testing.assert_allclose(got, self._scipy(func, [2.0], [0.6],
                                                    times), rtol=2e-4,
                                   atol=2e-4)

    def test_scalar_ode_2_param(self):
        func = lambda y, t, p: p[0] - p[1] * y[0]   # freefall with drag
        times = np.linspace(0.5, 5.0, 8)
        ode = DifferentialEquation(func=func, times=times, n_states=1,
                                   n_theta=2)
        got = _solve(ode, [0.0], [9.8, 0.4]).reshape(-1, 1)
        np.testing.assert_allclose(
            got, self._scipy(func, [0.0], [9.8, 0.4], times), rtol=2e-4,
            atol=2e-4)

    def test_vector_ode_1_param(self):
        # SIR without recovery: dS = -b S I, dI = b S I
        def func(y, t, p):
            return [-p[0] * y[0] * y[1], p[0] * y[0] * y[1]]
        times = np.linspace(0.2, 3.0, 7)
        ode = DifferentialEquation(func=func, times=times, n_states=2,
                                   n_theta=1)
        got = _solve(ode, [0.99, 0.01], [2.0]).reshape(-1, 2)
        np.testing.assert_allclose(
            got, self._scipy(func, [0.99, 0.01], [2.0], times), rtol=5e-4,
            atol=5e-4)

    def test_vector_ode_2_param(self):
        # SIR with recovery
        def func(y, t, p):
            return [-p[0] * y[0] * y[1], p[0] * y[0] * y[1] - p[1] * y[1]]
        times = np.linspace(0.2, 3.0, 7)
        ode = DifferentialEquation(func=func, times=times, n_states=2,
                                   n_theta=2)
        got = _solve(ode, [0.99, 0.01], [2.0, 0.5]).reshape(-1, 2)
        np.testing.assert_allclose(
            got, self._scipy(func, [0.99, 0.01], [2.0, 0.5], times),
            rtol=5e-4, atol=5e-4)


class TestValidationMatrix:
    times = np.linspace(0.1, 1.0, 5)

    def _ode(self):
        return DifferentialEquation(
            func=lambda y, t, p: -p[0] * y[0], times=self.times,
            n_states=1, n_theta=1)

    def test_too_many_params(self):
        with pytest.raises(ValueError, match="theta"):
            self._ode()(y0=[1.0], theta=[1.0, 2.0])

    def test_too_few_params(self):
        ode = DifferentialEquation(
            func=lambda y, t, p: p[0] * p[1] - y[0], times=self.times,
            n_states=1, n_theta=2)
        with pytest.raises(ValueError, match="theta"):
            ode(y0=[1.0], theta=[1.0])

    def test_too_many_y0(self):
        with pytest.raises(ValueError, match="y0"):
            self._ode()(y0=[1.0, 2.0], theta=[1.0])

    def test_too_few_y0(self):
        ode = DifferentialEquation(
            func=lambda y, t, p: [-p[0] * y[0], y[0] - y[1]],
            times=self.times, n_states=2, n_theta=1)
        with pytest.raises(ValueError, match="y0"):
            ode(y0=[1.0], theta=[1.0])

    def test_func_must_be_callable(self):
        with pytest.raises(ValueError, match="callable"):
            DifferentialEquation(func=1, times=self.times, n_states=1,
                                 n_theta=1)

    def test_n_states_positive(self):
        with pytest.raises(ValueError, match="n_states"):
            DifferentialEquation(func=lambda y, t, p: -y[0],
                                 times=self.times, n_states=0, n_theta=1)

    def test_n_theta_positive(self):
        with pytest.raises(ValueError, match="n_theta"):
            DifferentialEquation(func=lambda y, t, p: -y[0],
                                 times=self.times, n_states=1, n_theta=0)

    def test_t0_after_first_obs_rejected(self):
        with pytest.raises(ValueError, match="t0"):
            DifferentialEquation(func=lambda y, t, p: -p[0] * y[0],
                                 times=self.times, n_states=1, n_theta=1,
                                 t0=0.5)


def test_scalar_ode_sampling_recovers_rate():
    """End-to-end NUTS through the ODE op (reference
    ``test_scalar_ode_1_param`` with sampling)."""
    rng = np.random.default_rng(8)
    times = np.linspace(0.25, 3.0, 8)
    true_a = 0.8
    y_obs = np.exp(-true_a * times) + rng.normal(scale=0.01, size=8)
    ode = DifferentialEquation(func=lambda y, t, p: -p[0] * y[0],
                               times=times, n_states=1, n_theta=1)
    with pm.Model() as m:
        a = pm.Lognormal("a", mu=0.0, sigma=1.0)
        sol = ode(y0=[1.0], theta=[a])
        pm.Normal("obs", mu=sol.reshape((8,)), sigma=0.01,
                  observed=y_obs)
        tr = pm.sample(draws=150, tune=150, chains=2, progressbar=False,
                       compute_convergence_checks=False, random_seed=9)
    assert abs(tr["a"].mean() - true_a) < 0.05
