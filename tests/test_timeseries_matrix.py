"""Parameter-domain sweeps for the timeseries distributions — the depth
pass over ``distributions/timeseries.py`` (cf. the reference's
``tests/test_distributions_timeseries.py`` plus the Domain methodology
of ``test_distributions.py``). The single-param-set pins live in
``test_distributions_extra.py``; this file sweeps grids, longer series,
and random()/logp consistency."""
import itertools

import numpy as np
import pytest
import scipy.stats as st

import pymc3_tpu as pm
from pymc3_tpu.config import floatX


def _logp(d, x):
    return np.asarray(d.logp(np.asarray(x, dtype=floatX())))


def TOL():
    return 1e-6 if floatX() == "float64" else 2e-3


SERIES = np.array([0.3, -0.2, 0.5, 0.1, -0.4, 0.8, -0.6, 0.2, 0.0, 0.4,
                   -0.1, 0.25], dtype=np.float32)


class TestAR1Matrix:
    @pytest.mark.parametrize("k", [-0.9, -0.3, 0.0, 0.5, 0.95])
    @pytest.mark.parametrize("tau_e", [0.25, 1.0, 4.0])
    def test_logp_grid(self, k, tau_e):
        d = pm.AR1.dist(k=k, tau_e=tau_e)
        tau = tau_e * (1 - k ** 2)
        want = np.empty(len(SERIES))
        want[0] = st.norm.logpdf(SERIES[0], 0.0, 1.0 / np.sqrt(tau))
        want[1:] = st.norm.logpdf(SERIES[1:], k * SERIES[:-1],
                                  1.0 / np.sqrt(tau_e))
        np.testing.assert_allclose(_logp(d, SERIES), want,
                                   rtol=TOL(), atol=TOL(), err_msg=str((k, tau_e)))

    def test_stationary_moments_via_sampling(self):
        """Sampling an AR1 prior under NUTS recovers its stationary
        variance 1/(tau_e (1-k^2))."""
        k, tau_e = 0.7, 2.0
        with pm.Model() as m:
            pm.AR1("y", k=k, tau_e=tau_e, shape=200)
        tr = pm.sample(draws=800, tune=500, chains=4, model=m,
                       progressbar=False, random_seed=1,
                       compute_convergence_checks=False)
        y = tr["y"]
        stat_var = 1.0 / (tau_e * (1 - k ** 2))
        np.testing.assert_allclose(y.var(), stat_var, rtol=0.15)
        # lag-1 autocorrelation = k
        r1 = np.mean(y[:, 1:] * y[:, :-1]) / y.var()
        np.testing.assert_allclose(r1, k, atol=0.08)


class TestARMatrix:
    @pytest.mark.parametrize("rho,constant", [
        ([0.5], False), ([0.9], False), ([-0.6], False),
        ([0.5, -0.3], False), ([0.2, 0.1, -0.2], False),
        ([0.7, 0.5], True), ([0.1, 0.4, -0.2, 0.1], True),
    ])
    @pytest.mark.parametrize("sigma", [0.5, 1.7])
    def test_logp_grid(self, rho, constant, sigma):
        rho = np.array(rho, dtype=np.float32)
        d = pm.AR.dist(rho=rho, sigma=sigma, constant=constant,
                       shape=len(SERIES))
        if constant:
            const, phis = rho[0], rho[1:]
        else:
            const, phis = 0.0, rho
        p = len(phis)
        mean = np.full(len(SERIES) - p, const, dtype=np.float64)
        for i, phi in enumerate(phis):
            mean += phi * SERIES[p - 1 - i:len(SERIES) - 1 - i]
        want = st.norm.logpdf(SERIES[p:], mean, sigma).sum()
        np.testing.assert_allclose(float(np.sum(_logp(d, SERIES))), want,
                                   rtol=TOL(), atol=TOL() * 10)


class TestGRWMatrix:
    @pytest.mark.parametrize("mu", [-0.5, 0.0, 0.3])
    @pytest.mark.parametrize("sigma", [0.25, 1.0, 3.0])
    def test_logp_grid(self, mu, sigma):
        d = pm.GaussianRandomWalk.dist(mu=mu, sigma=sigma,
                                       shape=len(SERIES))
        want = st.norm.logpdf(SERIES[1:], SERIES[:-1] + mu, sigma).sum()
        np.testing.assert_allclose(float(np.sum(_logp(d, SERIES))), want,
                                   rtol=TOL(), atol=TOL() * 10)

    def test_random_increments(self):
        d = pm.GaussianRandomWalk.dist(mu=0.5, sigma=2.0, shape=2000)
        y = np.asarray(d.random())
        inc = np.diff(np.asarray(y, np.float64))
        np.testing.assert_allclose(inc.mean(), 0.5, atol=0.2)
        np.testing.assert_allclose(inc.std(), 2.0, rtol=0.1)


class TestGARCHMatrix:
    @pytest.mark.parametrize("omega,a1,b1", [
        (0.1, 0.1, 0.8), (0.5, 0.4, 0.3), (1.0, 0.05, 0.9),
    ])
    @pytest.mark.parametrize("iv", [0.5, 1.0])
    def test_logp_grid(self, omega, a1, b1, iv):
        d = pm.GARCH11.dist(omega=omega, alpha_1=a1, beta_1=b1,
                            initial_vol=iv, shape=len(SERIES))
        vol2 = np.empty(len(SERIES))
        vol2[0] = iv * iv
        for t in range(1, len(SERIES)):
            vol2[t] = omega + a1 * SERIES[t - 1] ** 2 + b1 * vol2[t - 1]
        want = st.norm.logpdf(SERIES, 0.0, np.sqrt(vol2))
        np.testing.assert_allclose(_logp(d, SERIES), want,
                                   rtol=TOL(), atol=TOL())


class TestEulerMaruyamaMatrix:
    @pytest.mark.parametrize("dt", [0.01, 0.1, 0.5])
    @pytest.mark.parametrize("theta,s", [(0.5, 0.3), (2.0, 1.0)])
    def test_ou_grid(self, dt, theta, s):
        def ou(x, theta, s):
            return -theta * x, s
        d = pm.EulerMaruyama.dist(dt=dt, sde_fn=ou, sde_pars=(theta, s),
                                  shape=len(SERIES))
        mu = SERIES[:-1] + dt * (-theta * SERIES[:-1])
        want = st.norm.logpdf(SERIES[1:], mu, np.sqrt(dt) * s)
        np.testing.assert_allclose(_logp(d, SERIES), want,
                                   rtol=TOL(), atol=TOL())


class TestMvRandomWalkMatrix:
    COVS = [np.eye(2), np.array([[1.0, 0.3], [0.3, 2.0]]),
            np.array([[2.0, -0.9], [-0.9, 0.5]])]

    @pytest.mark.parametrize("cov", COVS, ids=["eye", "pos", "neg"])
    def test_mv_grw(self, cov):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(6, 2)).astype(np.float32)
        d = pm.MvGaussianRandomWalk.dist(mu=np.zeros(2), cov=cov,
                                         shape=(6, 2))
        want = st.multivariate_normal.logpdf(
            np.asarray(x[1:], np.float64) - np.asarray(x[:-1], np.float64),
            np.zeros(2), cov).sum()
        np.testing.assert_allclose(float(np.sum(_logp(d, x))), want,
                                   rtol=3e-3, atol=3e-3)

    @pytest.mark.parametrize("nu", [3.0, 10.0])
    def test_mv_studentt_rw(self, nu):
        cov = np.array([[1.0, 0.3], [0.3, 2.0]])
        rng = np.random.default_rng(8)
        x = rng.normal(size=(5, 2)).astype(np.float32)
        d = pm.MvStudentTRandomWalk.dist(nu=nu, mu=np.zeros(2), cov=cov,
                                         shape=(5, 2))
        diffs = np.asarray(x[1:], np.float64) - np.asarray(x[:-1], np.float64)
        # multivariate-t logpdf by hand
        k = 2
        chol = np.linalg.cholesky(cov)
        sol = np.linalg.solve(chol, diffs.T).T
        q = np.sum(sol ** 2, axis=1)
        from scipy.special import gammaln
        want = (gammaln((nu + k) / 2) - gammaln(nu / 2)
                - 0.5 * k * np.log(nu * np.pi)
                - np.log(np.diag(chol)).sum()
                - (nu + k) / 2 * np.log1p(q / nu)).sum()
        np.testing.assert_allclose(float(np.sum(_logp(d, x))), want,
                                   rtol=3e-3, atol=3e-3)


class TestTimeseriesInModel:
    def test_garch_posterior_recovers_persistence(self):
        """GARCH11 under NUTS on synthetic data: posterior alpha+beta
        (persistence) lands near truth."""
        rng = np.random.default_rng(0)
        n = 400
        omega_t, a_t, b_t = 0.1, 0.25, 0.65
        vol2 = np.empty(n); r = np.empty(n)
        vol2[0] = omega_t / (1 - a_t - b_t)
        r[0] = rng.normal(0, np.sqrt(vol2[0]))
        for t in range(1, n):
            vol2[t] = omega_t + a_t * r[t - 1] ** 2 + b_t * vol2[t - 1]
            r[t] = rng.normal(0, np.sqrt(vol2[t]))
        with pm.Model() as m:
            a1 = pm.Uniform("a1", 0.0, 1.0)
            b1 = pm.Uniform("b1", 0.0, 1.0)
            om = pm.HalfNormal("om", 0.5)
            pm.GARCH11("r", omega=om, alpha_1=a1, beta_1=b1,
                       initial_vol=np.sqrt(vol2[0]), shape=n,
                       observed=r.astype(np.float32))
        tr = pm.sample(draws=500, tune=500, chains=2, model=m,
                       progressbar=False, random_seed=3,
                       nuts={"target_accept": 0.9},
                       compute_convergence_checks=False)
        persistence = (tr["a1"] + tr["b1"]).mean()
        assert 0.6 < persistence < 1.05, persistence
