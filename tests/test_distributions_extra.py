"""Exact-math logp tests for discrete, multivariate, timeseries, mixture and
bounded distributions vs scipy / hand-rolled recursions — extending
tests/test_distributions.py to the full library, following the coverage
pattern of ``pymc3/tests/test_distributions.py`` (domains x params, both
pmf interior and out-of-support points)."""
import itertools

import numpy as np
import pytest
import scipy.stats as st
import scipy.special as sp

import pymc3_tpu as pm

TOL = 1e-3  # float32 build (cf. select_by_precision(float32=3))


def _logp(dist, value):
    return np.asarray(dist.logp(np.asarray(value)))


def check_logp(dist, values, want, tol=TOL):
    got = _logp(dist, values)
    want = np.asarray(want, dtype=np.float64)
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=tol, atol=tol)
    # out-of-support must be -inf (or at least hugely negative)
    assert np.all(~np.isfinite(got[~finite]) | (got[~finite] < -1e6))


def check_logcdf(dist, values, want, tol=TOL):
    got = np.asarray(dist.logcdf(np.asarray(values)))
    want = np.asarray(want, dtype=np.float64)
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=tol, atol=tol)


NatSmall = np.array([0, 1, 2, 3, 5, 8, 13, 20])
NatBad = np.array([-2, -1])


class TestDiscreteLogp:
    def test_binomial(self):
        for n, p in itertools.product([5, 20], [0.1, 0.5, 0.9]):
            vals = np.arange(0, n + 1, max(1, n // 7))
            d = pm.Binomial.dist(n=n, p=p)
            check_logp(d, vals, st.binom.logpmf(vals, n, p))
            check_logcdf(d, vals, st.binom.logcdf(vals, n, p))
        d = pm.Binomial.dist(n=5, p=0.5)
        assert np.all(_logp(d, np.array([-1, 6])) < -1e6)

    def test_betabinomial(self):
        for n, a, b in [(10, 0.5, 0.5), (20, 2.0, 5.0), (5, 1.0, 1.0)]:
            vals = np.arange(0, n + 1, max(1, n // 7))
            d = pm.BetaBinomial.dist(alpha=a, beta=b, n=n)
            check_logp(d, vals, st.betabinom.logpmf(vals, n, a, b))

    def test_bernoulli(self):
        for p in [0.1, 0.5, 0.9]:
            d = pm.Bernoulli.dist(p=p)
            check_logp(d, [0, 1], st.bernoulli.logpmf([0, 1], p))
            check_logcdf(d, [0, 1], st.bernoulli.logcdf([0, 1], p))
        d = pm.Bernoulli.dist(logit_p=0.7)
        p = sp.expit(0.7)
        check_logp(d, [0, 1], st.bernoulli.logpmf([0, 1], p))

    def test_discrete_weibull(self):
        q, beta = 0.8, 1.5
        d = pm.DiscreteWeibull.dist(q=q, beta=beta)
        vals = NatSmall
        want = np.log(q ** (vals ** beta) - q ** ((vals + 1.0) ** beta))
        check_logp(d, vals, want)

    def test_poisson(self):
        for mu in [0.5, 3.0, 20.0]:
            d = pm.Poisson.dist(mu=mu)
            check_logp(d, NatSmall, st.poisson.logpmf(NatSmall, mu))
            check_logcdf(d, NatSmall, st.poisson.logcdf(NatSmall, mu))

    def test_negative_binomial(self):
        for mu, alpha in [(1.0, 0.5), (5.0, 2.0), (20.0, 10.0)]:
            d = pm.NegativeBinomial.dist(mu=mu, alpha=alpha)
            n, p = alpha, alpha / (mu + alpha)
            check_logp(d, NatSmall, st.nbinom.logpmf(NatSmall, n, p))

    def test_geometric(self):
        for p in [0.1, 0.5, 0.9]:
            vals = np.array([1, 2, 3, 5, 8, 13, 20, 40])
            d = pm.Geometric.dist(p=p)
            check_logp(d, vals, st.geom.logpmf(vals, p))
            check_logcdf(d, vals, st.geom.logcdf(vals, p))

    def test_discrete_uniform(self):
        lower, upper = -2, 5
        vals = np.arange(lower, upper + 1)
        d = pm.DiscreteUniform.dist(lower=lower, upper=upper)
        check_logp(d, vals, st.randint.logpmf(vals, lower, upper + 1))
        check_logcdf(d, vals, st.randint.logcdf(vals, lower, upper + 1))
        assert np.all(_logp(d, np.array([lower - 1, upper + 1])) < -1e6)

    def test_categorical(self):
        p = np.array([0.1, 0.2, 0.3, 0.4])
        d = pm.Categorical.dist(p=p)
        check_logp(d, np.arange(4), np.log(p))
        assert np.all(_logp(d, np.array([-1, 4])) < -1e6)
        # unnormalized p is renormalized (reference behavior)
        d2 = pm.Categorical.dist(p=2.0 * p)
        check_logp(d2, np.arange(4), np.log(p))

    def test_constant(self):
        d = pm.Constant.dist(c=3)
        got = _logp(d, np.array([3, 3]))
        np.testing.assert_allclose(got, 0.0)
        assert np.all(_logp(d, np.array([2, 4])) < -1e6)

    def test_zero_inflated_poisson(self):
        psi, theta = 0.7, 3.0
        d = pm.ZeroInflatedPoisson.dist(psi=psi, theta=theta)
        want = np.log(psi * st.poisson.pmf(NatSmall, theta)
                      + (1 - psi) * (NatSmall == 0))
        check_logp(d, NatSmall, want)

    def test_zero_inflated_binomial(self):
        psi, n, p = 0.6, 10, 0.4
        vals = np.arange(0, 11, 2)
        d = pm.ZeroInflatedBinomial.dist(psi=psi, n=n, p=p)
        want = np.log(psi * st.binom.pmf(vals, n, p)
                      + (1 - psi) * (vals == 0))
        check_logp(d, vals, want)

    def test_zero_inflated_negative_binomial(self):
        psi, mu, alpha = 0.75, 4.0, 2.0
        n, p = alpha, alpha / (mu + alpha)
        d = pm.ZeroInflatedNegativeBinomial.dist(psi=psi, mu=mu, alpha=alpha)
        want = np.log(psi * st.nbinom.pmf(NatSmall, n, p)
                      + (1 - psi) * (NatSmall == 0))
        check_logp(d, NatSmall, want)

    def test_ordered_logistic(self):
        eta = 0.7
        cut = np.array([-1.0, 0.5, 2.0])
        d = pm.OrderedLogistic.dist(eta=eta, cutpoints=cut)
        pa = sp.expit(cut - eta)
        p_cum = np.concatenate([[0.0], pa, [1.0]])
        probs = np.diff(p_cum)
        check_logp(d, np.arange(4), np.log(probs))


class TestMultivariateLogp:
    mu = np.array([0.5, -0.3, 1.2])
    cov = np.array([[2.0, 0.3, -0.4],
                    [0.3, 1.5, 0.6],
                    [-0.4, 0.6, 1.0]])

    def _vals(self):
        rng = np.random.default_rng(42)
        return rng.normal(size=(5, 3)).astype(np.float32)

    def test_mvnormal_cov_tau_chol_agree(self):
        vals = self._vals()
        want = st.multivariate_normal.logpdf(vals, self.mu, self.cov)
        tau = np.linalg.inv(self.cov)
        chol = np.linalg.cholesky(self.cov)
        for kwargs in (dict(cov=self.cov), dict(tau=tau), dict(chol=chol)):
            d = pm.MvNormal.dist(mu=self.mu, **kwargs)
            got = np.array([_logp(d, v) for v in vals])
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_mvstudentt(self):
        vals = self._vals()
        for nu in [3.0, 10.0]:
            d = pm.MvStudentT.dist(nu=nu, mu=self.mu, cov=self.cov)
            want = st.multivariate_t.logpdf(vals, self.mu, self.cov, df=nu)
            got = np.array([_logp(d, v) for v in vals])
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_dirichlet(self):
        a = np.array([0.5, 2.0, 3.0])
        rng = np.random.default_rng(0)
        vals = rng.dirichlet(a, size=5).astype(np.float32)
        d = pm.Dirichlet.dist(a=a)
        got = np.array([_logp(d, v) for v in vals])
        want = np.array([st.dirichlet.logpdf(
            np.asarray(v, np.float64) / np.sum(np.asarray(v, np.float64)), a)
            for v in vals])
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_multinomial(self):
        n = 20
        p = np.array([0.2, 0.3, 0.5])
        vals = np.array([[4, 6, 10], [20, 0, 0], [5, 5, 10], [0, 10, 10]])
        d = pm.Multinomial.dist(n=n, p=p)
        got = np.array([_logp(d, v) for v in vals])
        want = np.array([st.multinomial.logpmf(v, n, p) for v in vals])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_wishart(self):
        import warnings
        nu, p = 5.0, 3
        V = self.cov
        rng = np.random.default_rng(1)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            d = pm.Wishart.dist(nu=nu, V=V)
        for _ in range(4):
            X = st.wishart.rvs(int(nu), V, random_state=rng)
            got = float(_logp(d, X.astype(np.float32)))
            want = st.wishart.logpdf(X, int(nu), V)
            np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_lkjcorr_eta_density(self):
        """LKJ density: logp difference between two correlation matrices is
        (eta-1) * (logdet C1 - logdet C2); eta=1 is uniform."""
        n = 3
        x1 = np.array([0.3, -0.2, 0.5], dtype=np.float32)
        x2 = np.array([0.0, 0.1, -0.1], dtype=np.float32)

        def to_mat(x):
            C = np.eye(n)
            C[np.triu_indices(n, 1)] = x
            C[np.triu_indices(n, 1)[::-1]] = x
            return C

        d1 = pm.LKJCorr.dist(eta=1.0, n=n)
        np.testing.assert_allclose(float(np.sum(_logp(d1, x1))),
                                   float(np.sum(_logp(d1, x2))), atol=1e-4)
        d3 = pm.LKJCorr.dist(eta=3.0, n=n)
        diff = float(np.sum(_logp(d3, x1))) - float(np.sum(_logp(d3, x2)))
        want = 2.0 * (np.linalg.slogdet(to_mat(x1))[1]
                      - np.linalg.slogdet(to_mat(x2))[1])
        np.testing.assert_allclose(diff, want, rtol=1e-3, atol=1e-3)
        # invalid (non-PSD) correlation -> -inf
        bad = np.array([0.99, 0.99, -0.99], dtype=np.float32)
        assert float(np.sum(_logp(d3, bad))) < -1e6

    def test_lkjcholeskycov_eta_density(self):
        """Packed-cholesky LKJ prior: eta enters only through
        (eta-1)*logdet(corr) plus an eta-only normalizing constant, so the
        double difference over (eta, value) isolates the logdet term."""
        n = 3

        def packed_and_logdet(L):
            packed = L[np.tril_indices(n)].astype(np.float32)
            cov = L @ L.T
            sds = np.sqrt(np.diag(cov))
            corr = cov / np.outer(sds, sds)
            return packed, np.linalg.slogdet(corr)[1]

        L1 = np.array([[1.2, 0.0, 0.0],
                       [0.3, 0.9, 0.0],
                       [-0.2, 0.4, 1.1]])
        L2 = np.array([[0.8, 0.0, 0.0],
                       [-0.5, 1.3, 0.0],
                       [0.6, -0.1, 0.7]])
        p1, ld1 = packed_and_logdet(L1)
        p2, ld2 = packed_and_logdet(L2)
        sd_dist = pm.HalfCauchy.dist(beta=2.5)
        d1 = pm.LKJCholeskyCov.dist(eta=1.0, n=n, sd_dist=sd_dist)
        d3 = pm.LKJCholeskyCov.dist(eta=3.0, n=n, sd_dist=sd_dist)

        def lp(d, v):
            return float(np.sum(_logp(d, v)))

        double_diff = (lp(d3, p1) - lp(d1, p1)) - (lp(d3, p2) - lp(d1, p2))
        np.testing.assert_allclose(double_diff, 2.0 * (ld1 - ld2),
                                   rtol=1e-3, atol=1e-3)

    def test_matrix_normal(self):
        rowcov = np.array([[1.0, 0.3], [0.3, 2.0]])
        colcov = np.array([[1.5, -0.2, 0.1],
                           [-0.2, 1.0, 0.4],
                           [0.1, 0.4, 0.8]])
        M = np.arange(6, dtype=np.float64).reshape(2, 3) / 3.0
        rng = np.random.default_rng(3)
        X = rng.normal(size=(2, 3))
        d = pm.MatrixNormal.dist(mu=M, rowcov=rowcov, colcov=colcov,
                                 shape=(2, 3))
        got = float(np.sum(_logp(d, X.astype(np.float32))))
        want = st.matrix_normal.logpdf(X, M, rowcov, colcov)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_kronecker_normal_equals_mvnormal(self):
        K1 = np.array([[2.0, 0.4], [0.4, 1.0]])
        K2 = np.array([[1.0, 0.2, 0.0],
                       [0.2, 1.5, 0.3],
                       [0.0, 0.3, 0.9]])
        sigma = 0.5
        mu = np.zeros(6)
        cov = np.kron(K1, K2) + sigma ** 2 * np.eye(6)
        rng = np.random.default_rng(4)
        v = rng.normal(size=6)
        d = pm.KroneckerNormal.dist(mu=mu, covs=[K1, K2], sigma=sigma,
                                    shape=(6,))
        got = float(np.sum(_logp(d, v.astype(np.float32))))
        want = st.multivariate_normal.logpdf(v, mu, cov)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestTimeseriesLogp:
    def test_ar1(self):
        k, tau_e = 0.6, 1.5
        x = np.array([0.3, -0.2, 0.5, 0.1, -0.4], dtype=np.float32)
        d = pm.AR1.dist(k=k, tau_e=tau_e)
        tau = tau_e * (1 - k ** 2)
        want = np.empty_like(x, dtype=np.float64)
        want[0] = st.norm.logpdf(x[0], 0.0, 1.0 / np.sqrt(tau))
        want[1:] = st.norm.logpdf(x[1:], k * x[:-1], 1.0 / np.sqrt(tau_e))
        np.testing.assert_allclose(_logp(d, x), want, rtol=TOL, atol=TOL)

    def test_ar(self):
        rho = np.array([0.5, -0.3])
        sigma = 0.8
        x = np.array([0.1, -0.2, 0.4, 0.3, -0.1, 0.2], dtype=np.float32)
        d = pm.AR.dist(rho=rho, sigma=sigma, shape=len(x))
        mean = rho[0] * x[1:-1] + rho[1] * x[:-2]
        want = st.norm.logpdf(x[2:], mean, sigma).sum()  # Flat init -> 0
        np.testing.assert_allclose(float(np.sum(_logp(d, x))), want,
                                   rtol=TOL, atol=TOL)

    def test_ar_constant(self):
        rho = np.array([0.7, 0.5, -0.3])  # [const, phi1, phi2]
        sigma = 1.1
        x = np.array([0.1, -0.2, 0.4, 0.3, -0.1, 0.2], dtype=np.float32)
        d = pm.AR.dist(rho=rho, sigma=sigma, constant=True, shape=len(x))
        mean = rho[0] + rho[1] * x[1:-1] + rho[2] * x[:-2]
        want = st.norm.logpdf(x[2:], mean, sigma).sum()
        np.testing.assert_allclose(float(np.sum(_logp(d, x))), want,
                                   rtol=TOL, atol=TOL)

    def test_gaussian_random_walk(self):
        mu, sigma = 0.2, 1.3
        x = np.array([0.0, 0.5, 0.1, 1.2, 0.8], dtype=np.float32)
        d = pm.GaussianRandomWalk.dist(mu=mu, sigma=sigma, shape=len(x))
        want = st.norm.logpdf(x[1:], x[:-1] + mu, sigma).sum()
        np.testing.assert_allclose(float(np.sum(_logp(d, x))), want,
                                   rtol=TOL, atol=TOL)

    def test_garch11(self):
        omega, a1, b1, iv = 0.2, 0.3, 0.5, 1.0
        x = np.array([0.5, -0.3, 0.8, 0.1, -0.6], dtype=np.float32)
        d = pm.GARCH11.dist(omega=omega, alpha_1=a1, beta_1=b1,
                            initial_vol=iv, shape=len(x))
        vol2 = np.empty(len(x))
        vol2[0] = iv * iv
        for t in range(1, len(x)):
            vol2[t] = omega + a1 * x[t - 1] ** 2 + b1 * vol2[t - 1]
        want = st.norm.logpdf(x, 0.0, np.sqrt(vol2))
        np.testing.assert_allclose(_logp(d, x), want, rtol=TOL, atol=TOL)

    def test_euler_maruyama(self):
        import jax.numpy as jnp
        dt, theta, s = 0.1, 0.8, 0.4

        def ou(x, theta, s):
            return -theta * x, s

        x = np.array([0.5, 0.45, 0.3, 0.35, 0.2], dtype=np.float32)
        d = pm.EulerMaruyama.dist(dt=dt, sde_fn=ou, sde_pars=(theta, s),
                                  shape=len(x))
        mu = x[:-1] + dt * (-theta * x[:-1])
        want = st.norm.logpdf(x[1:], mu, np.sqrt(dt) * s)
        np.testing.assert_allclose(_logp(d, x), want, rtol=TOL, atol=TOL)

    def test_mv_gaussian_random_walk(self):
        cov = np.array([[1.0, 0.3], [0.3, 2.0]])
        rng = np.random.default_rng(5)
        x = rng.normal(size=(4, 2)).astype(np.float32)
        d = pm.MvGaussianRandomWalk.dist(mu=np.zeros(2), cov=cov,
                                         shape=(4, 2))
        want = st.multivariate_normal.logpdf(
            np.asarray(x[1:], np.float64) - np.asarray(x[:-1], np.float64),
            np.zeros(2), cov).sum()
        np.testing.assert_allclose(float(np.sum(_logp(d, x))), want,
                                   rtol=2e-3, atol=2e-3)


class TestMixtureLogp:
    def test_normal_mixture(self):
        w = np.array([0.3, 0.7])
        mu = np.array([-1.0, 2.0])
        sigma = np.array([0.5, 1.5])
        d = pm.NormalMixture.dist(w=w, mu=mu, sigma=sigma)
        vals = np.array([-2.0, -1.0, 0.0, 1.0, 2.0, 3.0], dtype=np.float32)
        want = sp.logsumexp(
            np.log(w) + st.norm.logpdf(vals[:, None], mu, sigma), axis=-1)
        got = _logp(d, vals)
        np.testing.assert_allclose(got, want, rtol=TOL, atol=TOL)

    def test_poisson_mixture(self):
        w = np.array([0.4, 0.6])
        comps = [pm.Poisson.dist(mu=2.0), pm.Poisson.dist(mu=10.0)]
        d = pm.Mixture.dist(w=w, comp_dists=comps)
        vals = NatSmall
        want = sp.logsumexp(
            np.stack([np.log(w[0]) + st.poisson.logpmf(vals, 2.0),
                      np.log(w[1]) + st.poisson.logpmf(vals, 10.0)], -1),
            axis=-1)
        got = _logp(d, vals)
        np.testing.assert_allclose(got, want, rtol=TOL, atol=TOL)


class TestBoundLogp:
    def test_bound_normal(self):
        BN = pm.Bound(pm.Normal, lower=0.0)
        d = BN.dist(mu=1.0, sigma=2.0)
        pos = np.array([0.5, 1.0, 3.0], dtype=np.float32)
        # reference semantics: truncation does NOT renormalize
        np.testing.assert_allclose(_logp(d, pos),
                                   st.norm.logpdf(pos, 1.0, 2.0),
                                   rtol=TOL, atol=TOL)
        assert np.all(_logp(d, np.array([-0.5, -2.0])) < -1e6)

    def test_bound_two_sided(self):
        BN = pm.Bound(pm.Normal, lower=-1.0, upper=1.0)
        d = BN.dist(mu=0.0, sigma=1.0)
        inside = np.array([-0.5, 0.0, 0.9], dtype=np.float32)
        np.testing.assert_allclose(_logp(d, inside),
                                   st.norm.logpdf(inside, 0.0, 1.0),
                                   rtol=TOL, atol=TOL)
        assert np.all(_logp(d, np.array([-1.5, 1.5])) < -1e6)
