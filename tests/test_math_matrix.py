"""Numeric-substrate matrix for ``pymc3_tpu.math`` and
``pymc3_tpu.distributions.dist_math``, mirroring the reference's
``test_math.py:1`` (190 LoC), ``test_dist_math.py:1`` (218 LoC) and
``test_special_functions.py`` — identity/round-trip checks, scipy pins,
and tail-stability probes for every log-domain kernel the distributions
are built on."""
import numpy as np
import pytest
import scipy.special as sp
import scipy.stats as st

import pymc3_tpu.math as pmm
from pymc3_tpu.distributions import dist_math as dm
from pymc3_tpu.config import floatX


def TOL(scale=1.0):
    return (1e-8 if floatX() == "float64" else 1e-5) * scale


def ev(node):
    """Evaluate a Node (or array) to numpy."""
    return np.asarray(getattr(node, "test_value", node))


# ---------------------------------------------------------------------------
# math.py
# ---------------------------------------------------------------------------

class TestLinkFunctions:
    x = np.array([-6.0, -2.0, -0.3, 0.0, 0.7, 3.0, 6.0])
    p = np.array([0.01, 0.2, 0.5, 0.8, 0.99])

    def test_invlogit_matches_expit(self):
        np.testing.assert_allclose(ev(pmm.invlogit(self.x, eps=0.0)),
                                   sp.expit(self.x), rtol=TOL(100))

    def test_invlogit_eps_clamps_range(self):
        out = ev(pmm.invlogit(np.array([-40.0, 40.0]), eps=1e-3))
        assert out[0] >= 1e-3 - 1e-9 and out[1] <= 1 - 1e-3 + 1e-9

    def test_logit_invlogit_roundtrip(self):
        np.testing.assert_allclose(ev(pmm.invlogit(ev(pmm.logit(self.p)),
                                                   eps=0.0)),
                                   self.p, rtol=TOL(1000))

    def test_probit_invprobit_pair(self):
        np.testing.assert_allclose(ev(pmm.invprobit(self.x)),
                                   st.norm.cdf(self.x), rtol=TOL(100),
                                   atol=TOL(100))
        np.testing.assert_allclose(ev(pmm.probit(self.p)),
                                   st.norm.ppf(self.p), rtol=TOL(1000),
                                   atol=TOL(1000))

    def test_erfcinv(self):
        np.testing.assert_allclose(ev(pmm.erfcinv(np.array([0.3, 1.0, 1.6]))),
                                   sp.erfcinv([0.3, 1.0, 1.6]),
                                   rtol=TOL(1000), atol=TOL(1000))


class TestLogDomain:
    def test_log1pexp_interior_and_tails(self):
        x = np.array([-60.0, -5.0, 0.0, 5.0, 60.0])
        got = ev(pmm.log1pexp(x))
        want = np.logaddexp(0.0, x)
        np.testing.assert_allclose(got, want, rtol=TOL(100), atol=TOL(100))
        assert np.all(np.isfinite(got))

    def test_log1mexp_stable_both_branches(self):
        # log(1 - exp(-x)): power-series branch (x small), log1p branch
        x = np.array([1e-4, 0.1, 0.6, 1.0, 5.0, 40.0])
        got = ev(pmm.log1mexp(x))
        want = np.log1p(-np.exp(-np.float64(x)))
        np.testing.assert_allclose(got, want, rtol=TOL(1e3), atol=TOL(1e3))
        np.testing.assert_allclose(pmm.log1mexp_numpy(x), want,
                                   rtol=TOL(1e3), atol=TOL(1e3))

    def test_logaddexp_logdiffexp(self):
        a, b = np.array([1.0, 3.0, 10.0]), np.array([0.5, 2.0, 9.0])
        np.testing.assert_allclose(ev(pmm.logaddexp(a, b)),
                                   np.logaddexp(a, b), rtol=TOL(100))
        want = np.log(np.exp(a) - np.exp(b))
        np.testing.assert_allclose(ev(pmm.logdiffexp(a, b)), want,
                                   rtol=TOL(1000))

    def test_logsumexp_keepdims_default(self):
        x = np.arange(6.0).reshape(2, 3)
        out = ev(pmm.logsumexp(x, axis=1))
        assert out.shape == (2, 1)  # reference keepdims=True default
        np.testing.assert_allclose(out[:, 0], sp.logsumexp(x, axis=1),
                                   rtol=TOL(100))

    def test_softmax_log_softmax(self):
        x = np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 10.0]])
        np.testing.assert_allclose(ev(pmm.softmax(x)), sp.softmax(x, axis=-1),
                                   rtol=TOL(100), atol=TOL(100))
        np.testing.assert_allclose(ev(pmm.log_softmax(x)),
                                   sp.log_softmax(x, axis=-1),
                                   rtol=TOL(100), atol=TOL(100))


class TestLinearAlgebra:
    def _spd(self, k=3):
        rng = np.random.default_rng(5)
        A = rng.normal(size=(k, k))
        return A @ A.T + k * np.eye(k)

    def test_logdet(self):
        M = self._spd()
        np.testing.assert_allclose(ev(pmm.logdet(M)),
                                   np.linalg.slogdet(M)[1], rtol=TOL(1e4))

    def test_expand_packed_triangular_lower_upper(self):
        n = 4
        L = np.tril(np.arange(1.0, 17.0).reshape(4, 4))
        packed = L[np.tril_indices(n)]
        got = ev(pmm.expand_packed_triangular(n, packed, lower=True))
        np.testing.assert_allclose(got, L, rtol=TOL())
        U = L.T
        packed_u = U[np.triu_indices(n)]
        got_u = ev(pmm.expand_packed_triangular(n, packed_u, lower=False))
        np.testing.assert_allclose(got_u, U, rtol=TOL())
        diag = ev(pmm.expand_packed_triangular(n, packed, lower=True,
                                               diagonal_only=True))
        np.testing.assert_allclose(diag, np.diag(L), rtol=TOL())

    def test_batched_diag_roundtrip(self):
        v = np.arange(6.0).reshape(2, 3)
        mats = ev(pmm.batched_diag(v))
        assert mats.shape == (2, 3, 3)
        back = ev(pmm.batched_diag(mats))
        np.testing.assert_allclose(back, v, rtol=TOL())

    def test_block_diagonal_list_and_stack(self):
        import scipy.linalg as sl
        a = np.array([[1.0, 2.0], [3.0, 4.0]])
        b = np.array([[5.0, 6.0], [7.0, 8.0]])
        want = sl.block_diag(a, b)
        np.testing.assert_allclose(ev(pmm.block_diagonal([a, b])), want,
                                   rtol=TOL())
        np.testing.assert_allclose(
            ev(pmm.block_diagonal(np.stack([a, b]))), want, rtol=TOL())

    def test_flat_outer_extract_diag(self):
        a, b = np.array([1.0, 2.0]), np.array([3.0, 4.0, 5.0])
        np.testing.assert_allclose(ev(pmm.flat_outer(a, b)),
                                   np.outer(a, b).ravel(), rtol=TOL())
        M = np.arange(9.0).reshape(3, 3)
        np.testing.assert_allclose(ev(pmm.extract_diag(M)), np.diag(M),
                                   rtol=TOL())


class TestKroneckerAlgebra:
    def _factors(self):
        rng = np.random.default_rng(6)
        K1 = rng.normal(size=(2, 2)); K1 = K1 @ K1.T + 2 * np.eye(2)
        K2 = rng.normal(size=(3, 3)); K2 = K2 @ K2.T + 3 * np.eye(3)
        return K1, K2

    def test_kronecker_matches_numpy(self):
        K1, K2 = self._factors()
        np.testing.assert_allclose(ev(pmm.kronecker(K1, K2)),
                                   np.kron(K1, K2), rtol=TOL(100))

    def test_kron_dot_never_materializes(self):
        K1, K2 = self._factors()
        x = np.random.default_rng(7).normal(size=(6, 2))
        got = ev(pmm.kron_dot([K1, K2], x))
        want = np.kron(K1, K2) @ x
        np.testing.assert_allclose(got, want, rtol=TOL(1e3), atol=TOL(1e3))

    def test_kron_solve_lower_upper(self):
        K1, K2 = self._factors()
        L1, L2 = np.linalg.cholesky(K1), np.linalg.cholesky(K2)
        x = np.random.default_rng(8).normal(size=(6, 1))
        got = ev(pmm.kron_solve_lower([L1, L2], x))
        want = np.linalg.solve(np.kron(L1, L2), x)
        np.testing.assert_allclose(got, want, rtol=TOL(1e4), atol=TOL(1e4))
        got_u = ev(pmm.kron_solve_upper([L1.T, L2.T], x))
        want_u = np.linalg.solve(np.kron(L1.T, L2.T), x)
        np.testing.assert_allclose(got_u, want_u, rtol=TOL(1e4),
                                   atol=TOL(1e4))

    def test_kron_diag(self):
        d1, d2 = np.array([1.0, 2.0]), np.array([3.0, 4.0, 5.0])
        np.testing.assert_allclose(ev(pmm.kron_diag(d1, d2)),
                                   np.diag(np.kron(np.diag(d1),
                                                   np.diag(d2))), rtol=TOL())

    def test_cartesian(self):
        got = pmm.cartesian(np.array([1, 2]), np.array([10, 20, 30]))
        want = np.array([[1, 10], [1, 20], [1, 30],
                         [2, 10], [2, 20], [2, 30]])
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# dist_math.py
# ---------------------------------------------------------------------------

class TestBound:
    def test_bound_scalar_conditions(self):
        lp = np.array([1.0, 2.0, 3.0])
        out = np.asarray(dm.bound(lp, True, broadcast_conditions=False))
        np.testing.assert_allclose(out, lp)
        out = np.asarray(dm.bound(lp, False, broadcast_conditions=False))
        assert np.all(out == -np.inf)

    def test_bound_elementwise_conditions(self):
        lp = np.array([1.0, 2.0, 3.0])
        cond = np.array([True, False, True])
        out = np.asarray(dm.bound(lp, cond))
        np.testing.assert_allclose(out[[0, 2]], lp[[0, 2]])
        assert out[1] == -np.inf

    def test_alltrue(self):
        assert bool(np.asarray(dm.alltrue_scalar(
            [np.array([True, True]), True])))
        assert not bool(np.asarray(dm.alltrue_scalar(
            [np.array([True, False])])))


class TestSpecialKernels:
    def test_logpow_zero_conventions(self):
        # 0^0 -> logpow(0, 0) = 0 (reference convention)
        out = np.asarray(dm.logpow(np.array([0.0, 0.0, 2.0]),
                                   np.array([0.0, 3.0, 3.0])))
        assert out[0] == 0.0
        assert out[1] == -np.inf
        np.testing.assert_allclose(out[2], 3 * np.log(2.0), rtol=TOL(100))

    def test_factln_betaln_binomln(self):
        n = np.array([0.0, 1.0, 5.0, 20.0])
        np.testing.assert_allclose(np.asarray(dm.factln(n)),
                                   sp.gammaln(n + 1), rtol=TOL(100),
                                   atol=TOL(100))
        np.testing.assert_allclose(np.asarray(dm.betaln(2.0, 3.5)),
                                   sp.betaln(2.0, 3.5), rtol=TOL(100))
        np.testing.assert_allclose(
            np.asarray(dm.binomln(10.0, 4.0)),
            np.log(sp.comb(10, 4)), rtol=TOL(100))

    @pytest.mark.parametrize("x", [-30.0, -10.0, -5.0, -1.0, 0.0, 2.0, 8.0])
    def test_normal_lcdf_tails(self, x):
        got = float(np.asarray(dm.normal_lcdf(0.0, 1.0, x)))
        want = st.norm.logcdf(x)
        # float32 asymptotic series keeps ~4 digits at -30
        rtol = 1e-8 if floatX() == "float64" else 2e-4
        np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol)

    @pytest.mark.parametrize("x", [-8.0, -1.0, 0.0, 5.0, 10.0, 30.0])
    def test_normal_lccdf_tails(self, x):
        got = float(np.asarray(dm.normal_lccdf(0.0, 1.0, x)))
        want = st.norm.logsf(x)
        rtol = 1e-8 if floatX() == "float64" else 2e-4
        np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol)

    def test_log_diff_normal_cdf(self):
        cells = [(0.0, 1.0, 1.0, -1.0), (0.0, 1.0, 5.0, 4.0),
                 (2.0, 3.0, 10.0, -10.0), (0.0, 1.0, -4.0, -5.0)]
        for mu, sigma, x, y in cells:
            got = float(np.asarray(dm.log_diff_normal_cdf(mu, sigma, x, y)))
            want = np.log(st.norm.cdf(x, mu, sigma)
                          - st.norm.cdf(y, mu, sigma))
            np.testing.assert_allclose(got, want, rtol=TOL(1e4),
                                       atol=TOL(1e4))

    def test_sigma2rho_roundtrip(self):
        sigma = np.array([0.1, 1.0, 5.0])
        back = np.asarray(dm.rho2sigma(np.asarray(dm.sigma2rho(sigma))))
        np.testing.assert_allclose(back, sigma, rtol=TOL(1e3))

    def test_bessel_exp_scaled(self):
        x = np.array([0.1, 1.0, 10.0, 100.0])
        np.testing.assert_allclose(np.asarray(dm.i0e(x)), sp.i0e(x),
                                   rtol=TOL(1e3))
        np.testing.assert_allclose(np.asarray(dm.i1e(x)), sp.i1e(x),
                                   rtol=TOL(1e3))

    def test_incomplete_beta_grid(self):
        a = np.array([0.5, 2.0, 5.0])
        b = np.array([1.5, 3.0, 0.7])
        for ai in a:
            for bi in b:
                xs = np.array([0.01, 0.3, 0.5, 0.9, 0.999])
                got = np.asarray(dm.incomplete_beta(ai, bi, xs))
                want = sp.betainc(ai, bi, xs)
                np.testing.assert_allclose(got, want, rtol=TOL(1e3),
                                           atol=TOL(1e3))

    def test_std_cdf_zvalue(self):
        x = np.array([-2.0, 0.0, 1.5])
        np.testing.assert_allclose(np.asarray(dm.std_cdf(x)), st.norm.cdf(x),
                                   rtol=TOL(100), atol=TOL(100))
        np.testing.assert_allclose(np.asarray(dm.zvalue(x, mu=1.0, sigma=2.0)),
                                   (x - 1.0) / 2.0, rtol=TOL(100))

    def test_mvnormal_logp_kernel(self):
        rng = np.random.default_rng(9)
        A = rng.normal(size=(3, 3))
        cov = A @ A.T + 3 * np.eye(3)
        delta = rng.normal(size=(4, 3))
        got = np.asarray(dm.MvNormal_logp(cov, delta))
        want = st.multivariate_normal.logpdf(delta, np.zeros(3), cov)
        np.testing.assert_allclose(got, want, rtol=TOL(1e4), atol=TOL(1e4))
        # unbatched (k,) delta
        got1 = np.asarray(dm.MvNormal_logp(cov, delta[0]))
        np.testing.assert_allclose(got1, want[0], rtol=TOL(1e4),
                                   atol=TOL(1e4))
        # 2-D batch
        got2 = np.asarray(dm.MvNormal_logp(cov, delta.reshape(2, 2, 3)))
        np.testing.assert_allclose(got2.ravel(), want, rtol=TOL(1e4),
                                   atol=TOL(1e4))
        # indefinite covariance is rejected
        bad = np.array([[1.0, 2.0], [2.0, 1.0]])
        assert np.asarray(dm.MvNormal_logp(bad, np.array([0.1, 0.2]))) \
            == -np.inf


class TestRandomHelpers:
    def test_random_choice_distribution(self):
        p = np.array([0.2, 0.3, 0.5])
        rng = np.random.default_rng(10)
        draws = dm.random_choice(p, size=20000, rng=rng)
        freq = np.bincount(np.asarray(draws, int), minlength=3) / 20000
        np.testing.assert_allclose(freq, p, atol=0.015)

    def test_clipped_beta_rvs_stays_interior(self):
        draws = dm.clipped_beta_rvs(0.01, 0.01, size=2000)
        assert np.all(draws > 0) and np.all(draws < 1)
        assert np.all(np.isfinite(np.log(draws)))
        assert np.all(np.isfinite(np.log1p(-draws)))


class TestSplineWrapper:
    def test_matches_scipy_spline(self):
        from scipy.interpolate import InterpolatedUnivariateSpline
        x = np.linspace(0.0, 10.0, 50)
        y = np.sin(x)
        spline = InterpolatedUnivariateSpline(x, y, k=3)
        wrapped = dm.SplineWrapper(spline, x_lo=0.0, x_hi=10.0)
        xs = np.linspace(0.5, 9.5, 17)
        got = np.asarray(wrapped(xs))
        np.testing.assert_allclose(got, spline(xs), rtol=1e-3, atol=1e-3)
