"""``random()`` shape semantics and distributional correctness — a port of
the reference contract pinned by ``pymc3/tests/test_distributions_random.py``
(``BaseTestCases.BaseTestCase``, the size x dist_shape matrix, and the
KS / chi-square two-sample checks of ``pymc3_random``/``pymc3_random_discrete``).
"""
import numpy as np
import pytest
import scipy.stats as st

import pymc3_tpu as pm

SIZES = [None, 5, (4, 5)]


def _shape_of(x):
    return np.atleast_1d(np.asarray(x)).shape


SCALAR_DISTS = [
    (pm.Normal, dict(mu=0.0, sigma=1.0)),
    (pm.HalfNormal, dict(sigma=1.0)),
    (pm.Uniform, dict(lower=0.0, upper=1.0)),
    (pm.Beta, dict(alpha=2.0, beta=3.0)),
    (pm.Gamma, dict(alpha=2.0, beta=1.5)),
    (pm.Exponential, dict(lam=1.2)),
    (pm.StudentT, dict(nu=4.0, mu=0.0, sigma=1.0)),
    (pm.Lognormal, dict(mu=0.0, sigma=0.5)),
    (pm.Cauchy, dict(alpha=0.0, beta=1.0)),
    (pm.Laplace, dict(mu=0.0, b=1.0)),
    (pm.Bernoulli, dict(p=0.4)),
    (pm.Binomial, dict(n=10, p=0.4)),
    (pm.Poisson, dict(mu=3.0)),
    (pm.NegativeBinomial, dict(mu=3.0, alpha=2.0)),
    (pm.Geometric, dict(p=0.3)),
    (pm.DiscreteUniform, dict(lower=0, upper=10)),
    (pm.ZeroInflatedPoisson, dict(psi=0.7, theta=3.0)),
]


@pytest.mark.parametrize("dist_cls,params",
                         SCALAR_DISTS, ids=lambda d: getattr(d, "__name__", ""))
class TestScalarShapeMatrix:
    """cf. ``BaseTestCases.BaseTestCase.test_scalar_parameter_shape`` /
    ``test_scalar_shape`` / ``test_parameters_1d_shape``."""

    def test_scalar_parameter_shape(self, dist_cls, params):
        d = dist_cls.dist(**params)
        for size in SIZES:
            expected = (1,) if size is None else tuple(np.atleast_1d(size))
            assert _shape_of(d.random(size=size)) == expected, size

    def test_scalar_shape(self, dist_cls, params):
        d = dist_cls.dist(shape=10, **params)
        for size in SIZES:
            expected = (() if size is None
                        else tuple(np.atleast_1d(size))) + (10,)
            assert _shape_of(d.random(size=size)) == expected, size

    def test_parameters_1d_shape(self, dist_cls, params):
        vec = {k: np.asarray(v) * np.ones(5, dtype=np.asarray(v).dtype)
               for k, v in params.items()}
        d = dist_cls.dist(shape=5, **vec)
        for size in SIZES:
            expected = (() if size is None
                        else tuple(np.atleast_1d(size))) + (5,)
            assert _shape_of(d.random(size=size)) == expected, size


class TestBroadcastShape:
    def test_normal_broadcast(self):
        d = pm.Normal.dist(mu=np.zeros(5), sigma=1.0, shape=(10, 5))
        for size in SIZES:
            expected = (() if size is None
                        else tuple(np.atleast_1d(size))) + (10, 5)
            assert _shape_of(d.random(size=size)) == expected, size


class TestMultivariateShapes:
    def test_mvnormal(self):
        mu = np.zeros(3)
        cov = np.eye(3)
        d = pm.MvNormal.dist(mu=mu, cov=cov, shape=(3,))
        assert _shape_of(d.random()) == (3,)
        assert _shape_of(d.random(size=5)) == (5, 3)
        assert _shape_of(d.random(size=(4, 5))) == (4, 5, 3)

    def test_dirichlet(self):
        d = pm.Dirichlet.dist(a=np.ones(4))
        assert _shape_of(d.random()) == (4,)
        s = np.asarray(d.random(size=6))
        assert s.shape == (6, 4)
        np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-6)

    def test_multinomial(self):
        d = pm.Multinomial.dist(n=10, p=np.array([0.2, 0.3, 0.5]))
        assert _shape_of(d.random()) == (3,)
        s = np.asarray(d.random(size=7))
        assert s.shape == (7, 3)
        assert np.all(s.sum(-1) == 10)

    def test_categorical_vector_p(self):
        d = pm.Categorical.dist(p=np.array([0.2, 0.3, 0.5]))
        assert _shape_of(d.random(size=11)) == (11,)
        vals = np.asarray(d.random(size=1000))
        assert set(np.unique(vals)).issubset({0, 1, 2})


def ks_check(dist, params, ref_rand, size=10000, alpha=0.01, fails=5):
    """cf. ``pymc3_random`` (``test_distributions_random.py:37-56``)."""
    p = alpha
    f = fails
    while p <= alpha and f > 0:
        s0 = np.atleast_1d(np.asarray(dist.random(size=size))).ravel()
        s1 = np.atleast_1d(ref_rand(size=size, **params)).ravel()
        _, p = st.ks_2samp(s0, s1)
        f -= 1
    assert p > alpha, (dist, p)


def chisq_check(dist, params, ref_rand, size=20000, alpha=0.01, fails=10):
    """cf. ``pymc3_random_discrete`` (``test_distributions_random.py:59-85``)."""
    p = alpha
    f = fails
    while p <= alpha and f > 0:
        o = np.atleast_1d(np.asarray(dist.random(size=size))).ravel()
        e = np.atleast_1d(ref_rand(size=size, **params)).ravel()
        observed = dict(zip(*np.unique(o, return_counts=True)))
        expected = dict(zip(*np.unique(e, return_counts=True)))
        k = np.array([(observed.get(x, 0), expected[x]) for x in expected])
        if np.all(k[:, 0] == k[:, 1]):
            p = 1.0
        else:
            _, p = st.chisquare(k[:, 0], k[:, 1] * k[:, 0].sum() / k[:, 1].sum())
        f -= 1
    assert p > alpha, (dist, p)


class TestRandomMatchesScipy:
    def test_normal(self):
        ks_check(pm.Normal.dist(mu=1.0, sigma=2.0), dict(),
                 lambda size: st.norm.rvs(1.0, 2.0, size=size))

    def test_beta(self):
        ks_check(pm.Beta.dist(alpha=2.0, beta=5.0), dict(),
                 lambda size: st.beta.rvs(2.0, 5.0, size=size))

    def test_gamma(self):
        ks_check(pm.Gamma.dist(alpha=3.0, beta=2.0), dict(),
                 lambda size: st.gamma.rvs(3.0, scale=1 / 2.0, size=size))

    def test_exponential(self):
        ks_check(pm.Exponential.dist(lam=2.5), dict(),
                 lambda size: st.expon.rvs(scale=1 / 2.5, size=size))

    def test_studentt(self):
        ks_check(pm.StudentT.dist(nu=5.0, mu=0.5, sigma=1.5), dict(),
                 lambda size: st.t.rvs(5.0, 0.5, 1.5, size=size))

    def test_lognormal(self):
        ks_check(pm.Lognormal.dist(mu=0.3, sigma=0.6), dict(),
                 lambda size: st.lognorm.rvs(0.6, scale=np.exp(0.3),
                                             size=size))

    def test_halfcauchy(self):
        ks_check(pm.HalfCauchy.dist(beta=2.0), dict(),
                 lambda size: st.halfcauchy.rvs(scale=2.0, size=size))

    def test_mvnormal(self):
        mu = np.array([1.0, -1.0])
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        d = pm.MvNormal.dist(mu=mu, cov=cov, shape=(2,))
        s = np.asarray(d.random(size=20000))
        np.testing.assert_allclose(s.mean(0), mu, atol=0.06)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.1)

    def test_poisson(self):
        chisq_check(pm.Poisson.dist(mu=4.0), dict(),
                    lambda size: st.poisson.rvs(4.0, size=size))

    def test_binomial(self):
        chisq_check(pm.Binomial.dist(n=10, p=0.3), dict(),
                    lambda size: st.binom.rvs(10, 0.3, size=size))

    def test_geometric(self):
        chisq_check(pm.Geometric.dist(p=0.4), dict(),
                    lambda size: st.geom.rvs(0.4, size=size))

    def test_negative_binomial(self):
        chisq_check(pm.NegativeBinomial.dist(mu=4.0, alpha=2.0), dict(),
                    lambda size: st.nbinom.rvs(2.0, 2.0 / 6.0, size=size))

    def test_bernoulli(self):
        chisq_check(pm.Bernoulli.dist(p=0.3), dict(),
                    lambda size: st.bernoulli.rvs(0.3, size=size))

    def test_zero_inflated_poisson_moments(self):
        psi, theta = 0.7, 3.0
        s = np.asarray(pm.ZeroInflatedPoisson.dist(
            psi=psi, theta=theta).random(size=50000))
        np.testing.assert_allclose(s.mean(), psi * theta, rtol=0.05)


class TestRandomWithPoint:
    """Point replacement in forward draws (cf. ``TestDrawValues``)."""

    def test_point_replaces_parameters(self):
        with pm.Model():
            mu = pm.Normal("mu", mu=0.0, tau=1e-3)
            sigma = pm.Gamma("sigma", alpha=1.0, beta=1.0, transform=None)
            y = pm.Normal("y", mu=mu, sigma=sigma)
            s = y.distribution.random(point={"mu": 5.0, "sigma": 1e-6},
                                      size=100)
        np.testing.assert_allclose(np.asarray(s), 5.0, atol=1e-3)

    def test_draw_values_deterministic(self):
        from pymc3_tpu.distributions.distribution import draw_values
        with pm.Model():
            x = pm.Normal("x", mu=0.0, sigma=1.0)
            exp_x = pm.Deterministic("exp_x", pm.math.exp(x))
            xv, ev = draw_values([x, exp_x], point={"x": 1.7})
        np.testing.assert_allclose(np.exp(xv), ev, rtol=1e-5)


class TestTimeseriesRandom:
    def test_grw_shape_and_moments(self):
        d = pm.GaussianRandomWalk.dist(mu=0.0, sigma=1.0, shape=20)
        s = np.asarray(d.random(size=2000))
        assert s.shape == (2000, 20)
        # var of step t grows ~ t+1 (first step includes the init increment)
        v = s.var(0)
        assert v[10] > v[2]

    def test_ar1_shape(self):
        d = pm.AR1.dist(k=0.5, tau_e=1.0, shape=15)
        s = np.asarray(d.random(size=50))
        assert s.shape == (50, 15)
