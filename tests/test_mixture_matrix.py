"""Mixture-family parameter/shape matrix, mirroring the reference's
``pymc3/tests/test_mixture.py:1`` surface (510 LoC: nd normal mixtures,
list-vs-batched component equivalence, mixture of multivariate normals,
nested mixtures, row-dependent 2-D weights, prior/posterior predictive)
on top of the two single-cell pins in ``test_distributions_extra.py``."""
import numpy as np
import pytest
import scipy.stats as st
import scipy.special as sp

import pymc3_tpu as pm
from pymc3_tpu.config import floatX


def TOL(scale=1.0):
    return (1e-6 if floatX() == "float64" else 2e-3) * scale


def _logp(dist, value):
    return np.asarray(dist.logp(np.asarray(value, dtype=floatX())))


ND_CELLS = [(1, 2), (1, 4), (3, 2), (3, 5)]


@pytest.mark.parametrize("nd,ncomp", ND_CELLS,
                         ids=[f"nd{n}-K{k}" for n, k in ND_CELLS])
def test_normal_mixture_nd(nd, ncomp):
    """Batched-component NormalMixture with per-dimension parameters:
    logp factorizes per dimension as logsumexp over the component axis."""
    rng = np.random.default_rng(nd * 10 + ncomp)
    w = rng.dirichlet(np.full(ncomp, 2.0))
    mu = rng.normal(scale=2.0, size=(nd, ncomp))
    sigma = rng.uniform(0.5, 1.5, size=(nd, ncomp))
    d = pm.NormalMixture.dist(w=w, mu=mu, sigma=sigma,
                              comp_shape=(nd, ncomp), shape=(nd,))
    vals = rng.normal(scale=2.0, size=(6, nd))
    got = _logp(d, vals)
    want = sp.logsumexp(
        np.log(w) + st.norm.logpdf(vals[..., None], mu, sigma), axis=-1)
    np.testing.assert_allclose(got, want, rtol=TOL(2), atol=TOL(2))


def test_list_of_normals_matches_batched():
    w = np.array([0.2, 0.5, 0.3])
    mus, sigmas = [-2.0, 0.5, 3.0], [0.5, 1.0, 2.0]
    d_list = pm.Mixture.dist(
        w=w, comp_dists=[pm.Normal.dist(mu=m, sigma=s)
                         for m, s in zip(mus, sigmas)])
    d_batch = pm.NormalMixture.dist(w=w, mu=np.array(mus),
                                    sigma=np.array(sigmas))
    vals = np.linspace(-4.0, 5.0, 12)
    np.testing.assert_allclose(_logp(d_list, vals), _logp(d_batch, vals),
                               rtol=TOL(), atol=TOL())


def test_list_of_poissons_matches_batched():
    w = np.array([0.4, 0.6])
    d_list = pm.Mixture.dist(
        w=w, comp_dists=[pm.Poisson.dist(mu=2.0), pm.Poisson.dist(mu=10.0)])
    d_batch = pm.Mixture.dist(w=w, comp_dists=pm.Poisson.dist(
        mu=np.array([2.0, 10.0])))
    vals = np.array([0, 1, 2, 5, 9, 15, 25])
    np.testing.assert_allclose(np.asarray(d_list.logp(vals)),
                               np.asarray(d_batch.logp(vals)),
                               rtol=TOL(), atol=TOL())


def test_mixture_of_mvn():
    w = np.array([0.35, 0.65])
    mu1, mu2 = np.array([-1.0, 0.5]), np.array([2.0, -0.5])
    c1 = np.array([[1.0, 0.3], [0.3, 1.5]])
    c2 = np.array([[0.8, -0.2], [-0.2, 0.6]])
    d = pm.Mixture.dist(
        w=w, comp_dists=[pm.MvNormal.dist(mu=mu1, cov=c1),
                         pm.MvNormal.dist(mu=mu2, cov=c2)], shape=(2,))
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(7, 2))
    got = _logp(d, vals)
    want = sp.logsumexp(np.stack(
        [np.log(w[0]) + st.multivariate_normal.logpdf(vals, mu1, c1),
         np.log(w[1]) + st.multivariate_normal.logpdf(vals, mu2, c2)],
        axis=-1), axis=-1)
    np.testing.assert_allclose(got, want, rtol=TOL(2), atol=TOL(2))


def test_mixture_of_mixture():
    """A mixture whose components are mixtures equals the flattened
    mixture with product weights."""
    w_outer = np.array([0.6, 0.4])
    w_g = np.array([0.3, 0.7])
    mu_g = np.array([-3.0, -1.0])
    w_h = np.array([0.5, 0.5])
    mu_h = np.array([1.0, 4.0])
    g = pm.NormalMixture.dist(w=w_g, mu=mu_g, sigma=1.0)
    h = pm.NormalMixture.dist(w=w_h, mu=mu_h, sigma=1.0)
    nested = pm.Mixture.dist(w=w_outer, comp_dists=[g, h])
    flat = pm.NormalMixture.dist(
        w=np.concatenate([w_outer[0] * w_g, w_outer[1] * w_h]),
        mu=np.concatenate([mu_g, mu_h]), sigma=1.0)
    vals = np.linspace(-5.0, 6.0, 15)
    np.testing.assert_allclose(_logp(nested, vals), _logp(flat, vals),
                               rtol=TOL(2), atol=TOL(2))


def test_2d_w_row_dependent():
    """w with a batch axis: each row of the value uses its own weights
    (cf. reference ``test_mixture.py:446`` test_2d_w)."""
    n = 5
    mus = np.array([-2.0, 3.0])
    rng = np.random.default_rng(4)
    w2 = rng.dirichlet(np.array([2.0, 2.0]), size=n)
    d = pm.NormalMixture.dist(w=w2, mu=mus, sigma=1.0, shape=(n,))
    vals = rng.normal(size=(n,))
    got = _logp(d, vals)
    want = sp.logsumexp(
        np.log(w2) + st.norm.logpdf(vals[:, None], mus, 1.0), axis=-1)
    np.testing.assert_allclose(got, want, rtol=TOL(2), atol=TOL(2))


@pytest.mark.parametrize("bad_w", [[0.5, 0.2], [-0.2, 1.2]],
                         ids=["sum!=1", "negative"])
def test_invalid_weights_rejected(bad_w):
    d = pm.NormalMixture.dist(w=np.array(bad_w), mu=np.array([0.0, 1.0]),
                              sigma=1.0)
    got = _logp(d, np.array(0.5))
    assert not np.isfinite(got) or got < -1e6


class TestMixtureRandom:
    def test_list_comp_moments(self):
        w = np.array([0.3, 0.7])
        comps = [pm.Normal.dist(mu=-2.0, sigma=0.5),
                 pm.Normal.dist(mu=3.0, sigma=1.0)]
        d = pm.Mixture.dist(w=w, comp_dists=comps)
        np.random.seed(10)
        draws = np.asarray(d.random(size=20000))
        want_mean = w @ np.array([-2.0, 3.0])
        want_var = w @ (np.array([0.5, 1.0]) ** 2
                        + np.array([-2.0, 3.0]) ** 2) - want_mean ** 2
        assert abs(draws.mean() - want_mean) < 0.06
        assert abs(draws.var() - want_var) < 0.15

    def test_batched_comp_moments(self):
        w = np.array([0.5, 0.5])
        d = pm.Mixture.dist(
            w=w, comp_dists=pm.Poisson.dist(mu=np.array([2.0, 10.0])))
        np.random.seed(11)
        draws = np.asarray(d.random(size=20000))
        assert abs(draws.mean() - 6.0) < 0.15


def test_mixture_prior_and_posterior_predictive():
    """Mixture inside a model: prior predictive draws and vectorized PPC
    both produce the right shapes and a plausible bimodal spread
    (cf. reference ``test_mixture.py:349``)."""
    np.random.seed(12)
    obs = np.concatenate([np.random.normal(-2.0, 0.5, 40),
                          np.random.normal(2.0, 0.5, 60)])
    with pm.Model() as m:
        w = pm.Dirichlet("w", a=np.array([1.0, 1.0]))
        mu = pm.Normal("mu", mu=np.array([-1.0, 1.0]), sigma=3.0, shape=2)
        pm.NormalMixture("like", w=w, mu=mu, sigma=0.5, observed=obs)
        prior = pm.sample_prior_predictive(samples=50)
        assert prior["like"].shape == (50, 100)
        tr = pm.sample(draws=80, tune=80, chains=2, progressbar=False,
                       compute_convergence_checks=False)
        ppc = pm.sample_posterior_predictive(tr, samples=40,
                                             progressbar=False)
    assert ppc["like"].shape == (40, 100)
    # posterior predictive must span both modes
    assert ppc["like"].min() < -1.0 and ppc["like"].max() > 1.0
