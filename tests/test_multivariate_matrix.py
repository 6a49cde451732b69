"""Parameter-domain sweeps for the multivariate family, extending the
single-parameter-set pins in ``test_distributions_extra.py`` to the
reference's Domain-product depth (``pymc3/tests/test_distributions.py:1``
— MvNormal/MvStudentT over cov/tau/chol parametrizations x covariance
domains, Wishart over nu x V products, LKJ exact densities, MatrixNormal
over the full row x col parametrization grid, KroneckerNormal vs its
dense equivalent).

All expectations are scipy (or closed-form) computed in float64; the
library runs at the configured floatX.  Tolerances scale with the
parametrization (tau goes through two extra factorizations) and the
covariance conditioning."""
import itertools

import numpy as np
import pytest
import scipy.stats as st
import scipy.special as sp

import pymc3_tpu as pm
from pymc3_tpu.config import floatX


def TOL(scale=1.0):
    base = 1e-6 if floatX() == "float64" else 2e-3
    return base * scale


def _logp(dist, value):
    return np.asarray(dist.logp(np.asarray(value, dtype=floatX())))


def _spd(k, kind, seed=0):
    """Covariance domains: near-diagonal, correlated, ill-conditioned."""
    rng = np.random.default_rng(seed + 7 * k)
    if kind == "diag":
        return np.diag(rng.uniform(0.5, 2.0, size=k))
    if kind == "corr":
        A = rng.normal(size=(k, k))
        C = A @ A.T + k * np.eye(k)
        d = np.sqrt(np.diag(C))
        return C / np.outer(d, d)
    if kind == "illcond":
        # eigenvalues spread over ~3 decades
        Q, _ = np.linalg.qr(rng.normal(size=(k, k)))
        lam = np.logspace(-1.5, 1.5, k)
        return (Q * lam) @ Q.T
    raise ValueError(kind)


def _param_variants(cov):
    return {
        "cov": dict(cov=cov),
        "tau": dict(tau=np.linalg.inv(cov)),
        "chol": dict(chol=np.linalg.cholesky(cov)),
    }


MVN_CELLS = [(k, kind, param)
             for k in (2, 3, 5)
             for kind in ("diag", "corr", "illcond")
             for param in ("cov", "tau", "chol")]


@pytest.mark.parametrize("k,kind,param", MVN_CELLS,
                         ids=[f"{k}d-{kind}-{p}" for k, kind, p in MVN_CELLS])
def test_mvnormal_matrix(k, kind, param):
    cov = _spd(k, kind)
    rng = np.random.default_rng(1)
    mu = rng.normal(scale=0.5, size=k)
    vals = rng.multivariate_normal(mu, cov, size=6)
    d = pm.MvNormal.dist(mu=mu, **_param_variants(cov)[param])
    got = _logp(d, vals)
    want = st.multivariate_normal.logpdf(vals, mu, cov)
    # tau re-factorizes twice; illcond loses digits at float32
    scale = {"cov": 1.0, "chol": 1.0, "tau": 5.0}[param]
    if kind == "illcond":
        scale *= 10.0
    np.testing.assert_allclose(got, want, rtol=TOL(scale), atol=TOL(scale))


def test_mvnormal_non_psd_is_rejected():
    bad = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    d = pm.MvNormal.dist(mu=np.zeros(2), cov=bad)
    got = _logp(d, np.array([0.1, -0.2]))
    assert not np.isfinite(got) or got < -1e6


MVT_CELLS = [(k, nu, param)
             for k in (2, 4)
             for nu in (0.7, 2.0, 5.0, 30.0, 200.0)
             for param in ("cov", "tau", "chol")]


@pytest.mark.parametrize("k,nu,param", MVT_CELLS,
                         ids=[f"{k}d-nu{nu}-{p}" for k, nu, p in MVT_CELLS])
def test_mvstudentt_matrix(k, nu, param):
    cov = _spd(k, "corr", seed=3)
    rng = np.random.default_rng(2)
    mu = rng.normal(scale=0.5, size=k)
    vals = rng.multivariate_normal(mu, cov, size=6)
    d = pm.MvStudentT.dist(nu=nu, mu=mu, **_param_variants(cov)[param])
    got = _logp(d, vals)
    want = st.multivariate_t.logpdf(vals, mu, cov, df=nu)
    scale = 5.0 if param == "tau" else 1.0
    np.testing.assert_allclose(got, want, rtol=TOL(scale), atol=TOL(scale))


DIRICHLET_AS = [
    np.array([0.3, 0.7]),                    # sparse, k=2
    np.array([1.0, 1.0, 1.0]),               # uniform simplex
    np.array([5.0, 5.0, 5.0]),               # concentrated center
    np.array([0.5, 2.0, 8.0]),               # asymmetric
    np.array([2.0, 3.0, 4.0, 5.0, 6.0, 7.0]),  # k=6
]


@pytest.mark.parametrize("a", DIRICHLET_AS,
                         ids=[f"k{len(a)}-a{a[0]}" for a in DIRICHLET_AS])
def test_dirichlet_matrix(a):
    rng = np.random.default_rng(4)
    vals = rng.dirichlet(np.maximum(a, 1.0), size=6)
    d = pm.Dirichlet.dist(a=a)
    got = _logp(d, vals)
    want = np.array([st.dirichlet.logpdf(
        np.asarray(v, np.float64) / np.sum(np.asarray(v, np.float64)), a)
        for v in vals])
    np.testing.assert_allclose(got, want, rtol=TOL(5.0), atol=TOL(5.0))


def test_dirichlet_out_of_support():
    d = pm.Dirichlet.dist(a=np.array([2.0, 2.0, 2.0]))
    got = _logp(d, np.array([-0.1, 0.6, 0.5]))
    assert not np.isfinite(got) or got < -1e6


MULTINOMIAL_CELLS = [
    (1, np.array([0.2, 0.3, 0.5])),
    (5, np.array([0.2, 0.3, 0.5])),
    (100, np.array([1 / 3] * 3)),
    (1000, np.array([0.05, 0.05, 0.9])),       # near-degenerate p
    (50, np.array([0.1, 0.2, 0.3, 0.4])),      # k=4
]


@pytest.mark.parametrize("n,p", MULTINOMIAL_CELLS,
                         ids=[f"n{n}-k{len(p)}" for n, p in MULTINOMIAL_CELLS])
def test_multinomial_matrix(n, p):
    rng = np.random.default_rng(5)
    vals = rng.multinomial(n, p, size=6)
    vals[0] = 0
    vals[0, -1] = n          # all mass in one cell
    d = pm.Multinomial.dist(n=n, p=p)
    got = np.asarray(d.logp(vals))
    want = np.array([st.multinomial.logpmf(v, n, p) for v in vals])
    np.testing.assert_allclose(got, want, rtol=TOL(5.0), atol=TOL(5.0 * n / 5))


def test_multinomial_out_of_support():
    d = pm.Multinomial.dist(n=10, p=np.array([0.5, 0.5]))
    for bad in ([4, 5],        # sum != n
                [-1, 11]):     # negative count
        got = np.asarray(d.logp(np.array(bad)))
        assert not np.isfinite(np.sum(got)) or np.sum(got) < -1e6


WISHART_CELLS = [(p, dnu, kind)
                 for p in (2, 3)
                 for dnu in (1.0, 3.0, 17.0)
                 for kind in ("diag", "corr")]


@pytest.mark.parametrize("p,dnu,kind", WISHART_CELLS,
                         ids=[f"p{p}-nu+{dnu}-{kind}"
                              for p, dnu, kind in WISHART_CELLS])
def test_wishart_matrix(p, dnu, kind):
    nu = p + dnu
    V = _spd(p, kind, seed=6)
    Xs = st.wishart.rvs(int(np.ceil(nu)), V, size=4,
                        random_state=np.random.default_rng(7))
    if p == 1:
        Xs = Xs.reshape(4, 1, 1)
    with pytest.warns(UserWarning, match="Wishart"):
        d = pm.Wishart.dist(nu=nu, V=V)
    got = np.array([_logp(d, X) for X in Xs])
    want = np.array([st.wishart.logpdf(X, nu, V) for X in Xs])
    np.testing.assert_allclose(got, want, rtol=TOL(20.0), atol=TOL(20.0))


@pytest.mark.parametrize("eta", [0.7, 1.0, 2.0, 5.0])
def test_lkjcorr_n2_exact_density(eta):
    """For n=2 the single correlation r satisfies (1+r)/2 ~ Beta(eta, eta),
    so the normalized LKJ density is (1/2) * Beta-pdf((1+r)/2; eta, eta)."""
    d = pm.LKJCorr.dist(eta=eta, n=2)
    rs = np.array([-0.9, -0.5, 0.0, 0.3, 0.8])
    got = np.array([_logp(d, np.array([r])) for r in rs])
    want = st.beta.logpdf((1.0 + rs) / 2.0, eta, eta) - np.log(2.0)
    np.testing.assert_allclose(got, want, rtol=TOL(10.0), atol=TOL(10.0))


def test_lkjcorr_n3_uniform_normalization():
    """eta=1 is the uniform prior over correlation matrices; for n=3 the
    elliptope volume is pi^2/2, so logp == -log(pi^2/2) everywhere valid."""
    d = pm.LKJCorr.dist(eta=1.0, n=3)
    want = -np.log(np.pi ** 2 / 2.0)
    for r in ([0.0, 0.0, 0.0], [0.3, -0.2, 0.1], [0.6, 0.5, 0.4]):
        got = _logp(d, np.array(r))
        np.testing.assert_allclose(got, want, rtol=TOL(10.0), atol=TOL(10.0))


def test_lkjcholeskycov_density_normalized():
    """The packed-cholesky LKJ density (n=2, normalized sd_dist) must
    integrate to 1 over (L00>0, L10, L11>0) — the check that caught the
    reference's normalizing-constant sign bug (multivariate.py:1418 adds
    +log Z instead of -log Z; benign for MCMC, wrong for evidence)."""
    import jax
    import jax.numpy as jnp
    d = pm.LKJCholeskyCov.dist(eta=2.0, n=2,
                               sd_dist=pm.HalfNormal.dist(sigma=1.0))
    g0 = np.linspace(1e-3, 6.0, 100)
    g1 = np.linspace(-6.0, 6.0, 200)
    g2 = np.linspace(1e-3, 6.0, 100)
    G = np.stack(np.meshgrid(g0, g1, g2, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(floatX())
    lp = np.asarray(jax.jit(jax.vmap(lambda v: d.logp(v)))(jnp.asarray(G)))
    w = (g0[1] - g0[0]) * (g1[1] - g1[0]) * (g2[1] - g2[0])
    integral = np.exp(lp.astype(np.float64)).sum() * w
    np.testing.assert_allclose(integral, 1.0, rtol=0.02)


def test_lkjcorr_invalid_matrix_rejected():
    # r12=r13=r23=0.99 with alternating signs is not PSD
    d = pm.LKJCorr.dist(eta=2.0, n=3)
    got = _logp(d, np.array([0.99, 0.99, -0.99]))
    assert not np.isfinite(got) or got < -1e6


MATNORM_CELLS = list(itertools.product(("cov", "chol", "tau"),
                                       ("cov", "chol", "tau")))


@pytest.mark.parametrize("rowp,colp", MATNORM_CELLS,
                         ids=[f"row-{r}_col-{c}" for r, c in MATNORM_CELLS])
def test_matrixnormal_param_grid(rowp, colp):
    m, n = 3, 4
    rowcov = _spd(m, "corr", seed=8)
    colcov = _spd(n, "diag", seed=9)
    rng = np.random.default_rng(10)
    M = rng.normal(size=(m, n))
    X = rng.normal(size=(m, n)) + M

    kw = {}
    for cov, which, p in ((rowcov, "row", rowp), (colcov, "col", colp)):
        if p == "cov":
            kw[f"{which}cov"] = cov
        elif p == "chol":
            kw[f"{which}chol"] = np.linalg.cholesky(cov)
        else:
            kw[f"{which}tau"] = np.linalg.inv(cov)
    d = pm.MatrixNormal.dist(mu=M, shape=(m, n), **kw)
    got = _logp(d, X)
    want = st.matrix_normal.logpdf(X, mean=M, rowcov=rowcov, colcov=colcov)
    scale = 10.0 if "tau" in (rowp, colp) else 2.0
    np.testing.assert_allclose(got, want, rtol=TOL(scale), atol=TOL(scale))


KRON_CELLS = [((2, 3), None), ((2, 3), 0.5), ((3, 4), None), ((3, 4), 1.5)]


@pytest.mark.parametrize("dims,sigma", KRON_CELLS,
                         ids=[f"{a}x{b}-sigma{s}" for (a, b), s in KRON_CELLS])
def test_kroneckernormal_vs_dense(dims, sigma):
    covs = [_spd(k, "corr", seed=11 + i) for i, k in enumerate(dims)]
    N = int(np.prod(dims))
    K = np.kron(covs[0], covs[1])
    if sigma is not None:
        K = K + sigma ** 2 * np.eye(N)
    rng = np.random.default_rng(12)
    mu = rng.normal(scale=0.3, size=N)
    vals = rng.multivariate_normal(mu, K, size=5)
    d = pm.KroneckerNormal.dist(mu=mu, covs=covs, sigma=sigma)
    got = _logp(d, vals)
    want = st.multivariate_normal.logpdf(vals, mu, K)
    np.testing.assert_allclose(got, want, rtol=TOL(10.0), atol=TOL(10.0))


class TestRandomMoments:
    """random() draws reproduce the analytic moments of each family —
    correctness beyond the shape contracts in test_distributions_random."""

    def test_mvnormal_all_parametrizations(self):
        cov = _spd(3, "corr", seed=20)
        mu = np.array([1.0, -0.5, 0.2])
        np.random.seed(21)
        for kwargs in _param_variants(cov).values():
            d = pm.MvNormal.dist(mu=mu, **kwargs)
            draws = np.asarray(d.random(size=8000))
            np.testing.assert_allclose(draws.mean(0), mu, atol=0.06)
            np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.08)

    def test_mvstudentt_scales_cov(self):
        cov = _spd(2, "diag", seed=22)
        nu = 7.0
        d = pm.MvStudentT.dist(nu=nu, mu=np.zeros(2), cov=cov)
        np.random.seed(23)
        draws = np.asarray(d.random(size=20000))
        # Var = nu/(nu-2) * Sigma
        np.testing.assert_allclose(np.cov(draws.T), cov * nu / (nu - 2.0),
                                   rtol=0.1, atol=0.05)

    def test_wishart_mean(self):
        V = _spd(2, "corr", seed=24)
        nu = 9
        with pytest.warns(UserWarning, match="Wishart"):
            d = pm.Wishart.dist(nu=nu, V=V)
        np.random.seed(25)
        draws = np.asarray(d.random(size=4000))
        np.testing.assert_allclose(draws.mean(0), nu * V, rtol=0.08,
                                   atol=0.1)

    def test_dirichlet_moments(self):
        a = np.array([1.0, 3.0, 6.0])
        d = pm.Dirichlet.dist(a=a)
        np.random.seed(26)
        draws = np.asarray(d.random(size=12000))
        a0 = a.sum()
        np.testing.assert_allclose(draws.mean(0), a / a0, atol=0.01)
        want_var = a * (a0 - a) / (a0 ** 2 * (a0 + 1.0))
        np.testing.assert_allclose(draws.var(0), want_var, rtol=0.1)

    def test_multinomial_mean_cov(self):
        n, p = 40, np.array([0.2, 0.3, 0.5])
        d = pm.Multinomial.dist(n=n, p=p)
        np.random.seed(27)
        draws = np.asarray(d.random(size=8000))
        np.testing.assert_allclose(draws.mean(0), n * p, rtol=0.03)
        want_cov = n * (np.diag(p) - np.outer(p, p))
        np.testing.assert_allclose(np.cov(draws.T), want_cov, atol=0.35)

    def test_lkjcorr_r12_beta_identity(self):
        """(1 + r12)/2 ~ Beta(eta - 1 + n/2, .) marginally for every pair."""
        eta, n = 2.0, 3
        d = pm.LKJCorr.dist(eta=eta, n=n)
        np.random.seed(28)
        draws = np.asarray(d.random(size=6000))  # (., 3) packed upper tri
        b = eta - 1.0 + n / 2.0
        want_mean, want_var = 0.0, 4 * (b * b / ((2 * b) ** 2 * (2 * b + 1)))
        np.testing.assert_allclose(draws.mean(0), want_mean, atol=0.03)
        np.testing.assert_allclose(draws.var(0), want_var, rtol=0.15)

    def test_matrixnormal_row_col_cov(self):
        rowcov = _spd(2, "corr", seed=29)
        colcov = _spd(3, "diag", seed=30)
        d = pm.MatrixNormal.dist(mu=np.zeros((2, 3)), rowcov=rowcov,
                                 colcov=colcov, shape=(2, 3))
        np.random.seed(31)
        draws = np.asarray(d.random(size=12000))  # (., 2, 3)
        # E[X X^T] = rowcov * tr(colcov); E[X^T X] = colcov * tr(rowcov)
        xxt = np.einsum("bij,bkj->ik", draws, draws) / draws.shape[0]
        xtx = np.einsum("bji,bjk->ik", draws, draws) / draws.shape[0]
        np.testing.assert_allclose(xxt, rowcov * np.trace(colcov),
                                   rtol=0.1, atol=0.1)
        np.testing.assert_allclose(xtx, colcov * np.trace(rowcov),
                                   rtol=0.1, atol=0.1)

    def test_kroneckernormal_cov(self):
        covs = [_spd(2, "diag", seed=32), _spd(2, "corr", seed=33)]
        sigma = 0.5
        d = pm.KroneckerNormal.dist(mu=np.zeros(4), covs=covs, sigma=sigma)
        np.random.seed(34)
        draws = np.asarray(d.random(size=15000))
        want = np.kron(covs[0], covs[1]) + sigma ** 2 * np.eye(4)
        np.testing.assert_allclose(np.cov(draws.T), want, rtol=0.12,
                                   atol=0.12)


class TestBatchedValues:
    """(batch, event) value matrices hit the batched quadratic-form path."""

    def test_mvnormal_batch_matches_loop(self):
        cov = _spd(3, "corr", seed=13)
        rng = np.random.default_rng(14)
        vals = rng.multivariate_normal(np.zeros(3), cov, size=7)
        d = pm.MvNormal.dist(mu=np.zeros(3), cov=cov)
        batch = _logp(d, vals)
        loop = np.array([_logp(d, v) for v in vals])
        np.testing.assert_allclose(batch, loop, rtol=TOL(2.0), atol=TOL(2.0))

    def test_kron_batch_matches_loop(self):
        covs = [_spd(2, "diag", seed=15), _spd(3, "corr", seed=16)]
        rng = np.random.default_rng(17)
        vals = rng.normal(size=(5, 6))
        d = pm.KroneckerNormal.dist(mu=np.zeros(6), covs=covs)
        batch = _logp(d, vals)
        loop = np.array([_logp(d, v) for v in vals])
        np.testing.assert_allclose(batch, loop, rtol=TOL(2.0), atol=TOL(2.0))

    def test_mvstudentt_batch_matches_loop(self):
        cov = _spd(4, "illcond", seed=18)
        rng = np.random.default_rng(19)
        vals = rng.multivariate_normal(np.zeros(4), cov, size=6)
        d = pm.MvStudentT.dist(nu=7.0, mu=np.zeros(4), cov=cov)
        batch = _logp(d, vals)
        loop = np.array([_logp(d, v) for v in vals])
        np.testing.assert_allclose(batch, loop, rtol=TOL(5.0), atol=TOL(5.0))
