"""GP tests (cf. ``pymc3/tests/test_gp.py``): kernel math vs hand
computation, marginal/conditional correctness vs explicit cholesky."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu.node import evaluate


def _eval(node):
    return np.asarray(evaluate(node, {}))


class TestCovKernels:
    X = np.linspace(0, 1, 10)[:, None].astype(np.float32)

    def test_expquad_vs_hand(self):
        ls = 0.3
        cov = pm.gp.cov.ExpQuad(1, ls)
        K = _eval(cov(self.X))
        d2 = (self.X - self.X.T) ** 2
        np.testing.assert_allclose(K, np.exp(-0.5 * d2 / ls ** 2),
                                   rtol=1e-4, atol=1e-5)

    def test_matern52_diag_ones(self):
        cov = pm.gp.cov.Matern52(1, 0.5)
        np.testing.assert_allclose(_eval(cov(self.X, diag=True)),
                                   np.ones(10), atol=1e-5)

    def test_add_prod_algebra(self):
        k1 = pm.gp.cov.ExpQuad(1, 0.2)
        k2 = pm.gp.cov.WhiteNoise(0.1)
        K = _eval((k1 + k2)(self.X))
        np.testing.assert_allclose(
            K, _eval(k1(self.X)) + _eval(k2(self.X)), rtol=1e-5)
        K3 = _eval((2.0 * k1)(self.X))
        np.testing.assert_allclose(K3, 2 * _eval(k1(self.X)), rtol=1e-5)

    def test_periodic_psd(self):
        cov = pm.gp.cov.Periodic(1, period=0.5, ls=0.3)
        K = _eval(cov(self.X))
        w = np.linalg.eigvalsh(K + 1e-5 * np.eye(10))
        assert np.all(w > 0)

    def test_linear(self):
        cov = pm.gp.cov.Linear(1, c=0.5)
        K = _eval(cov(self.X))
        hand = (self.X - 0.5) @ (self.X - 0.5).T
        np.testing.assert_allclose(K, hand, rtol=1e-4, atol=1e-5)

    def test_kron(self):
        X1 = np.linspace(0, 1, 3)[:, None]
        k = pm.gp.cov.Kron([pm.gp.cov.ExpQuad(1, 0.3),
                            pm.gp.cov.ExpQuad(1, 0.4)])
        X = np.concatenate([np.repeat(X1, 3, 0),
                            np.tile(X1, (3, 1))], axis=1).astype(np.float32)
        K = _eval(k(X))
        assert K.shape == (9, 9)
        np.testing.assert_allclose(K, K.T, atol=1e-5)

    def test_active_dims(self):
        X = np.random.randn(5, 2).astype(np.float32)
        cov = pm.gp.cov.ExpQuad(2, ls=0.5, active_dims=[0])
        K = _eval(cov(X))
        cov1 = pm.gp.cov.ExpQuad(1, ls=0.5)
        K1 = _eval(cov1(X[:, :1]))
        np.testing.assert_allclose(K, K1, rtol=1e-5)

    def test_symbolic_lengthscale(self):
        """Lengthscale as a model RV traces into the kernel."""
        with pm.Model() as model:
            ls = pm.Gamma("ls", 2, 2)
            cov = pm.gp.cov.ExpQuad(1, ls)
            node = cov(self.X)
            assert hasattr(node, "test_value")
            lp = model.logp()
        assert np.isfinite(lp)


class TestMarginal:
    def setup_method(self):
        np.random.seed(1)
        self.n = 25
        self.X = np.linspace(0, 1, self.n)[:, None].astype(np.float32)
        f_true = np.sin(4 * self.X[:, 0])
        self.y = (f_true + 0.1 * np.random.randn(self.n)).astype(np.float32)

    def test_marginal_likelihood_logp(self):
        """Model logp must equal the closed-form MvNormal logp."""
        with pm.Model() as model:
            cov = pm.gp.cov.ExpQuad(1, 0.3)
            gp = pm.gp.Marginal(cov_func=cov)
            y_ = gp.marginal_likelihood("y", X=self.X, y=self.y, noise=0.1)
        lp = model.logp()
        from scipy.stats import multivariate_normal
        K = np.asarray(evaluate(cov(self.X), {})) + \
            0.1 ** 2 * np.eye(self.n)
        expected = multivariate_normal(np.zeros(self.n), K).logpdf(self.y)
        assert abs(lp - expected) < 0.1

    def test_conditional_matches_closed_form(self):
        """predict() equals the float64 closed-form GP conditional."""
        noise = 0.1
        Xnew = np.linspace(0.1, 0.9, 7)[:, None].astype(np.float32)
        with pm.Model() as model:
            cov = pm.gp.cov.ExpQuad(1, 0.3)
            gp = pm.gp.Marginal(cov_func=cov)
            gp.marginal_likelihood("y", X=self.X, y=self.y, noise=noise)
            mu, var = gp.predict(Xnew, point=model.test_point, diag=True)
        # closed form in float64
        def k(a, b):
            return np.exp(-0.5 * (a - b.T) ** 2 / 0.3 ** 2)
        Kxx = k(self.X.astype(np.float64), self.X.astype(np.float64))
        Kxs = k(self.X.astype(np.float64), Xnew.astype(np.float64))
        Kss = k(Xnew.astype(np.float64), Xnew.astype(np.float64))
        Ky = Kxx + noise ** 2 * np.eye(self.n)
        alpha = np.linalg.solve(Ky, self.y.astype(np.float64))
        mu_exact = Kxs.T @ alpha
        var_exact = np.diag(Kss - Kxs.T @ np.linalg.solve(Ky, Kxs))
        np.testing.assert_allclose(mu, mu_exact, atol=0.02)
        np.testing.assert_allclose(var, var_exact, atol=0.02)

    def test_sample_conditional(self):
        Xnew = np.linspace(-0.2, 1.2, 9)[:, None].astype(np.float32)
        with pm.Model() as model:
            cov = pm.gp.cov.ExpQuad(1, 0.3)
            gp = pm.gp.Marginal(cov_func=cov)
            gp.marginal_likelihood("y", X=self.X, y=self.y, noise=0.1)
            fcond = gp.conditional("fcond", Xnew=Xnew)
        assert fcond.dshape == (9,)

    def test_marginal_sparse_close_to_exact(self):
        with pm.Model() as model:
            cov = pm.gp.cov.ExpQuad(1, 0.3)
            gp_e = pm.gp.Marginal(cov_func=cov)
            gp_e.marginal_likelihood("y_e", X=self.X, y=self.y, noise=0.1)
        lp_exact = model.logp()
        with pm.Model() as model_s:
            cov = pm.gp.cov.ExpQuad(1, 0.3)
            gp_s = pm.gp.MarginalSparse(cov_func=cov, approx="VFE")
            gp_s.marginal_likelihood("y_s", X=self.X, Xu=self.X.copy(),
                                     y=self.y, sigma=0.1)
        lp_sparse = model_s.logp()
        # with Xu = X the VFE bound is tight
        assert abs(lp_exact - lp_sparse) < 1.0


class TestLatent:
    def test_prior_shape_and_logp(self):
        X = np.linspace(0, 1, 7)[:, None].astype(np.float32)
        with pm.Model() as model:
            cov = pm.gp.cov.ExpQuad(1, 0.3)
            gp = pm.gp.Latent(cov_func=cov)
            f = gp.prior("f", X=X)
        assert "f_rotated_" in model.named_vars
        assert np.isfinite(model.logp())

    def test_conditional(self):
        X = np.linspace(0, 1, 7)[:, None].astype(np.float32)
        # offset from the training grid: conditional variance stays well
        # above float32 cholesky noise (at Xnew==X it is exactly singular)
        Xnew = np.linspace(0.06, 1.06, 5)[:, None].astype(np.float32)
        with pm.Model() as model:
            cov = pm.gp.cov.ExpQuad(1, 0.3)
            gp = pm.gp.Latent(cov_func=cov)
            f = gp.prior("f", X=X)
            f2 = gp.conditional("fnew", Xnew=Xnew)
        assert np.isfinite(model.logp())


class TestMarginalKron:
    def test_logp_matches_dense(self):
        np.random.seed(2)
        X1 = np.linspace(0, 1, 4)[:, None].astype(np.float32)
        X2 = np.linspace(0, 1, 3)[:, None].astype(np.float32)
        y = np.random.randn(12).astype(np.float32)
        sigma = 0.2
        covs = [pm.gp.cov.ExpQuad(1, 0.3), pm.gp.cov.ExpQuad(1, 0.4)]
        with pm.Model() as model:
            gp = pm.gp.MarginalKron(cov_funcs=covs)
            gp.marginal_likelihood("y", Xs=[X1, X2], y=y, sigma=sigma)
        lp = model.logp()
        K1 = np.asarray(evaluate(covs[0](X1), {}))
        K2 = np.asarray(evaluate(covs[1](X2), {}))
        K = np.kron(K1, K2) + sigma ** 2 * np.eye(12)
        from scipy.stats import multivariate_normal
        expected = multivariate_normal(np.zeros(12), K).logpdf(y)
        assert abs(lp - expected) < 0.2
