"""Kernel-by-kernel covariance pins mirroring the reference's
``pymc3/tests/test_gp.py:1`` matrix-value methodology (every kernel's
K(X), K(X, Xs) and diag checked against closed-form numpy on a fixed X,
plus combination algebra, exponentiation, active_dims slicing, and
stability properties)."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu.config import floatX

gp = pm.gp


def TOL(scale=1.0):
    return (1e-8 if floatX() == "float64" else 2e-5) * scale


def ev(node):
    return np.asarray(getattr(node, "test_value", node))


X = np.linspace(0.0, 1.0, 10)[:, None]
Xs = np.linspace(-0.5, 1.5, 5)[:, None]


def _r2(A, B):
    return ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)


def _check(cov, want_fn, rtol_scale=1.0):
    """K(X), K(X, Xs), diag(K) all match the closed form."""
    full = ev(cov(X))
    np.testing.assert_allclose(full, want_fn(X, X), rtol=TOL(rtol_scale),
                               atol=TOL(rtol_scale))
    cross = ev(cov(X, Xs))
    np.testing.assert_allclose(cross, want_fn(X, Xs), rtol=TOL(rtol_scale),
                               atol=TOL(rtol_scale))
    dg = ev(cov(X, diag=True))
    np.testing.assert_allclose(dg, np.diag(want_fn(X, X)),
                               rtol=TOL(rtol_scale), atol=TOL(rtol_scale))
    # symmetry + PSD-ish of the full gram
    np.testing.assert_allclose(full, full.T, atol=TOL(10 * rtol_scale))


ls = 0.4


KERNELS = [
    ("expquad", gp.cov.ExpQuad(1, ls),
     lambda A, B: np.exp(-0.5 * _r2(A, B) / ls ** 2)),
    ("matern52", gp.cov.Matern52(1, ls),
     lambda A, B: (lambda r: (1 + np.sqrt(5.0) * r / ls
                              + 5.0 * r ** 2 / (3.0 * ls ** 2))
                   * np.exp(-np.sqrt(5.0) * r / ls))(np.sqrt(_r2(A, B)))),
    ("matern32", gp.cov.Matern32(1, ls),
     lambda A, B: (lambda r: (1 + np.sqrt(3.0) * r / ls)
                   * np.exp(-np.sqrt(3.0) * r / ls))(np.sqrt(_r2(A, B)))),
    ("matern12", gp.cov.Matern12(1, ls),
     lambda A, B: np.exp(-np.sqrt(_r2(A, B)) / ls)),
    ("exponential", gp.cov.Exponential(1, ls),
     lambda A, B: np.exp(-0.5 * np.sqrt(_r2(A, B)) / ls)),
    ("cosine", gp.cov.Cosine(1, ls),
     lambda A, B: np.cos(2.0 * np.pi * np.sqrt(_r2(A, B)) / ls)),
    ("ratquad", gp.cov.RatQuad(1, alpha=2.0, ls=ls),
     lambda A, B: (1 + 0.5 * _r2(A, B) / (2.0 * ls ** 2)) ** (-2.0)),
    ("periodic", gp.cov.Periodic(1, period=0.7, ls=ls),
     lambda A, B: np.exp(-2.0 * (np.sin(
         np.pi * np.abs(A - B.T) / 0.7) ** 2) / ls ** 2)),
    ("linear", gp.cov.Linear(1, c=0.3),
     lambda A, B: (A - 0.3) @ (B - 0.3).T),
    ("polynomial", gp.cov.Polynomial(1, c=0.3, d=2, offset=0.5),
     lambda A, B: ((A - 0.3) @ (B - 0.3).T + 0.5) ** 2),
    ("constant", gp.cov.Constant(2.5),
     lambda A, B: np.full((A.shape[0], B.shape[0]), 2.5)),
]


@pytest.mark.parametrize("name,cov,want", KERNELS,
                         ids=[k[0] for k in KERNELS])
def test_kernel_matrix_values(name, cov, want):
    _check(cov, want, rtol_scale=50.0 if name == "periodic" else 10.0)


def test_whitenoise():
    cov = gp.cov.WhiteNoise(0.5)
    np.testing.assert_allclose(ev(cov(X)), 0.25 * np.eye(10), atol=TOL(10))
    # cross-covariance of white noise is zero
    np.testing.assert_allclose(ev(cov(X, Xs)), 0.0, atol=TOL(10))
    np.testing.assert_allclose(ev(cov(X, diag=True)), 0.25, atol=TOL(10))


class TestCombinationAlgebra:
    base = gp.cov.ExpQuad(1, ls)

    def _base_mat(self, A, B):
        return np.exp(-0.5 * _r2(A, B) / ls ** 2)

    def test_add_scalar_and_kernel(self):
        cov = self.base + 2.0 + gp.cov.Constant(1.0)
        want = self._base_mat(X, X) + 3.0
        np.testing.assert_allclose(ev(cov(X)), want, rtol=TOL(10),
                                   atol=TOL(10))

    def test_radd_rmul(self):
        cov1 = 2.0 + self.base
        cov2 = 3.0 * self.base
        np.testing.assert_allclose(ev(cov1(X)), 2.0 + self._base_mat(X, X),
                                   rtol=TOL(10), atol=TOL(10))
        np.testing.assert_allclose(ev(cov2(X)), 3.0 * self._base_mat(X, X),
                                   rtol=TOL(10), atol=TOL(10))

    def test_prod_of_kernels(self):
        cov = self.base * gp.cov.Linear(1, c=0.0)
        want = self._base_mat(X, X) * (X @ X.T)
        np.testing.assert_allclose(ev(cov(X)), want, rtol=TOL(10),
                                   atol=TOL(10))

    def test_nested_combinations_flatten(self):
        cov = (self.base + self.base) + self.base
        assert len(cov.factor_list) == 3
        np.testing.assert_allclose(ev(cov(X)), 3 * self._base_mat(X, X),
                                   rtol=TOL(10), atol=TOL(10))

    def test_exponentiated(self):
        cov = self.base ** 2
        np.testing.assert_allclose(ev(cov(X)), self._base_mat(X, X) ** 2,
                                   rtol=TOL(10), atol=TOL(10))

    def test_matrix_addend(self):
        M = np.eye(10) * 0.1
        cov = self.base + M
        np.testing.assert_allclose(ev(cov(X)), self._base_mat(X, X) + M,
                                   rtol=TOL(10), atol=TOL(10))


class TestActiveDims:
    def test_slicing_selects_columns(self):
        X2 = np.hstack([X, 100.0 * np.ones_like(X)])
        cov0 = gp.cov.ExpQuad(2, ls, active_dims=[0])
        want = np.exp(-0.5 * _r2(X, X) / ls ** 2)
        np.testing.assert_allclose(ev(cov0(X2)), want, rtol=TOL(10),
                                   atol=TOL(10))

    def test_additive_over_dims(self):
        rng = np.random.default_rng(0)
        X2 = rng.normal(size=(8, 2))
        cov = (gp.cov.ExpQuad(2, ls, active_dims=[0])
               + gp.cov.ExpQuad(2, ls, active_dims=[1]))
        a = np.exp(-0.5 * _r2(X2[:, :1], X2[:, :1]) / ls ** 2)
        b = np.exp(-0.5 * _r2(X2[:, 1:], X2[:, 1:]) / ls ** 2)
        np.testing.assert_allclose(ev(cov(X2)), a + b, rtol=TOL(10),
                                   atol=TOL(10))

    def test_multidim_anisotropic_ls(self):
        rng = np.random.default_rng(1)
        X2 = rng.normal(size=(7, 2))
        lss = np.array([0.3, 0.9])
        cov = gp.cov.ExpQuad(2, ls=lss)
        scaled = X2 / lss
        want = np.exp(-0.5 * _r2(scaled, scaled))
        np.testing.assert_allclose(ev(cov(X2)), want, rtol=TOL(10),
                                   atol=TOL(10))


class TestStability:
    def test_zero_distance_exact_one(self):
        """Stationary kernels must hit exactly their variance at r=0 —
        no sqrt-at-zero NaN from the distance gradient trick."""
        for cov in (gp.cov.ExpQuad(1, ls), gp.cov.Matern52(1, ls),
                    gp.cov.Matern32(1, ls), gp.cov.Exponential(1, ls)):
            K = ev(cov(X))
            np.testing.assert_allclose(np.diag(K), 1.0, atol=TOL(100))

    def test_gram_is_psd(self):
        for cov in (gp.cov.ExpQuad(1, ls), gp.cov.Matern32(1, ls),
                    gp.cov.Periodic(1, period=0.7, ls=ls)):
            K = ev(cov(X)).astype(np.float64)
            w = np.linalg.eigvalsh(K + 1e-8 * np.eye(10))
            assert np.all(w > -1e-6)

    @pytest.mark.parametrize("cls", [gp.cov.ExpQuad, gp.cov.Matern52,
                                     gp.cov.Matern32, gp.cov.Exponential],
                             ids=lambda c: c.__name__)
    def test_gradient_finite_with_duplicate_rows(self, cls):
        """d/dX of the gram sum stays finite when X has duplicate rows
        (the sqrt-of-zero-distance gradient hazard)."""
        import jax
        import jax.numpy as jnp
        from pymc3_tpu.node import NamedNode, evaluate
        Xdup = np.vstack([X, X[:1]]).astype(floatX())
        x_node = NamedNode()
        x_node.name = "Xin"
        x_node._test_value = Xdup
        gram = cls(1, 0.5)(x_node)  # symbolic path, as inside model logp

        def gram_sum(x):
            return jnp.sum(evaluate(gram, {"Xin": x}))

        val = jax.grad(gram_sum)(jnp.asarray(Xdup))
        assert np.all(np.isfinite(np.asarray(val)))
