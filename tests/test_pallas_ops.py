"""Pallas fused stationary-covariance op: interpreter-mode kernel vs the
XLA fallback (forward + custom-VJP gradients), and the gp.cov dispatch
seam (cf. reference ``pymc3/gp/cov.py:262-440``; SURVEY §7.9)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymc3_tpu as pm
from pymc3_tpu.ops.pallas.gp_cov import (
    STATIONARY_KINDS, _fallback, stationary_cov)

@pytest.fixture(autouse=True)
def _force_f32():
    """The Pallas interpreter kernel is written for the TPU-native f32
    width; scope the x64 flip so the float64 CI sweep
    (PYMC3_TPU_FLOATX=float64, scripts/test.sh) isn't poisoned for every
    test that runs after this module."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", prev)


def _inputs(n=40, m=200, d=3, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d).astype(np.float32)
    Xs = rng.randn(m, d).astype(np.float32)
    return X, Xs


@pytest.mark.parametrize("kind", STATIONARY_KINDS)
def test_pallas_matches_fallback_forward(kind):
    X, Xs = _inputs()
    K_pl = stationary_cov(X, Xs, kind=kind, force_pallas=True,
                          interpret=True)
    K_ref = _fallback(kind, jnp.asarray(X), jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(K_pl), np.asarray(K_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("kind", STATIONARY_KINDS)
def test_custom_vjp_matches_autodiff(kind):
    """The closed-form two-matmul backward pass == autodiff through the
    plain fused-XLA forward."""
    X, Xs = _inputs(n=12, m=9, d=2, seed=1)
    # keep points apart: matern gradients are steep near r=0
    X, Xs = 2.0 * X, 2.0 * X[:9] + 3.0

    def loss_op(X_, Xs_):
        return jnp.sum(jnp.sin(stationary_cov(X_, Xs_, kind=kind,
                                              force_pallas=False)))

    def loss_ref(X_, Xs_):
        return jnp.sum(jnp.sin(_fallback(kind, X_, Xs_)))

    gx, gxs = jax.grad(loss_op, argnums=(0, 1))(jnp.asarray(X),
                                                jnp.asarray(Xs))
    rx, rxs = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(X),
                                                 jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gxs), np.asarray(rxs),
                               rtol=2e-4, atol=2e-5)


def test_pallas_padding_edge():
    """Non-multiple-of-128 shapes go through the padded tile path; padded
    rows must not contaminate the result."""
    X, Xs = _inputs(n=130, m=5, d=2, seed=2)
    K_pl = stationary_cov(X, Xs, kind="expquad", force_pallas=True,
                          interpret=True)
    K_ref = _fallback("expquad", jnp.asarray(X), jnp.asarray(Xs))
    assert K_pl.shape == (130, 5)
    np.testing.assert_allclose(np.asarray(K_pl), np.asarray(K_ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("cov_cls,kind", [
    (pm.gp.cov.ExpQuad, "expquad"),
    (pm.gp.cov.Matern52, "matern52"),
    (pm.gp.cov.Matern32, "matern32"),
    (pm.gp.cov.Matern12, "matern12"),
    (pm.gp.cov.Exponential, "exponential"),
])
def test_gp_cov_dispatches_fused(cov_cls, kind):
    """gp.cov stationary kernels route full() through the fused op and
    agree with the direct d²-space formula (incl. ls scaling + slicing)."""
    assert cov_cls._fused_kind == kind
    X = np.random.RandomState(3).randn(25, 2).astype(np.float32)
    cov = cov_cls(2, ls=np.array([0.7, 1.3], np.float32))
    K = np.asarray(cov.full(X).eval())
    Xl = X / np.array([0.7, 1.3], np.float32)
    K_ref = np.asarray(_fallback(
        kind, jnp.asarray(Xl - Xl.mean(0)), jnp.asarray(Xl - Xl.mean(0))))
    np.testing.assert_allclose(K, K_ref, rtol=2e-5, atol=2e-6)
    # symmetric PSD-ish sanity
    np.testing.assert_allclose(K, K.T, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.diag(K), 1.0, rtol=1e-5)


def test_gp_marginal_likelihood_gradient_through_fused():
    """End-to-end: d logp/d ls of a GP marginal likelihood flows through
    the custom-VJP op without error and matches finite differences."""
    rng = np.random.RandomState(4)
    X = rng.randn(30, 1).astype(np.float32)
    y = np.sin(X[:, 0]) + 0.1 * rng.randn(30).astype(np.float32)

    def mll(ls):
        K = stationary_cov(X / ls, None, kind="expquad")
        K = K + 0.1 * jnp.eye(30)
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        return -0.5 * y @ a - jnp.sum(jnp.log(jnp.diag(L)))

    g = float(jax.grad(mll)(jnp.float32(1.2)))
    eps = 1e-2
    fd = (float(mll(jnp.float32(1.2 + eps)))
          - float(mll(jnp.float32(1.2 - eps)))) / (2 * eps)
    assert abs(g - fd) < 5e-2 * max(1.0, abs(fd)), (g, fd)
