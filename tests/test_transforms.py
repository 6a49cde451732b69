"""Transform tests (cf. ``pymc3/tests/test_transforms.py``):
``forward∘backward = id`` and jacobian determinants vs numeric jacobians."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pymc3_tpu as pm
from pymc3_tpu.distributions import transforms as tr


def check_roundtrip(transform, x):
    """backward(forward(x)) == x."""
    x = jnp.asarray(x, jnp.float32)
    z = transform.forward(x, {}, {})
    x2 = transform.backward(z, {}, {})
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-3,
                               atol=5e-4)


def check_jacobian(transform, z):
    """jacobian_det(z) == log|det d backward/dz| numerically."""
    z = jnp.asarray(z, jnp.float32)
    jd = float(np.sum(np.asarray(transform.jacobian_det(z, {}, {}))))

    flat_z = z.ravel()

    def bwd_flat(zf):
        return jnp.ravel(transform.backward(zf.reshape(z.shape), {}, {}))

    J = jax.jacfwd(bwd_flat)(flat_z)
    J = np.asarray(J)
    if J.shape[0] != J.shape[1]:
        # sum-constrained transforms (simplex): density lives on the free
        # coordinates — drop the determined last coordinate
        J = J[:-1, :]
    sign, expected = np.linalg.slogdet(J)
    assert abs(jd - expected) < 1e-3, (jd, expected)


class TestSimpleTransforms:
    def test_log(self):
        check_roundtrip(tr.log, np.array([0.1, 1.0, 10.0]))
        check_jacobian(tr.log, np.array([-1.0, 0.0, 2.0]))

    def test_logodds(self):
        check_roundtrip(tr.logodds, np.array([0.1, 0.5, 0.9]))
        check_jacobian(tr.logodds, np.array([-2.0, 0.0, 1.5]))

    def test_log_exp_m1(self):
        check_roundtrip(tr.log_exp_m1, np.array([0.1, 1.0, 5.0]))
        check_jacobian(tr.log_exp_m1, np.array([-2.0, 0.0, 3.0]))

    def test_interval(self):
        t = tr.Interval(-1.0, 2.0)
        check_roundtrip(t, np.array([-0.9, 0.0, 1.9]))
        check_jacobian(t, np.array([-3.0, 0.0, 2.0]))

    def test_lowerbound(self):
        t = tr.lowerbound(1.5)
        check_roundtrip(t, np.array([1.6, 2.0, 10.0]))
        check_jacobian(t, np.array([-1.0, 0.0, 2.0]))

    def test_upperbound(self):
        t = tr.upperbound(3.0)
        check_roundtrip(t, np.array([-5.0, 0.0, 2.9]))
        check_jacobian(t, np.array([-1.0, 0.0, 2.0]))

    def test_circular(self):
        check_roundtrip(tr.circular, np.array([-3.0, 0.0, 3.0]))


class TestVectorTransforms:
    def test_stickbreaking_roundtrip(self):
        x = np.array([0.2, 0.3, 0.4, 0.1])
        check_roundtrip(tr.stick_breaking, x)

    def test_stickbreaking_sums_to_one(self):
        z = np.random.randn(5).astype(np.float32)
        x = np.asarray(tr.stick_breaking.backward(jnp.asarray(z), {}, {}))
        assert abs(x.sum() - 1.0) < 1e-5
        assert np.all(x > 0)

    def test_stickbreaking_jacobian(self):
        z = np.random.default_rng(0).normal(size=4).astype(np.float32)
        check_jacobian(tr.stick_breaking, z)

    def test_ordered_roundtrip(self):
        x = np.array([-1.0, 0.5, 2.0, 3.0])
        check_roundtrip(tr.ordered, x)

    def test_ordered_monotone(self):
        z = np.random.default_rng(1).normal(size=5).astype(np.float32)
        x = np.asarray(tr.ordered.backward(jnp.asarray(z), {}, {}))
        assert np.all(np.diff(x) > 0)

    def test_ordered_jacobian(self):
        z = np.random.default_rng(2).normal(size=4).astype(np.float32)
        check_jacobian(tr.ordered, z)

    def test_sum_to_1(self):
        x = np.array([0.25, 0.25, 0.5])
        check_roundtrip(tr.sum_to_1, x)


class TestChain:
    def test_chain_roundtrip(self):
        chain = tr.Chain([tr.log, tr.ordered])
        x = np.array([0.1, 0.5, 2.0])
        check_roundtrip(chain, x)


class TestTransformedSampling:
    """Transformed RVs sample in unconstrained space but report constrained
    values with correct distributions."""

    def test_halfnormal_positive(self):
        with pm.Model() as model:
            x = pm.HalfNormal("x", 1.0)
            trace = pm.sample(draws=1000, tune=500, chains=2,
                              progressbar=False, random_seed=1,
                              compute_convergence_checks=False)
        vals = trace["x"]
        assert np.all(vals > 0)
        # E|N(0,1)| = sqrt(2/pi)
        assert abs(vals.mean() - np.sqrt(2 / np.pi)) < 0.06

    def test_dirichlet_simplex(self):
        with pm.Model() as model:
            p = pm.Dirichlet("p", a=np.ones(3, dtype=np.float32))
            trace = pm.sample(draws=1000, tune=500, chains=2,
                              progressbar=False, random_seed=2,
                              compute_convergence_checks=False)
        vals = trace["p"]
        np.testing.assert_allclose(vals.sum(axis=-1), 1.0, rtol=1e-4)
        np.testing.assert_allclose(vals.mean(axis=0), [1 / 3] * 3,
                                   atol=0.05)

    def test_uniform_interval(self):
        with pm.Model() as model:
            u = pm.Uniform("u", lower=2.0, upper=5.0)
            trace = pm.sample(draws=1000, tune=500, chains=2,
                              progressbar=False, random_seed=3,
                              compute_convergence_checks=False)
        vals = trace["u"]
        assert np.all((vals >= 2.0) & (vals <= 5.0))
        assert abs(vals.mean() - 3.5) < 0.15
