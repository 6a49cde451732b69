"""Transform jacobian-accounting matrix, mirroring the reference's
``TestElementWiseLogp`` grid (``pymc3/tests/test_transforms.py:223`` —
transformed-space model logp checked against dist-logp + log|J| across
dist x shape x transform cells, including ordered-composed transforms),
plus autodiff validation of every elementwise ``jacobian_det``."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pymc3_tpu as pm
from pymc3_tpu.distributions import transforms as tr
from pymc3_tpu.config import floatX


def TOL(scale=1.0):
    return (1e-6 if floatX() == "float64" else 2e-3) * scale


# ---------------------------------------------------------------------------
# jacobian_det vs autodiff of backward
# ---------------------------------------------------------------------------

ELEMENTWISE = [
    ("log", tr.log, np.array([-2.0, -0.5, 0.0, 1.3])),
    ("log_exp_m1", tr.log_exp_m1, np.array([-2.0, -0.5, 0.1, 2.0])),
    ("logodds", tr.logodds, np.array([-3.0, -1.0, 0.0, 2.5])),
    ("interval", tr.interval(-1.5, 2.5), np.array([-2.0, 0.0, 1.0, 3.0])),
    ("lowerbound", tr.lowerbound(0.5), np.array([-1.0, 0.0, 0.7, 2.0])),
    ("upperbound", tr.upperbound(3.0), np.array([-2.0, -0.3, 0.0, 1.0])),
]


@pytest.mark.parametrize("name,t,zs", ELEMENTWISE,
                         ids=[c[0] for c in ELEMENTWISE])
def test_elementwise_jacobian_matches_autodiff(name, t, zs):
    zs = zs.astype(floatX())
    got = np.asarray(t.jacobian_det(jnp.asarray(zs)))
    grad_bw = jax.vmap(jax.grad(lambda z: jnp.sum(t.backward(z))))
    want = np.log(np.abs(np.asarray(grad_bw(jnp.asarray(zs)))))
    np.testing.assert_allclose(np.broadcast_to(got, want.shape), want,
                               rtol=TOL(5), atol=TOL(5))


def test_ordered_jacobian_matches_slogdet():
    z = jnp.asarray(np.array([0.3, -1.0, 0.5, -0.2], dtype=floatX()))
    got = float(np.sum(np.asarray(tr.ordered.jacobian_det(z))))
    J = jax.jacfwd(tr.ordered.backward)(z)
    want = float(np.linalg.slogdet(np.asarray(J, np.float64))[1])
    np.testing.assert_allclose(got, want, rtol=TOL(5), atol=TOL(5))


def test_circular_jacobian_is_zero():
    z = jnp.asarray(np.array([-3.0, 0.0, 2.0], dtype=floatX()))
    got = np.asarray(tr.circular.jacobian_det(z))
    np.testing.assert_allclose(np.broadcast_to(got, (3,)), 0.0, atol=TOL())


def test_stickbreaking_jacobian_matches_slogdet():
    """Square jacobian of the first K-1 simplex coordinates wrt z."""
    z = jnp.asarray(np.array([0.4, -0.7, 1.1], dtype=floatX()))
    got = float(np.sum(np.asarray(tr.stick_breaking.jacobian_det(z))))
    J = jax.jacfwd(lambda w: tr.stick_breaking.backward(w)[:-1])(z)
    want = float(np.linalg.slogdet(np.asarray(J, np.float64))[1])
    np.testing.assert_allclose(got, want, rtol=TOL(10), atol=TOL(10))


# ---------------------------------------------------------------------------
# model-level accounting: logp(transformed point) = logp_nojac + sum log|J|
# ---------------------------------------------------------------------------

def check_model_accounting(dist_cls, params, shape, transform=None, seed=0):
    with pm.Model() as m:
        kwargs = dict(params)
        if shape is not None:
            kwargs["shape"] = shape
        if transform is not None:
            kwargs["transform"] = transform
        x = dist_cls("x", **kwargs)
    (rv,) = m.free_RVs
    assert rv.transform is not None
    rng = np.random.default_rng(seed)
    z = rng.normal(scale=0.8, size=np.shape(rv.test_value)).astype(floatX())
    point = {rv.name: z}
    got = m.logp(point)
    zj = jnp.asarray(z)
    backward_val = rv.transform.backward(zj)
    lp = np.float64(np.sum(np.asarray(
        rv.distribution.logp(backward_val))))
    jac = np.float64(np.sum(np.asarray(rv.transform.jacobian_det(zj))))
    np.testing.assert_allclose(got, lp + jac, rtol=TOL(10), atol=TOL(10))
    # and logp_nojac drops exactly the jacobian
    np.testing.assert_allclose(got - m.logp_nojac(point), jac,
                               rtol=TOL(10), atol=TOL(10))


MODEL_CELLS = [
    ("halfnormal", pm.HalfNormal, dict(sigma=2.5), None),
    ("halfnormal-vec", pm.HalfNormal, dict(sigma=2.5), (3,)),
    ("exponential", pm.Exponential, dict(lam=2.0), None),
    ("exponential-vec", pm.Exponential, dict(lam=2.0), (4,)),
    ("beta", pm.Beta, dict(alpha=1.5, beta=2.0), None),
    ("beta-vec", pm.Beta, dict(alpha=1.5, beta=2.0), (3,)),
    ("uniform", pm.Uniform, dict(lower=-2.0, upper=3.0), None),
    ("uniform-vec", pm.Uniform, dict(lower=-2.0, upper=3.0), (2,)),
    ("gamma", pm.Gamma, dict(alpha=2.0, beta=1.0), None),
    ("halfcauchy", pm.HalfCauchy, dict(beta=1.0), None),
    ("lognormal", pm.Lognormal, dict(mu=0.3, sigma=0.7), None),
    ("vonmises", pm.VonMises, dict(mu=0.0, kappa=2.0), None),
    ("dirichlet", pm.Dirichlet, dict(a=np.array([1.5, 2.5, 3.0])), None),
]


@pytest.mark.parametrize("name,cls,params,shape", MODEL_CELLS,
                         ids=[c[0] for c in MODEL_CELLS])
def test_model_jacobian_accounting(name, cls, params, shape):
    check_model_accounting(cls, params, shape)


ORDERED_CELLS = [
    ("normal-ordered", pm.Normal, dict(mu=0.0, sigma=1.0), tr.ordered),
    ("halfnormal-ordered", pm.HalfNormal, dict(sigma=1.0),
     tr.Chain([tr.log, tr.ordered])),
    ("uniform-ordered", pm.Uniform, dict(lower=0.0, upper=1.0),
     tr.Chain([tr.logodds, tr.ordered])),
]


@pytest.mark.parametrize("name,cls,params,transform", ORDERED_CELLS,
                         ids=[c[0] for c in ORDERED_CELLS])
def test_ordered_composed_accounting(name, cls, params, transform):
    """Ordered (and chained constrained+ordered) transforms on vector RVs
    keep the jacobian accounting exact (cf. reference test_*_ordered)."""
    check_model_accounting(cls, params, (4,), transform=transform)


def test_chain_jacobian_matches_slogdet():
    """Chained log∘ordered jacobian equals autodiff slogdet of the composed
    backward map."""
    chain = tr.Chain([tr.log, tr.ordered])
    z = jnp.asarray(np.array([0.2, -0.8, 0.4], dtype=floatX()))
    got = float(np.sum(np.asarray(chain.jacobian_det(z))))
    J = jax.jacfwd(chain.backward)(z)
    want = float(np.linalg.slogdet(np.asarray(J, np.float64))[1])
    np.testing.assert_allclose(got, want, rtol=TOL(10), atol=TOL(10))


def test_transformed_gradient_finite():
    """Gradients of the transformed-space logp are finite across the grid —
    the property NUTS actually needs at the boundary-pushed points."""
    with pm.Model() as m:
        pm.HalfNormal("a", sigma=1.0)
        pm.Beta("b", alpha=0.5, beta=0.5)
        pm.Uniform("c", lower=0.0, upper=1.0)
        pm.Dirichlet("d", a=np.array([0.7, 1.0, 2.0]))
    fn = m.make_logp_fn()
    g = jax.grad(fn)
    rng = np.random.default_rng(1)
    for scale in (0.1, 2.0, 8.0):   # deep into the tails of z-space
        q = rng.normal(scale=scale, size=m.ndim).astype(floatX())
        grad = np.asarray(g(jnp.asarray(q)))
        assert np.all(np.isfinite(grad)), (scale, grad)
