"""Shared model zoo (cf. ``pymc3/tests/models.py``)."""
import numpy as np

import pymc3_tpu as pm


def simple_model():
    """cf. ``models.py:25``."""
    mu = -2.1
    tau = 1.3
    with pm.Model() as model:
        pm.Normal("x", mu, tau=tau, shape=2, testval=np.zeros(2) * 0.1)
    return model.test_point, model, (mu, tau ** -0.5)


def simple_categorical():
    p = np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float32)
    v = np.array([0.0, 1.0, 2.0, 3.0])
    with pm.Model() as model:
        pm.Categorical("x", p, shape=3, testval=[1, 2, 3])
    mu = np.dot(p, v)
    var = np.dot(p, (v - mu) ** 2)
    return model.test_point, model, (mu, var)


def mv_simple():
    """cf. ``models.py:96``."""
    mu = np.array([-0.1, 0.5, 1.1], dtype=np.float32)
    p = np.array([[2.0, 0, 0], [0.05, 0.1, 0], [1.0, -0.05, 5.5]],
                 dtype=np.float32)
    tau = p @ p.T
    with pm.Model() as model:
        pm.MvNormal("x", mu=mu, tau=tau, shape=3,
                    testval=np.array([0.1, 1.0, 0.8], dtype=np.float32))
    H = tau
    C = np.linalg.inv(H)
    return model.test_point, model, (mu, C)


def simple_2model_continuous():
    """cf. ``models.py:86``."""
    mu = -2.1
    tau = 1.3
    with pm.Model() as model:
        x = pm.Normal("x", mu, tau=tau, testval=0.1)
        pm.Deterministic("logx", x.log() if hasattr(x, "log") else x)
        pm.Beta("y", alpha=1, beta=1, shape=2)
    return model.test_point, model


def beta_bernoulli():
    """cf. ``models.py:169``."""
    with pm.Model() as model:
        p = pm.Beta("p", 1.0, 1.0)
        pm.Bernoulli("y", p=p, observed=np.array([0, 1, 1, 1, 0, 1],
                                                 dtype=np.int32))
    return model.test_point, model


def non_normal(n=2):
    with pm.Model() as model:
        pm.Beta("x", 3, 3, shape=n)
    return model.test_point, model


def eight_schools():
    y = np.array([28., 8., -3., 7., -1., 1., 18., 12.], dtype=np.float32)
    s = np.array([15., 10., 16., 11., 9., 11., 10., 18.], dtype=np.float32)
    with pm.Model() as model:
        mu = pm.Normal("mu", 0.0, 5.0)
        tau = pm.HalfCauchy("tau", 5.0)
        theta_t = pm.Normal("theta_t", 0.0, 1.0, shape=8)
        pm.Deterministic("theta", mu + tau * theta_t)
        pm.Normal("obs", mu=mu + tau * theta_t, sigma=s, observed=y)
    return model.test_point, model
