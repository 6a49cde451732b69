"""Model-core behavior matrix, mirroring the reference's
``pymc3/tests/test_model.py:1`` surface (364 LoC: Model subclassing,
nested contexts passing vars to the parent, named sub-model prefixing,
Model.root, observed validation, multiple observed RVs, matrix ops in
models, value-grad machinery) beyond the essentials pinned in
``test_model_features.py``."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pymc3_tpu as pm
from pymc3_tpu.config import floatX


class SubModel(pm.Model):
    """Reference NewModel pattern (``test_model.py:28``): a Model subclass
    that declares variables in its own __init__."""

    def __init__(self, name="", model=None):
        super().__init__(name, model)
        self.v1 = pm.Normal("v1", mu=0.0, sigma=1.0)
        pm.Normal("v2", mu=0.0, sigma=1.0)


class TestSubclassing:
    def test_subclass_standalone(self):
        m = SubModel()
        assert "v1" in m.named_vars and "v2" in m.named_vars
        assert len(m.free_RVs) == 2

    def test_subclass_inside_context_joins_parent(self):
        with pm.Model() as outer:
            pm.Normal("x", 0.0, 1.0)
            sub = SubModel(name="sub")
        names = {rv.name for rv in outer.free_RVs}
        assert names == {"x", "sub_v1", "sub_v2"}
        assert sub.root is outer
        assert not sub.isroot and outer.isroot

    def test_docstring_composition(self):
        """Reference docstring example: instantiate a subclass under a
        fresh root and keep sampling-ready."""
        with pm.Model() as model:
            SubModel(name="a")
            SubModel(name="b")
        assert {rv.name for rv in model.free_RVs} == \
            {"a_v1", "a_v2", "b_v1", "b_v2"}
        lp = model.logp(model.test_point)
        assert np.isfinite(lp)


class TestNestedContexts:
    def test_vars_propagate_to_parent(self):
        with pm.Model() as outer:
            with pm.Model(name="inner"):
                pm.Normal("y", 0.0, 1.0)
            pm.Normal("z", 0.0, 1.0)
        assert {rv.name for rv in outer.free_RVs} == {"inner_y", "z"}
        assert outer["inner_y"] is not None

    def test_double_nesting_prefixes_compose(self):
        with pm.Model() as outer:
            with pm.Model(name="a") as a:
                with pm.Model(name="b") as b:
                    pm.Normal("w", 0.0, 1.0)
        assert b.root is outer and a.root is outer
        (rv,) = outer.free_RVs
        # reference semantics: only the declaring model's prefix applies
        # (name_for uses own prefix; treedict propagates names unchanged)
        assert rv.name == "b_w"

    def test_duplicate_across_nested_raises(self):
        with pm.Model():
            pm.Normal("x", 0.0, 1.0)
            with pytest.raises(ValueError):
                pm.Normal("x", 0.0, 1.0)

    def test_context_isolation_after_exit(self):
        with pm.Model() as m1:
            pm.Normal("x", 0.0, 1.0)
        with pm.Model() as m2:
            pm.Normal("x", 0.0, 1.0)  # same name in a fresh root is fine
        assert len(m1.free_RVs) == 1 and len(m2.free_RVs) == 1
        assert m1.free_RVs[0] is not m2.free_RVs[0]


class TestObservedValidation:
    def test_multiple_observed_rvs(self):
        y1 = np.random.default_rng(0).normal(size=10)
        y2 = np.random.default_rng(1).normal(size=7)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0.0, 5.0)
            pm.Normal("o1", mu=mu, sigma=1.0, observed=y1)
            pm.Normal("o2", mu=mu, sigma=1.0, observed=y2)
        assert len(m.observed_RVs) == 2
        want = (np.sum(-0.5 * np.log(2 * np.pi) - 0.5 * y1 ** 2)
                + np.sum(-0.5 * np.log(2 * np.pi) - 0.5 * y2 ** 2)
                - 0.5 * np.log(2 * np.pi) - np.log(5.0))  # mu prior at 0
        got = m.logp({"mu": np.array(0.0, dtype=floatX())})
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_empty_observed_is_free(self):
        """Observed with all-missing data leaves imputation variables
        (reference test_empty_observed semantics: fully-missing observed
        behaves like a free RV)."""
        data = np.full(4, np.nan)
        with pm.Model() as m:
            with pytest.warns(UserWarning):
                pm.Normal("x", 0.0, 1.0, observed=data)
        assert len(m.missing_values) >= 1
        assert np.isfinite(m.logp(m.test_point))

    def test_observed_array_coercion(self):
        import pandas as pd
        y = pd.Series([0.1, -0.2, 0.5])
        with pm.Model() as m:
            mu = pm.Normal("mu", 0.0, 1.0)
            obs = pm.Normal("o", mu=mu, sigma=1.0, observed=y)
        assert np.isfinite(m.logp(m.test_point))


class TestModelMath:
    def test_matrix_multiplication_in_model(self):
        """Reference test_matrix_multiplication: linear predictor via
        pm.math.dot survives graph build + logp + grad."""
        X = np.random.default_rng(2).normal(size=(12, 3)).astype(floatX())
        beta_true = np.array([1.0, -2.0, 0.5])
        y = X @ beta_true
        with pm.Model() as m:
            beta = pm.Normal("beta", 0.0, 5.0, shape=3)
            mu = pm.math.dot(pm.math.constant(X), beta)
            pm.Normal("y", mu=mu, sigma=0.1, observed=y)
        fn = m.make_logp_fn()
        g = jax.grad(fn)(jnp.zeros(m.ndim, dtype=floatX()))
        assert np.all(np.isfinite(np.asarray(g)))
        res = pm.find_MAP(model=m, progressbar=False)
        np.testing.assert_allclose(res["beta"], beta_true, atol=0.05)

    def test_logp_dtype_follows_floatX(self):
        with pm.Model() as m:
            pm.Normal("x", 0.0, 1.0)
        fn = m.make_logp_fn()
        out = fn(jnp.zeros(1, dtype=floatX()))
        assert str(np.asarray(out).dtype) == floatX()


class TestValueGrad:
    def test_value_and_grad_consistent(self):
        with pm.Model() as m:
            pm.Normal("a", 0.0, 2.0)
            pm.HalfNormal("s", 1.0)
        q = np.array([0.3, -0.4], dtype=floatX())
        fn = m.make_logp_fn()
        v, g = jax.value_and_grad(fn)(jnp.asarray(q))
        eps = 1e-3
        for i in range(2):
            qp, qm = q.copy(), q.copy()
            qp[i] += eps
            qm[i] -= eps
            fd = (np.asarray(fn(jnp.asarray(qp)))
                  - np.asarray(fn(jnp.asarray(qm)))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g)[i], fd, rtol=5e-2,
                                       atol=5e-3)

    def test_dict_to_array_roundtrip(self):
        with pm.Model() as m:
            pm.Normal("a", 0.0, 1.0, shape=(2, 2))
            pm.HalfNormal("s", 1.0)
        pt = m.test_point
        q = m.dict_to_array(pt)
        assert q.shape == (m.ndim,)
        back = m.bijection_rmap(q) if hasattr(m, "bijection_rmap") else None
        lp1 = m.logp(pt)
        lp2 = float(np.asarray(m.make_logp_fn()(jnp.asarray(q))))
        np.testing.assert_allclose(lp1, lp2, rtol=1e-5, atol=1e-5)
