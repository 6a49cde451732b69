"""Utility-layer tests mirroring the reference's ``tests/test_util.py:1``
(transformed-name helpers, update_start_vals) and ``tests/test_random.py:1``
(draw_values semantics: literals, nodes at a point, prior fallback, joint
dependency structure)."""
import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu.util import (
    get_transformed_name, is_transformed_name, get_untransformed_name,
    get_default_varnames, update_start_vals,
)
from pymc3_tpu.distributions.distribution import draw_values
from pymc3_tpu.distributions import transforms as tr


class TestTransformedNames:
    def test_get_transformed_name(self):
        assert get_transformed_name("x", tr.log) == "x_log__"
        assert get_transformed_name("x", tr.stick_breaking) == \
            f"x_{tr.stick_breaking.name}__"

    def test_is_transformed_name(self):
        assert is_transformed_name("x_log__")
        assert is_transformed_name("x_interval__")
        assert not is_transformed_name("x")
        assert not is_transformed_name("x_log")

    def test_roundtrip(self):
        name = get_transformed_name("sigma", tr.log)
        assert get_untransformed_name(name) == "sigma"

    def test_get_untransformed_rejects_plain(self):
        with pytest.raises(ValueError):
            get_untransformed_name("x")

    def test_default_varnames_filter(self):
        class V:
            def __init__(self, name):
                self.name = name
        vs = [V("a"), V("b_log__"), V("c")]
        out = [v.name for v in get_default_varnames(vs, False)]
        assert out == ["a", "c"]
        out_all = [v.name for v in get_default_varnames(vs, True)]
        assert out_all == ["a", "b_log__", "c"]


class TestUpdateStartVals:
    """update_start_vals(a, b, model): soft-update a with b's entries,
    keeping a's values on conflict and syncing transformed views
    (cf. reference ``test_util.py:54-98``)."""

    def _model(self):
        with pm.Model() as m:
            pm.Uniform("lower", lower=0.0, upper=1.0)
            pm.Uniform("upper", lower=5.0, upper=10.0)
        return m

    def test_all_present_keeps_a(self):
        m = self._model()
        start = {"lower_interval__": 0.3, "upper_interval__": -0.2}
        test = dict(m.test_point)
        update_start_vals(start, test, model=m)
        assert start["lower_interval__"] == 0.3
        assert start["upper_interval__"] == -0.2

    def test_one_missing_fills_from_b(self):
        m = self._model()
        start = {"lower_interval__": 0.7}
        update_start_vals(start, dict(m.test_point), model=m)
        assert start["lower_interval__"] == 0.7
        assert "upper_interval__" in start

    def test_untransformed_entry_syncs_transformed(self):
        """A constrained-space start value must produce the matching
        transformed entry (reference test_soft_update_transformed)."""
        with pm.Model() as m:
            pm.Gamma("a", alpha=2.0, beta=1.0)
        start = {"a": 2.0}
        update_start_vals(start, dict(m.test_point), model=m)
        assert "a_log__" in start
        np.testing.assert_allclose(start["a_log__"], np.log(2.0), rtol=1e-5)

    def test_empty_a_takes_all_of_b(self):
        m = self._model()
        start = {}
        update_start_vals(start, dict(m.test_point), model=m)
        assert set(start) >= set(m.test_point)


class TestDrawValues:
    def test_literals_pass_through(self):
        out = draw_values([5, np.array([1.0, 2.0]), (3, 4)])
        np.testing.assert_array_equal(out[0], 5)
        np.testing.assert_array_equal(out[1], [1.0, 2.0])
        np.testing.assert_array_equal(out[2], [3, 4])

    def test_node_at_point(self):
        with pm.Model() as m:
            mu = pm.Normal("mu", 0.0, 1.0)
            x = pm.Normal("x", mu=2.0 * mu, sigma=1.0)
        (val,) = draw_values([x.distribution.mu], point={"mu": 3.0})
        np.testing.assert_allclose(val, 6.0, rtol=1e-5)

    def test_dist_draws_at_point(self):
        """Distribution params resolve through the point before drawing
        (reference test_dep_vars analog)."""
        d = pm.Normal.dist(mu=100.0, sigma=1e-6)
        np.random.seed(0)
        (val,) = draw_values([d])
        np.testing.assert_allclose(val, 100.0, atol=1e-3)

    def test_joint_dependency_in_prior(self):
        """Prior draws preserve the dependency structure: y|x is tightly
        coupled to x (reference test_joint_distribution)."""
        with pm.Model() as m:
            x = pm.Normal("x", 0.0, 10.0)
            y = pm.Normal("y", mu=x, sigma=0.01)
            prior = pm.sample_prior_predictive(samples=300, random_seed=1)
        np.testing.assert_allclose(prior["y"], prior["x"], atol=0.1)
        assert prior["x"].std() > 5.0  # x itself is wide
