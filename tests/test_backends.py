"""Backend tests (cf. ``pymc3/tests/backend_fixtures.py`` + per-backend
test files): setup/record/selection/dump-load equality across
NDArray/Text/SQLite/HDF5."""
import os

import numpy as np
import pytest

import pymc3_tpu as pm
from pymc3_tpu.backends import NDArray, Text, SQLite, HDF5
from pymc3_tpu.backends import text as text_mod, sqlite as sqlite_mod, \
    hdf5 as hdf5_mod
from pymc3_tpu.backends.base import MultiTrace

from . import models


@pytest.fixture(scope="module")
def sampled():
    _, model, _ = models.simple_model()
    with model:
        trace = pm.sample(draws=100, tune=100, chains=2, progressbar=False,
                          random_seed=0, compute_convergence_checks=False)
    return model, trace


class TestNDArray:
    def test_record_and_select(self, sampled):
        model, trace = sampled
        assert len(trace) == 100
        vals = trace.get_values("x")
        assert vals.shape == (200, 2)
        vals_c = trace.get_values("x", combine=False)
        assert len(vals_c) == 2
        pt = trace.point(5)
        assert "x" in pt
        sliced = trace[25:75]
        assert len(sliced) == 50
        thinned = trace.get_values("x", burn=10, thin=2)
        assert thinned.shape == (45 * 2, 2)

    def test_stats_roundtrip(self, sampled):
        model, trace = sampled
        stats = trace.get_sampler_stats("depth")
        assert stats.shape == (200,)

    def test_save_load(self, sampled, tmp_path):
        model, trace = sampled
        d = pm.save_trace(trace, str(tmp_path / "tr"), overwrite=True)
        with model:
            t2 = pm.load_trace(d)
        np.testing.assert_allclose(trace.get_values("x"),
                                   t2.get_values("x"))
        # warmup state checkpoint present (TPU extension)
        assert getattr(t2._straces[0], "warmup_state", None) is not None

    def test_merge_traces(self, sampled):
        model, trace = sampled
        with model:
            t2 = pm.sample(draws=100, tune=50, chains=2, progressbar=False,
                           random_seed=9, compute_convergence_checks=False)
        merged = pm.merge_traces([trace, t2])
        assert merged.nchains == 4


class TestTextBackend:
    def test_roundtrip(self, sampled, tmp_path):
        model, trace = sampled
        name = str(tmp_path / "textdb")
        text_mod.dump(name, trace)
        with model:
            loaded = text_mod.load(name)
        np.testing.assert_allclose(
            np.sort(trace.get_values("x"), axis=0),
            np.sort(loaded.get_values("x"), axis=0), rtol=1e-4)

    def test_record_stream(self, sampled, tmp_path):
        model, trace = sampled
        name = str(tmp_path / "textdb2")
        with model:
            strace = Text(name, model=model)
            strace.setup(10, 0)
            for i in range(10):
                strace.record(model.test_point)
            strace.close()
            assert len(strace) == 10


class TestSQLiteBackend:
    def test_roundtrip(self, sampled, tmp_path):
        model, trace = sampled
        name = str(tmp_path / "trace.sqlite")
        with model:
            strace = SQLite(name, model=model)
            strace.setup(20, 0)
            for i in range(20):
                strace.record(model.test_point)
            strace.close()
            loaded = sqlite_mod.load(name)
        assert len(loaded) == 20
        vals = loaded.get_values("x")
        assert vals.shape[0] == 20


class TestHDF5Backend:
    def test_roundtrip(self, sampled, tmp_path):
        model, trace = sampled
        name = str(tmp_path / "trace.h5")
        with model:
            strace = HDF5(name, model=model)
            strace.setup(15, 0, [{"stat1": np.float64}])
            for i in range(15):
                strace.record(model.test_point, [{"stat1": float(i)}])
            strace.close()
            loaded = hdf5_mod.load(name)
        assert len(loaded) == 15
        stats = loaded.get_sampler_stats("stat1")
        np.testing.assert_allclose(stats, np.arange(15.0))


class TestTraceToDataframe:
    def test_df(self, sampled):
        model, trace = sampled
        df = pm.trace_to_dataframe(trace)
        # merge_traces (run earlier on the shared fixture) mutates in place,
        # so compute the expectation from the trace itself
        assert df.shape[0] == len(trace) * trace.nchains
        assert any(c.startswith("x") for c in df.columns)


class TestAddRemoveValues:
    """Post-hoc derived series on MultiTrace (reference API parity:
    ``pymc3/backends/base.py:394-458``)."""

    def test_roundtrip(self, sampled):
        _, trace = sampled
        n = len(trace) * trace.nchains
        series = np.arange(n, dtype=float)
        trace.add_values({"derived": series})
        assert "derived" in trace.varnames
        np.testing.assert_allclose(
            trace.get_values("derived", combine=True), series)
        per_chain = trace.get_values("derived", combine=False)
        assert len(per_chain) == trace.nchains
        assert per_chain[1][0] == len(trace)
        trace.remove_values("derived")

    def test_overwrite_guard(self, sampled):
        _, trace = sampled
        n = len(trace) * trace.nchains
        trace.add_values({"v2": np.zeros(n)})
        with pytest.raises(ValueError):
            trace.add_values({"v2": np.ones(n)})
        trace.add_values({"v2": np.ones(n)}, overwrite=True)
        assert trace.get_values("v2", combine=True).min() == 1.0
        trace.remove_values("v2")

    def test_remove(self, sampled):
        _, trace = sampled
        n = len(trace) * trace.nchains
        trace.add_values({"tmp": np.zeros(n)})
        trace.remove_values("tmp")
        assert "tmp" not in trace.varnames
        with pytest.raises(KeyError):
            trace.remove_values("tmp")

    def test_length_mismatch_warns(self, sampled):
        _, trace = sampled
        with pytest.warns(UserWarning, match="rows"):
            with pytest.raises(ValueError):
                trace.add_values({"bad": np.zeros(7)})
