"""Test fixtures. Environment setup (true-CPU re-exec, virtual 8-device
mesh, compilation cache) lives in the repo-root conftest.py."""
import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running multi-process simulations")


@pytest.fixture(scope="function")
def seeded():
    np.random.seed(20090425)
    yield


class SeededTest:
    """Per-method seeding (cf. ``pymc3/tests/helpers.py:23-36``)."""

    random_seed = 20160911

    @classmethod
    def setup_class(cls):
        np.random.seed(cls.random_seed)

    def setup_method(self):
        np.random.seed(self.random_seed)
