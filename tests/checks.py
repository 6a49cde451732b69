"""Assertion helpers (cf. ``pymc3/tests/checks.py``)."""
import numpy as np


def close_to(x, v, bound, name="value"):
    assert np.all(np.logical_or(np.abs(np.asarray(x) - np.asarray(v)) < bound,
                                np.asarray(x) == np.asarray(v))), (
        f"{name} out of bounds: {np.asarray(x)}, {np.asarray(v)}, {bound}")


def close_to_logical(x, v, bound, name="value"):
    assert np.all(np.logical_or(np.abs(np.bitwise_xor(np.asarray(x), np.asarray(v))) < bound,
                                np.asarray(x) == np.asarray(v))), (
        f"{name} out of bounds: {np.asarray(x)}, {np.asarray(v)}, {bound}")
