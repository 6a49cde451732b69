"""Trace storage backends (cf. ``pymc3/backends/__init__.py``).

Selecting values from a backend:
  * ``trace[varname]``, ``trace.get_values(varname)``
  * ``trace.point(idx)``, slicing, ``get_sampler_stats``

The primary store is the in-memory :class:`~pymc3_tpu.backends.ndarray.NDArray`
(draws arrive as device arrays flushed once per ``sample()`` call rather than
per draw — chains advance in lockstep SPMD, SURVEY §2.4); Text / SQLite /
HDF5 provide streaming persistence parity.
"""
from .base import BaseTrace, MultiTrace, merge_traces
from .ndarray import (
    NDArray, save_trace, load_trace, point_list_to_multitrace,
)
from .text import Text
from .sqlite import SQLite
from .hdf5 import HDF5
from .tracetab import trace_to_dataframe
from .inferencedata import InferenceData, to_inference_data

__all__ = [
    "BaseTrace", "MultiTrace", "merge_traces", "NDArray", "Text", "SQLite",
    "HDF5", "save_trace", "load_trace", "point_list_to_multitrace",
    "trace_to_dataframe", "InferenceData", "to_inference_data",
]

_shortcuts = {
    "text": {"backend": Text, "name": "mcmc"},
    "sqlite": {"backend": SQLite, "name": "mcmc.sqlite"},
    "hdf5": {"backend": HDF5, "name": "mcmc.hdf5"},
}
