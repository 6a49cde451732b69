"""Trace → DataFrame conversion (cf. ``pymc3/backends/tracetab.py``)."""
from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

from ..util import get_var_name

__all__ = ["trace_to_dataframe"]


def trace_to_dataframe(trace, chains=None, varnames=None,
                       include_transformed=False):
    """Convert trace to pandas DataFrame (cf. ``tracetab.py:26``)."""
    var_shapes = trace._straces[trace.chains[0]].var_shapes

    if varnames is None:
        varnames = [v for v in trace.varnames
                    if include_transformed or not v.endswith("__")]

    flat_names = {v: create_flat_names(v, var_shapes[v]) for v in varnames}

    var_dfs = []
    for v in varnames:
        vals = trace.get_values(v, chains=chains, combine=True)
        flat_vals = vals.reshape(vals.shape[0], -1)
        var_dfs.append(pd.DataFrame(flat_vals, columns=flat_names[v]))
    return pd.concat(var_dfs, axis=1)


def create_flat_names(varname, shape):
    """Return flat variable names for `varname` of `shape`
    (cf. ``tracetab.py:52``)."""
    if np.prod(shape, dtype=int) == 1 and len(shape) == 0:
        return [varname]
    labels = (np.ravel(xs).tolist() for xs in np.indices(shape))
    labels = (map(str, xs) for xs in labels)
    return [f"{varname}__{'_'.join(idxs)}" for idxs in zip(*labels)]


def _create_shape(flat_names):
    """Determine shape from `create_flat_names` output."""
    try:
        _, shape_str = flat_names[-1].rsplit("__", 1)
    except ValueError:
        return ()
    return tuple(int(i) + 1 for i in shape_str.split("_"))
