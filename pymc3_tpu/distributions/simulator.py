"""ABC simulator distribution, mirroring
``pymc3/distributions/simulator.py`` (63 LoC)."""
from __future__ import annotations

import numpy as np

from ..config import floatX
from .distribution import NoDistribution, draw_values
from .shape_utils import to_tuple

__all__ = ["Simulator"]


class Simulator(NoDistribution):
    r"""Forward-simulator pseudo-distribution for SMC-ABC
    (cf. ``simulator.py:21``). ``function(*params)`` returns synthetic data;
    consumed by ``sample_smc(kernel='abc')``."""

    def __init__(self, function, *args, **kwargs):
        self.function = function
        params = list(args)
        self.params = params
        observed = self.data if hasattr(self, "data") else None
        shape = to_tuple(kwargs.pop("shape", ()))
        dtype = kwargs.pop("dtype", floatX())
        super().__init__(shape=shape, dtype=dtype,
                         testval=kwargs.pop("testval", 0.0), **kwargs)

    def random(self, point=None, size=None):
        params = draw_values(self.params, point=point, size=size)
        if size is None:
            return np.asarray(self.function(*params))
        return np.asarray([self.function(*params) for _ in range(int(size))])

    def __str__(self):
        return f"Simulator({getattr(self.function, '__name__', 'fn')})"
