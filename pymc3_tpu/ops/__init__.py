"""TPU-native custom ops (Pallas kernels + XLA fallbacks).

The reference delegates all native-speed execution to Theano's C backend
(SURVEY §2.8); this package is the rebuild's equivalent: hand-written TPU
kernels for the ops where XLA's automatic fusion leaves bandwidth on the
table, each with a pure-XLA fallback so the same program runs on CPU test
meshes. Kernels are selected at call time by backend + problem size and are
individually benchmarked against their XLA fallback (see
``ops/pallas/bench_kernels.py``).
"""
from .pallas.gp_cov import (
    stationary_cov, pallas_stationary_available, STATIONARY_KINDS,
)

__all__ = [
    "stationary_cov", "pallas_stationary_available", "STATIONARY_KINDS",
]
