"""Global configuration for the TPU-native build.

Replaces the reference's Theano global config handling
(``pymc3/theanof.py:445-470`` ``set_theano_conf`` and the ``floatX``/``intX``
casting discipline at ``pymc3/theanof.py:75-101``) with a typed config object
over ``jax.config``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np

__all__ = ["floatX", "intX", "get_config", "set_config", "Config"]


@dataclasses.dataclass
class Config:
    """Typed global configuration.

    Attributes
    ----------
    floatX : str
        Default float dtype for all continuous computation. ``float32`` is the
        TPU-native dtype (VPU/MXU); set ``float64`` (requires
        ``jax.config.update('jax_enable_x64', True)``) for high-precision CPU
        verification runs.
    intX : str
        Default integer dtype.
    compute_test_value : str
        'raise' eagerly evaluates test values at model-build time (the JAX
        analog of Theano's ``compute_test_value='raise'``, ``model.py:818``)
        so shape/dtype errors surface at declaration, not at trace time.
    """

    floatX: str = os.environ.get("PYMC3_TPU_FLOATX", "float32")
    intX: str = "int32"
    compute_test_value: str = "raise"
    # TPU MXU matmuls default to bfloat16 inputs; for MCMC/GP linear algebra
    # that is catastrophic (indefinite covariances, divergent trajectories).
    # 'highest' = full-f32 accumulation via multi-pass MXU. Hot matmuls in a
    # PPL are small, so the cost is negligible; override for large-matmul VI.
    matmul_precision: str = os.environ.get(
        "PYMC3_TPU_MATMUL_PRECISION", "highest")


_config = Config()


def _apply_floatX():
    """Wire the configured float width into jax (the env-var path of the
    reference's FLOATX CI sweep, ``scripts/test.sh:9``): float64 requires
    the x64 flag or every array silently truncates to float32."""
    import jax

    if _config.floatX == "float64":
        jax.config.update("jax_enable_x64", True)
        _config.intX = "int64"
    elif _config.floatX == "float32":
        _config.intX = "int32"


def _apply_matmul_precision():
    import jax

    jax.config.update("jax_default_matmul_precision",
                      _config.matmul_precision)


def get_config() -> Config:
    return _config


def set_config(**kwargs: Any) -> Config:
    """Update global config fields; returns the config object."""
    import jax

    for k, v in kwargs.items():
        if not hasattr(_config, k):
            raise KeyError(f"unknown config field {k!r}")
        setattr(_config, k, v)
    _apply_floatX()
    _apply_matmul_precision()
    return _config


def enable_compilation_cache(tag: str = "") -> str:
    """Point JAX's persistent compilation cache at a machine-specific dir.

    XLA:CPU AOT executables are machine-feature-specific; a cache shared
    across heterogeneous hosts loads binaries compiled for other CPUs
    (silently wrong numerics / SIGILL risk). Key the directory by backend +
    a hash of the host CPU flags.
    """
    import hashlib
    import jax

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    sig = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
            else:
                sig = "nocpuinfo"
    except OSError:
        sig = "nocpuinfo"
    # also key by jaxlib version: XLA target features (e.g.
    # prefer-no-scatter) vary across builds on identical hosts, and a
    # version-skewed AOT artifact loads with wrong codegen assumptions
    import jaxlib
    sig += "_" + getattr(jaxlib, "__version__", "unk").replace(".", "")
    # a tunneling PJRT plugin (axon) can register a SPOOFED "cpu"
    # platform that compiles remotely: same backend name, same local
    # /proc/cpuinfo, but AOT artifacts built for the REMOTE host's CPU.
    # Key by the plugin's presence so the true-local and tunneled "cpu"
    # caches never share a directory (observed round 5: feature-mismatch
    # loads from a dir poisoned through the spoofed path).
    import os as _os
    if ".axon_site" in _os.environ.get("PYTHONPATH", ""):
        sig += "_tun"
    backend = jax.default_backend()
    path = f"/tmp/pymc3_tpu_jax_cache_{backend}_{sig}"
    if tag:
        path += f"_{tag}"
    jax.config.update("jax_compilation_cache_dir", path)
    return path


def floatX(x=None):
    """Cast ``x`` to the configured float dtype, or return the dtype name.

    Mirrors ``pymc3/theanof.py:75`` ``floatX``.
    """
    if x is None:
        return _config.floatX
    if isinstance(x, (list, tuple)):
        return np.asarray(x, dtype=_config.floatX)
    if hasattr(x, "astype"):
        return x.astype(_config.floatX)
    return np.asarray(x, dtype=_config.floatX)


def intX(x=None):
    """Cast ``x`` to the configured int dtype, or return the dtype name.

    Mirrors ``pymc3/theanof.py:92`` ``intX``.
    """
    if x is None:
        return _config.intX
    if hasattr(x, "astype"):
        return x.astype(_config.intX)
    return np.asarray(x, dtype=_config.intX)
