"""Root pytest conftest: pin the test suite to a genuine 8-device CPU mesh.

This image ships an `axon` PJRT plugin (via a sitecustomize on PYTHONPATH)
that tunnels all compilation — including the spoofed "cpu" platform — to a
remote TPU terminal. Tests must be hermetic and fast, so before anything
imports jax we re-exec the interpreter with a sanitized environment:

 - PYTHONPATH stripped of the axon site dir (=> stock jaxlib CPU client)
 - JAX_PLATFORMS=cpu, 8 virtual host devices (the TPU-mesh stand-in used by
   the sharding tests, cf. SURVEY §4.4)

Benchmarks (bench.py) intentionally do NOT do this — they run on the real
TPU backend. Set PYMC3_TPU_NO_REEXEC=1 to opt out.
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def _needs_reexec():
    if os.environ.get("PYMC3_TPU_NO_REEXEC"):
        return False
    if "jax" in sys.modules:
        return False
    return ".axon_site" in os.environ.get("PYTHONPATH", "")


if _needs_reexec():
    env = dict(os.environ)
    env["PYTHONPATH"] = _HERE
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYMC3_TPU_NO_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# --- normal conftest body (post-reexec or non-axon host) -------------------
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Machine-specific persistent cache: XLA:CPU AOT artifacts are CPU-feature
# specific — a dir shared across heterogeneous hosts loads executables
# compiled for other machines (wrong numerics / SIGILL risk).
from pymc3_tpu.config import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
