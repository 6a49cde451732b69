"""Root pytest conftest: pin the test suite to a genuine 8-device CPU mesh.

This image ships an `axon` PJRT plugin (via a sitecustomize on PYTHONPATH)
that tunnels all compilation — including the spoofed "cpu" platform — to a
remote TPU terminal, and it imports jax eagerly at interpreter startup.
Tests must be hermetic and fast, so we re-exec the interpreter with a
sanitized environment:

 - PYTHONPATH stripped of the axon site dir (=> stock jaxlib CPU client)
 - JAX_PLATFORMS=cpu, 8 virtual host devices (the TPU-mesh stand-in used by
   the sharding tests, cf. SURVEY §4.4)

The re-exec happens in ``pytest_configure`` (not at conftest import) so we
can release pytest's global fd capture first — otherwise the re-exec'd
pytest inherits fd 1/2 pointing at the dead parent's capture temp file and
all output vanishes.

Benchmarks (bench.py) intentionally do NOT do this — they run on the real
TPU backend. Set PYMC3_TPU_NO_REEXEC=1 to opt out.
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def _needs_reexec():
    if os.environ.get("PYMC3_TPU_NO_REEXEC"):
        return False
    # NOTE: do NOT gate on "jax" in sys.modules — the axon sitecustomize
    # imports jax eagerly at interpreter startup, so that is always true
    # under the axon env. os.execve replaces the whole process; the
    # re-exec'd one strips the sitecustomize via PYTHONPATH.
    return ".axon_site" in os.environ.get("PYTHONPATH", "")


_DO_REEXEC = _needs_reexec()


def pytest_configure(config):
    if not _DO_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["PYTHONPATH"] = _HERE
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["PYMC3_TPU_NO_REEXEC"] = "1"
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + args, env)


if not _DO_REEXEC:
    # --- normal conftest body (post-reexec or non-axon host) ----------------
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
