"""Multi-host (DCN) bring-up path (SURVEY §5 "Distributed communication
backend"): a real 2-process ``jax.distributed`` simulation — NOT a mock —
driving ``parallel.initialize_distributed`` + a global-mesh
``shard_block_fn`` NUTS block (cf. the reference's in-process driving of
the real fork/Pipe protocol, ``pymc3/tests/test_parallel_sampling.py``)."""
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "multihost_sim.py")


@pytest.mark.slow
def test_two_process_distributed_sim():
    env = dict(os.environ)
    # the child script sanitizes its own workers; run the parent plain
    proc = subprocess.run([sys.executable, SCRIPT], env=env,
                          capture_output=True, timeout=600)
    out = proc.stdout.decode(errors="replace")
    assert proc.returncode == 0, out + proc.stderr.decode(errors="replace")
    assert "MULTIHOST SIM OK" in out
    assert out.count("sharded NUTS block ok") == 2
