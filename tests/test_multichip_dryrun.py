"""Pin the driver's multichip gate: ``dryrun_multichip`` must self-provision.

The driver runs ``__graft_entry__.dryrun_multichip(N)`` in a fresh process on
a host whose sitecustomize pins JAX to a single axon TPU device. The function
must force an N-device virtual CPU mesh itself (round-1 regression: it
asserted ``len(jax.devices()) >= n`` instead of provisioning and the gate
went red -- see VERDICT.md round 1, weak #1).

Run in a clean subprocess so this test sees the same cold-start conditions as
the driver (the pytest process itself already pinned JAX to CPU via
conftest.py, which would mask the bug).
"""

import os
import subprocess
import sys
import pytest

# Multi-minute e2e tier: deselect with -m 'not slow' for fast CI.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions():
    env = dict(os.environ)
    # Simulate the driver: no CPU forcing, no forced device count.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip OK" in proc.stdout
