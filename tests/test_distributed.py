"""Simulated multi-host test: 2 REAL processes × 2 virtual CPU devices.

Round-1 VERDICT item #10: a ``jax.distributed``-style init path exercised
by a simulated 2-process run — distributed init, hybrid DCN mesh, global
batch assembly, a cross-host reduction, grid-cell partitioning, and a
multi-host orbax checkpoint.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    nproc = 2
    procs = []
    for pid in range(nproc):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                            "PALLAS_AXON_POOL_IPS",
                            "AXON_POOL_SVC_OVERRIDE",
                            "AXON_LOOPBACK_RELAY")}
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": str(nproc),
            "JAX_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "_distributed_worker.py"),
             str(tmp_path)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "OK" in out
    # exactly the rank-0 worker wrote the primary marker
    assert os.path.exists(os.path.join(str(tmp_path), "primary_ok"))
