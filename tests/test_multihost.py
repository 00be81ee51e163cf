"""Multi-host (DCN) distributed init — SURVEY.md §5.8's cross-host half.

Spawns TWO real OS processes, each with 2 virtual CPU devices, joined via
jax.distributed.initialize (parallel.mesh.init_distributed) into one
4-device "agents" mesh whose ring crosses the process boundary (the Gloo
CPU collective backend stands in for DCN). The worker checks ring gravity,
boids, and vision parity against the dense oracle; see
tests/multihost_worker.py."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
@pytest.mark.slow
def test_two_process_cpu_mesh_ring_parity():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "multihost parity OK" in out, out[-2000:]
