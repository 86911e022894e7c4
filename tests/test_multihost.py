"""Multi-process (multi-"host") tests: spawn REAL separate processes that
join a Gloo-backed jax.distributed cluster on the CPU backend and run
cross-process collectives through sgfhe_tpu.parallel.distributed — the
machinery a TPU pod uses, with only the transport differing (SURVEY.md §2.4
communication-backend row; BASELINE.md multi-host target)."""

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


def test_two_process_mesh_and_reduction():
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    port = _free_port()
    # scrub every backend-selecting variable: the workers must come up on
    # plain multi-process CPU even when the parent session is wired to a TPU
    # plugin (which would initialize the backend at import time, before
    # jax.distributed.initialize can run)
    env = {
        k: v
        for k, v in os.environ.items()
        if not (
            k.startswith(("JAX_", "XLA_", "AXON_", "PALLAS_", "LIBTPU", "TPU_"))
            or k == "PYTHONPATH"
        )
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for pr in procs:
            out, _ = pr.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for i, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"worker {i} failed:\n{out}"
        assert "modular reduction ok" in out, out
