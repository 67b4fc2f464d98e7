"""Multi-host (multi-process) smoke test: 2 CPU processes, 1 device each,
joined by jax.distributed.initialize with gloo TCP collectives — the DCN
stand-in.  The sharded LM step's psum-reduced assembly must cross the
process boundary and bit-match the single-device step (SURVEY.md section 5,
distributed-communication backend).
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(mode, timeout=540):
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=root, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    return outs


def test_two_process_assembly_parity():
    outs = _run_workers("step")
    assert "PARITY OK" in outs[0], outs[0]


@pytest.mark.slow
def test_two_process_full_staged_schedule():
    """run_staged end-to-end across 2 gloo processes: stage pipeline,
    jitted inits, and result materialization over non-addressable arrays
    must reproduce the single-process staged solution."""
    outs = _run_workers("staged", timeout=1500)
    assert "STAGED PARITY OK" in outs[0], outs[0]
