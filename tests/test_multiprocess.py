"""REAL multi-process distributed BA: 2 OS processes × 4 virtual CPU devices
form one ("host", "map") mesh via jax.distributed.initialize; the sharded
solve's hierarchical psum crosses the process boundary (the DCN code path of
a multi-host pod, over loopback) and must equal the single-device solve.

This replaces the single-process simulation of the "host" axis with actual
cross-process collectives (VERDICT r1 next-#4; SURVEY.md §2.14)."""

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


@pytest.mark.slow
def test_two_process_distributed_ba_equals_single_device():
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # each process builds its OWN 4-device CPU backend; the parent test
    # session's 8-device setting must not leak in
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multi-process worker {i} timed out")
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, (
            f"worker {i} failed (rc={rc})\nstdout:\n{out}\nstderr:\n{err[-3000:]}"
        )
    assert "MULTIPROC_OK" in outs[0][1], outs[0][1]
