"""Multi-host (multi-process jax.distributed) smoke test.

Round-1 VERDICT §5.8: no jax.distributed / multi-process path existed.
This spawns two OS processes, each a "host" with two virtual CPU
devices, joined through a jax.distributed coordinator with gloo
collectives; a dp-sharded batched AND gate runs SPMD over the 4 global
devices and every host verifies its local decrypts
(tools/multihost_demo.py is the worker).
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


@pytest.mark.slow
def test_two_process_dp_sharded_gate(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tools", "multihost_demo.py")
    port = _free_port()
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    # the workers own their XLA_FLAGS / platform; scrub this process's
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            cwd=tmp_path, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i}:\n{out}"
            assert f"MH_OK pid={i} devices=4" in out, out
            assert "errors=0" in out
    finally:
        for p in procs:
            p.kill()
