"""True multi-process exercise of parallel/multihost.py: two CPU
processes under jax.distributed drive allgather_numpy / broadcast_pyobj /
sync (round 1 only smoke-tested these with process_count() == 1)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PYTHONPATH", None)
import numpy as np
pid, port = int(sys.argv[1]), sys.argv[2]
sys.path.insert(0, sys.argv[3])
from aimnet_x2d_tpu.parallel import multihost
multihost.initialize(f"localhost:{port}", 2, pid)
import jax
assert multihost.process_count() == 2
assert multihost.process_index() == pid
assert multihost.is_primary() == (pid == 0)

g = multihost.allgather_numpy(np.arange(3, dtype=np.int64) + 10 * pid)
np.testing.assert_array_equal(g, np.concatenate([np.arange(3), np.arange(3) + 10]))

obj = multihost.broadcast_pyobj({"stop": False, "best": 1.5} if pid == 0 else None)
assert obj == {"stop": False, "best": 1.5}

multihost.sync()
print(f"proc {pid} ok", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_collectives(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    # plain 1-device-per-process CPU backend (no virtual-device flag)
    env["XLA_FLAGS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(port), REPO],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=150)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()  # exact child PIDs we spawned
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out
