"""Multi-process collectives: gather_objects/broadcast_object at REAL 2 processes.

The one-hot sum-merge allgather (utils/multihost.py:17-45) replaces the
reference's dist.all_gather_object (inference_unigen_cot.py:417-427); this test
runs it across two actual jax.distributed CPU processes via a subprocess
harness, so the >1-process path is exercised, not just the identity fallback.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%d",
                           num_processes=2, process_id=pid)
sys.path.insert(0, %r)
from unigen_tpu.utils import multihost

assert jax.process_count() == 2
out = multihost.gather_objects({"rank": pid, "rows": [pid * 10, pid * 10 + 1]})
assert out == [{"rank": 0, "rows": [0, 1]}, {"rank": 1, "rows": [10, 11]}], out
# ragged payloads: different sizes per process
out2 = multihost.gather_objects(["x"] * (3 if pid else 1))
assert out2 == [["x"], ["x", "x", "x"]], out2
b = multihost.broadcast_object({"cfg": [1, 2, 3]} if pid == 0 else None)
assert b == {"cfg": [1, 2, 3]}, b
multihost.sync_hosts()
print(f"OK {pid}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_gather_objects_two_processes(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % (port, REPO))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err}"
        assert f"OK {i}" in out
