"""Multi-host data-parallel path on a REAL 2-process CPU cluster.

Each subprocess owns 4 virtual CPU devices; jax.distributed wires them into
one 8-device job. Verifies parallel.mesh.distributed_init,
global_batch_array (per-process local rows -> one globally batch-sharded
array) and a cross-process collective (global sum). This is the TPU-pod
DCN analog the reference never had (SURVEY.md §2.3).
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from artgraph_tpu.parallel.mesh import (create_mesh, distributed_init,
                                        global_batch_array)

proc_id = int(sys.argv[1])
coord = sys.argv[2]
distributed_init(coord, num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = create_mesh(data=8)
local = np.full((4, 2), float(proc_id), np.float32)  # 4 local batch rows
g = global_batch_array(local, mesh)
assert g.shape == (8, 2), g.shape

import jax.numpy as jnp
total = jax.jit(jnp.sum)(g)   # cross-process collective reduction
assert float(total) == 8.0, float(total)  # process 1 contributed 4x2 ones
print(f"proc {proc_id} OK total={float(total)}")
"""


def test_two_process_data_parallel():
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO

    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), addr], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK total=8.0" in out
