"""Worker for the 2-process distributed test (run via subprocess).

Forms a jax.distributed process group on localhost (CPU backend, 2 virtual
devices per process -> 4 global), then exercises the framework's multi-host
primitives: per-host batch assembly (``device_put_batch``), a psum-carrying
jitted step over the global mesh, and the cooperative stop allgather.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(f"localhost:{port}", num_procs, proc_id)

import numpy as np
import jax.numpy as jnp

from recommendations_tpu.core.mesh import MeshConfig, build_mesh, local_batch_slice
from recommendations_tpu.data.loader import device_put_batch
from recommendations_tpu.train.strategy import _any_host

assert jax.process_count() == num_procs
assert len(jax.devices()) == num_procs * 2

mesh = build_mesh(MeshConfig(data=-1))
# multi-process → DCN-aware hybrid mesh: the data axis spans both granules
# with each process's devices contiguous (granule-major layout)
assert dict(mesh.shape) == {"data": 4, "model": 1, "expert": 1}, mesh.shape
_mesh_procs = [d.process_index for d in mesh.devices.reshape(-1)]
assert _mesh_procs == sorted(_mesh_procs), f"not granule-major: {_mesh_procs}"

# per-host slice of a deterministic global batch
global_batch = np.arange(8, dtype=np.float64).reshape(8, 1)
start, size = local_batch_slice(mesh, 8)
local = global_batch[start : start + size]
batch = device_put_batch({"x": local}, mesh)

@jax.jit
def global_sum(b):
    return jnp.sum(b["x"])  # global reduction over the sharded array

total = float(global_sum(batch))
assert total == float(global_batch.sum()), f"{total} != {global_batch.sum()}"

# cooperative stop: only process 1 raises the flag -> everyone stops
flag = proc_id == 1
assert _any_host(flag) is True
assert _any_host(False) is False

print(f"proc {proc_id}: ok total={total}")
