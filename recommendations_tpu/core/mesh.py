"""Device-mesh substrate.

The reference distributes with Ray Train + torch DDP (data parallel only;
reference ``accelerate_training_strategy.py:80-95``).  Here distribution is a
first-class mesh: every axis of parallelism is a named mesh axis and all
communication is an XLA collective over that axis.

Axes:
  ``data``   — batch sharding (the reference's only axis).
  ``model``  — row-sharded embedding tables / tensor parallel.
  ``expert`` — expert parallelism for MoE rotators (reference computes MoE
               densely on every rank, ``commons/transformers/layers.py:130-136``).

Multi-host: call :func:`init_distributed` once per process, then build the
mesh over ``jax.devices()``; DCN-reachable axes should be outermost so XLA
keeps heavy collectives on ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape.  -1 for ``data`` means "all remaining devices"."""

    data: int = -1
    model: int = 1
    expert: int = 1
    # Axis names, outermost first.  DCN (multi-slice) would prepend a 'dcn'
    # axis here; single-slice meshes use ICI for all three.
    axis_names: Tuple[str, ...] = ("data", "model", "expert")

    def resolved_shape(self, n_devices: int) -> Tuple[int, ...]:
        fixed = self.model * self.expert
        data = self.data
        if data == -1:
            if n_devices % fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by model*expert={fixed}"
                )
            data = n_devices // fixed
        total = data * fixed
        if total != n_devices:
            raise ValueError(
                f"mesh shape {data}x{self.model}x{self.expert} != {n_devices} devices"
            )
        return (data, self.model, self.expert)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host process-group formation.

    TPU-native replacement for Ray Train's ``TorchConfig`` process group
    (reference ``accelerate_training_strategy.py:83-85``): on Cloud TPU the
    arguments are discovered from the metadata server, so bare
    ``jax.distributed.initialize()`` suffices.
    """
    if jax.process_count() > 1:
        return  # already initialised
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (ValueError, RuntimeError):
        # Single-process (tests, single-chip benches): nothing to form.
        pass


def build_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = config.resolved_shape(len(devices))
    try:
        device_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError, NotImplementedError):
        # CPU simulation / odd topologies: fall back to a plain reshape.
        device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, config.axis_names)


def local_batch_slice(mesh: Mesh, global_batch: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of the global batch.

    Replaces the reference's per-DDP-worker contiguous file split
    (``dataset_generator_utils.py:13-34``) at the batch level: each host
    produces its contiguous slice and ``make_array_from_process_local_data``
    assembles the sharded global array.
    """
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n_proc} hosts")
    per = global_batch // n_proc
    return jax.process_index() * per, per
