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
    """Logical mesh shape.  -1 for ``data`` means "all remaining devices".

    DCN (multi-slice) is expressed WITHOUT a new axis name: ``dcn_data``
    data-parallel granules multiply the 'data' axis, with granules laid out
    outermost within that axis (``mesh_utils.create_hybrid_device_mesh``
    convention).  XLA then reduces gradients hierarchically — within a slice
    over ICI, across slices over DCN — while every ``PartitionSpec('data')``
    in the codebase keeps working unchanged.  'model'/'expert' stay inside a
    slice so all-to-all/ppermute collectives ride ICI only (SURVEY §2.3).
    """

    data: int = -1
    model: int = 1
    expert: int = 1
    # data-parallel granules across DCN.  None = auto-detect: one granule per
    # TPU slice (``device.slice_index``) or per host process when slices are
    # not exposed, active only when >1 granule is visible.  1 forces a flat
    # single-slice ICI mesh; explicit N>1 forces N granules.
    dcn_data: Optional[int] = None
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


def _device_granules(devices: Sequence[jax.Device]) -> list:
    """Group devices by DCN granule: TPU slice when exposed, else process."""
    keys = []
    for d in devices:
        k = getattr(d, "slice_index", None)
        if k is None:
            k = getattr(d, "process_index", 0)
        keys.append(k)
    return [
        [d for d, k in zip(devices, keys) if k == g] for g in sorted(set(keys))
    ]


def build_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())

    granules = _device_granules(devices)
    n_g = (
        config.dcn_data
        if config.dcn_data is not None
        else (len(granules) if len(granules) > 1 else 1)
    )
    if n_g > 1:
        if len(devices) % n_g:
            raise ValueError(f"{len(devices)} devices not divisible by dcn_data={n_g}")
        per_slice = len(devices) // n_g
        slice_data = config.data
        if slice_data != -1:
            if slice_data % n_g:
                raise ValueError(f"data={slice_data} not divisible by dcn_data={n_g}")
            slice_data //= n_g
        ici_shape = dataclasses.replace(
            config, data=slice_data, dcn_data=1
        ).resolved_shape(per_slice)
        try:
            device_array = mesh_utils.create_hybrid_device_mesh(
                ici_shape, (n_g, 1, 1), devices=devices
            )
        except Exception:
            # CPU simulation / granules without slice_index: granule-major
            # stack along the data axis (the hybrid-mesh layout contract)
            gs = (
                granules
                if len(granules) == n_g
                else [devices[i * per_slice : (i + 1) * per_slice] for i in range(n_g)]
            )
            device_array = np.concatenate(
                [np.asarray(g).reshape(ici_shape) for g in gs], axis=0
            )
        return Mesh(device_array, config.axis_names)

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
