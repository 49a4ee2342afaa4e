"""Device mesh construction for MicroDiT training.

The reference trains data-parallel over 8xH100 with NCCL (SURVEY.md #2.4); the TPU-native
equivalent is a jax.sharding.Mesh over ICI with all communication expressed declaratively
through NamedShardings - XLA inserts the all-reduce / reduce-scatter / all-gather
collectives (no hand-written comm layer).

Mesh axes:
    data   - pure data parallelism (gradient psum over ICI)
    fsdp   - ZeRO-style shard axis: batch is also split over it, optimizer state (and
             optionally parameters) are sharded along it (reference FSDP SHARD_GRAD_OP
             parity, configs/res_256_pretrain.yaml:117-118)
    tensor - expert/tensor axis: the 8 EC-MoE expert tensors shard along it (expert
             parallelism; the reference computes MoE densely on every rank)

A single-axis data mesh reproduces the reference exactly; the extra axes are free
generality for larger slices.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
BATCH_AXES = (DATA_AXIS, FSDP_AXIS)


def make_mesh(
    data: Optional[int] = None,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp, tensor) mesh. ``data=None`` consumes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, (
        f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    )
    arr = np.array(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def make_multislice_mesh(
    dcn_data: int,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-slice mesh: pure data parallelism over DCN (slice boundary), fsdp/tensor
    inside each slice over ICI - gradient all-reduce is the only DCN traffic, which is
    the standard multi-slice recipe. Uses mesh_utils hybrid layout so the axis order
    maps slices to the DCN dimension."""
    from jax.experimental import mesh_utils

    devices = list(devices if devices is not None else jax.devices())
    per_slice = len(devices) // dcn_data
    data_inner = per_slice // (fsdp * tensor)
    try:
        arr = mesh_utils.create_hybrid_device_mesh(
            (data_inner, fsdp, tensor),
            dcn_mesh_shape=(dcn_data, 1, 1),
            devices=devices,
        )
    except ValueError:
        # devices without slice topology (e.g. fake CPU devices in tests): contiguous
        # groups stand in for slices
        arr = np.array(devices).reshape(dcn_data, data_inner, fsdp, tensor)
    arr = arr.reshape(dcn_data * data_inner, fsdp, tensor)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over data x fsdp."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
