"""Sharding rules: parameters, optimizer state, and data.

ZeRO-2 parity with the reference (FSDP SHARD_GRAD_OP: optimizer state + grads sharded,
params replicated for fwd/bwd - configs/res_256_pretrain.yaml:117-118): parameters stay
replicated (P()) while every optimizer-state leaf is sharded along its largest
fsdp-divisible axis. XLA then emits reduce-scatter for the grad->opt-state path and
all-gather for the update->params path over ICI.

Expert parallelism: 3-D EC-MoE expert tensors (e, d, f) shard their expert axis over the
'tensor' mesh axis when divisible (the reference computes MoE densely replicated,
SURVEY.md #2.4).
"""

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, TENSOR_AXIS


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_spec(path: str, leaf, mesh: Mesh, shard_experts: bool = True) -> P:
    """PartitionSpec for one parameter."""
    tensor_size = mesh.shape[TENSOR_AXIS]
    if (
        shard_experts
        and tensor_size > 1
        and getattr(leaf, "ndim", 0) == 3
        and ("/w1" in path or "/w2" in path)
        and leaf.shape[0] % tensor_size == 0
    ):
        # EC-MoE expert tensors (e, d, f): expert-parallel over the tensor axis.
        return P(TENSOR_AXIS, None, None)
    return P()


def param_shardings(params: Any, mesh: Mesh, shard_experts: bool = True) -> Any:
    """NamedSharding tree for parameters (replicated, experts optionally sharded)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_spec(_path_str(path), leaf, mesh, shard_experts)
        ),
        params,
    )


def opt_state_spec(leaf, mesh: Mesh) -> P:
    """ZeRO-2: shard each stateful leaf along its largest fsdp-divisible axis."""
    fsdp = mesh.shape[FSDP_AXIS]
    ndim = getattr(leaf, "ndim", 0)
    if fsdp <= 1 or ndim == 0:
        return P()
    shape = leaf.shape
    # pick the largest axis divisible by the fsdp size
    best = None
    for i, s in enumerate(shape):
        if s % fsdp == 0 and (best is None or s > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * ndim
    spec[best] = FSDP_AXIS
    return P(*spec)


def opt_state_shardings(opt_state: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, opt_state_spec(leaf, mesh)), opt_state
    )


def shard_params(params: Any, mesh: Mesh, shard_experts: bool = True) -> Any:
    """Device-put a param tree onto the mesh with the param sharding rules."""
    shardings = param_shardings(params, mesh, shard_experts)
    return jax.tree.map(jax.device_put, params, shardings)
