"""Device mesh construction for SPMD training/inference.

TPU-native replacement for the reference's torchrun+NCCL process topology
(fourm/utils/dist.py:31-100): a single `jax.sharding.Mesh` with
  data - pure data parallelism (maps to DCN across slices / ICI within)
  fsdp - combined data parallelism + parameter/optimizer sharding (ZeRO-3-style;
         covers the reference's FSDP SHARD_GRAD_OP mode, run_training_4m_fsdp.py:516-555)
  tensor - megatron-style tensor parallelism (not required for parity; axis kept so
         XL-scale serving can shard attention/MLP weights)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "fsdp", "tensor")


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp, tensor) mesh. data=-1 absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (fsdp * tensor) != 0:
            raise ValueError(f"{n} devices not divisible by fsdp*tensor={fsdp * tensor}")
        data = n // (fsdp * tensor)
    if data * fsdp * tensor != n:
        raise ValueError(f"mesh {data}x{fsdp}x{tensor} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(dev_array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches are sharded over both data-parallel axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding_for(mesh: Mesh, x: jax.ShapeDtypeStruct) -> NamedSharding:
    """ZeRO-style parameter sharding rule: shard the largest axis divisible by the
    fsdp axis size; replicate small or indivisible tensors.

    This is the pjit analogue of FSDP flat-param sharding — XLA inserts the
    all-gathers per layer (backward prefetch comes free from the scheduler).
    """
    fsdp_size = mesh.shape["fsdp"]
    if fsdp_size == 1 or x.ndim == 0:
        return replicated(mesh)
    # prefer the largest dimension for even sharding
    order = sorted(range(x.ndim), key=lambda i: -x.shape[i])
    for axis in order:
        if x.shape[axis] % fsdp_size == 0 and x.shape[axis] >= 2 * fsdp_size:
            spec = [None] * x.ndim
            spec[axis] = "fsdp"
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def params_shardings(mesh: Mesh, params) -> object:
    """Map a param pytree to NamedShardings via fsdp_sharding_for."""
    return jax.tree.map(
        lambda p: fsdp_sharding_for(mesh, jax.ShapeDtypeStruct(p.shape, p.dtype))
        if hasattr(p, "shape") else replicated(mesh),
        params,
    )
