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


# megatron-style tensor-parallel rules: (param-path regex, axis to shard over
# 'tensor'). Column-parallel (shard output features) for qkv/q/kv/fc1/fc3,
# row-parallel (shard input features) for the following proj/fc2 — XLA inserts
# the all-reduce after the row-parallel matmul.
import re as _re

TENSOR_RULES = [
    (_re.compile(r".*/(qkv|q|kv)/kernel$"), 1),
    (_re.compile(r".*/fc1/kernel$"), 1),
    (_re.compile(r".*/fc3/kernel$"), 1),
    (_re.compile(r".*/(qkv|q|kv|fc1|fc3)/bias$"), 0),
    (_re.compile(r".*/proj/kernel$"), 0),
    (_re.compile(r".*/fc2/kernel$"), 0),
    (_re.compile(r".*token_emb/embedding$"), 1),  # vocab-parallel embedding dim
]


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def tensor_sharding_for(mesh: Mesh, path_str: str, x) -> NamedSharding:
    """Tensor-parallel sharding for one param; falls back to the fsdp rule."""
    tensor_size = mesh.shape.get("tensor", 1)
    if tensor_size > 1:
        for pat, axis in TENSOR_RULES:
            if pat.match(path_str) and x.ndim > axis and x.shape[axis] % tensor_size == 0:
                spec = [None] * x.ndim
                spec[axis] = "tensor"
                # combine with fsdp on another divisible axis if possible
                fsdp_size = mesh.shape.get("fsdp", 1)
                if fsdp_size > 1:
                    for other in sorted(range(x.ndim), key=lambda i: -x.shape[i]):
                        if other != axis and x.shape[other] % fsdp_size == 0                                 and x.shape[other] >= 2 * fsdp_size:
                            spec[other] = "fsdp"
                            break
                return NamedSharding(mesh, P(*spec))
    return fsdp_sharding_for(mesh, x)


def activation_sharder(mesh: Mesh):
    """Activation sharding constraints for tensor parallelism.

    Returns shard(x, kind) applying `with_sharding_constraint`:
      hidden      (B, N, D)     -> batch over (data, fsdp), D replicated
      heads       (B, H, N, Dh) -> heads over 'tensor' (megatron attention)
      mlp_hidden  (B, N, F)     -> hidden features over 'tensor' (column-
                                   parallel fc1/fc3 output)
    XLA then keeps the qkv/fc1 outputs sharded and inserts ONE all-reduce after
    the row-parallel proj/fc2 matmuls instead of gathering activations.
    """
    batch_axes = ("data", "fsdp")

    specs = {
        "hidden": P(batch_axes),
        "heads": P(batch_axes, "tensor"),
        "mlp_hidden": P(batch_axes, None, "tensor"),
    }

    def shard(x, kind: str):
        spec = specs[kind]
        if kind in ("heads", "mlp_hidden"):
            size = mesh.shape.get("tensor", 1)
            axis = 1 if kind == "heads" else 2
            if size == 1 or x.ndim <= axis or x.shape[axis] % size != 0:
                spec = P(batch_axes)
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return shard


def model_shardings(mesh: Mesh, tree) -> object:
    """Full-model sharding rules: tensor-parallel where annotated, ZeRO fsdp
    elsewhere. Apply to params or whole TrainState shape trees."""
    def rule(path, x):
        if not hasattr(x, "shape"):
            return replicated(mesh)
        return tensor_sharding_for(mesh, _path_str(path), x)

    return jax.tree_util.tree_map_with_path(rule, tree)
