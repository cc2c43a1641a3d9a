"""MLP backbones for global-embedding and pose tokenizers.

Reference: fourm/vq/models/mlp_models.py (BottleneckMLP / StandardMLP, from
"Scaling MLPs: A Tale of Inductive Bias"). Channel-last; image-shaped inputs
(B, H, W, C) are treated point-wise.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.transformer import LayerNorm

Dtype = jnp.dtype


def _flatten_image(x):
    if x.ndim == 4:
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C), (H, W)
    return x, None


def _unflatten_image(x, hw):
    if hw is None:
        return x
    B, _, C = x.shape
    return x.reshape(B, hw[0], hw[1], C)


class BottleneckBlock(nn.Module):
    thin: int
    wide: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.wide, dtype=self.dtype, name="block_0")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.thin, dtype=self.dtype, name="block_2")(h)


class BottleneckMLP(nn.Module):
    """Residual bottleneck MLP (reference mlp_models.py:75-113)."""

    dim_out: int
    block_dims: Tuple[Tuple[int, int], ...]  # (wide, thin) pairs
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x, hw = _flatten_image(x)
        x = nn.Dense(self.block_dims[0][1], dtype=self.dtype, name="linear_in")(x)
        for i, (wide, thin) in enumerate(self.block_dims):
            h = LayerNorm(eps=1e-5, dtype=self.dtype, name=f"layernorms_{i}")(x)
            x = x + BottleneckBlock(thin=thin, wide=wide, dtype=self.dtype, name=f"blocks_{i}")(h)
        x = nn.Dense(self.dim_out, dtype=self.dtype, name="linear_out")(x)
        return _unflatten_image(x, hw)


class StandardMLP(nn.Module):
    """Plain MLP with per-layer LayerNorm (reference mlp_models.py:34-72)."""

    dim_out: int
    widths: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x, hw = _flatten_image(x)
        z = nn.Dense(self.widths[0], dtype=self.dtype, name="linear_in")(x)
        for i in range(len(self.widths) - 1):
            z = LayerNorm(eps=1e-5, dtype=self.dtype, name=f"layernorms_{i}")(z)
            z = nn.Dense(self.widths[i + 1], dtype=self.dtype, name=f"layers_{i}")(z)
        z = nn.Dense(self.dim_out, dtype=self.dtype, name="linear_out")(z)
        return _unflatten_image(z, hw)


def build_mlp(model_id: str, dim_out: Optional[int] = None, dtype=jnp.float32):
    """Construct an MLP from an id string like "BottleneckMLP/B_6-Wi_1024"
    (reference mlp_models.py:118-160). The bottleneck thin width is Wi, wide = 4*Wi.
    """
    model, architecture = model_id.split("/")
    sep = architecture.split("-")
    num_blocks = int(sep[0].split("_")[1])
    thin = int(sep[1].split("_")[1])
    if len(sep) == 3:
        expansion_factor = int(sep[2].split("_")[1])
    else:
        expansion_factor = 4
    dim_out = dim_out if dim_out is not None else thin
    if model == "BottleneckMLP":
        blocks = tuple((expansion_factor * thin, thin) for _ in range(num_blocks))
        return BottleneckMLP(dim_out=dim_out, block_dims=blocks, dtype=dtype), thin
    if model == "MLP":
        widths = tuple(thin for _ in range(num_blocks))
        return StandardMLP(dim_out=dim_out, widths=widths, dtype=dtype), thin
    raise ValueError(f"model {model} not supported")
