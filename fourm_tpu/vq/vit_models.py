"""ViT encoder/decoder backbones for VQ tokenizers (NHWC, TPU-native).

Re-implements reference fourm/vq/models/vit_models.py:338-861: plain pre-LN ViT
blocks mapping images/feature maps <-> latent grids, with
  * optional patch projection (disabled when tokenizing dense feature maps),
  * ViT-VQGAN-style post-MLP with tanh activation (fp32),
  * ConvNeXt output blocks to reduce patch artifacts,
  * bicubic positional-embedding interpolation for multi-resolution training.

All tensors are channel-last (B, H, W, C) / (B, N_H, N_W, D) — the TPU-native
layout; the checkpoint importer transposes torch NCHW conv weights.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.posemb import build_2d_sincos_posemb
from ..ops.transformer import Block, LayerNorm, Mlp

Dtype = jnp.dtype


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block (reference vit_models.py:298-336), channel-last."""

    dim: int
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        x = nn.Conv(
            self.dim, kernel_size=(7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        x = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,), jnp.float32,
            )
            x = x * gamma
        return inp + x


class PatchProj(nn.Module):
    """Patch embedding as an exact space-to-depth + one MXU matmul
    (numerically the strided Conv it replaces; same (kh, kw, C, O) param
    shape/names as nn.Conv so checkpoints and the torch importer are
    untouched). Motivation: a stride-16 conv over C=3 NHWC images makes XLA
    relayout the whole image (traced ~6 ms of pure copies per 64-image batch
    on v5e); the reshape+dot form needs one transpose pass and a clean
    [B*N, p*p*C] @ [p*p*C, D] matmul."""

    features: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        B, H, W, C = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, C, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        nh, nw = H // p, W // p
        xp = x.reshape(B, nh, p, nw, p, C).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B, nh, nw, p * p * C).astype(self.dtype)
        w = kernel.reshape(p * p * C, self.features).astype(self.dtype)
        return jnp.dot(xp, w) + bias.astype(self.dtype)


def _interp_posemb(pos: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """Bicubic-resize a (H0, W0, D) positional grid to (nh, nw, D)
    (reference F.interpolate bicubic, vit_models.py:485-488)."""
    if pos.shape[0] == nh and pos.shape[1] == nw:
        return pos
    return jax.image.resize(pos, (nh, nw, pos.shape[-1]), method="bicubic")


class ViTEncoder(nn.Module):
    """Images / feature maps -> latent grid (reference vit_models.py:338-501).

    Input (B, H, W, C) with patch_proj, else (B, N_H, N_W, C).
    Output (B, N_H, N_W, dim_tokens).
    """

    in_channels: int = 3
    patch_size: int = 16
    resolution: int = 256
    dim_tokens: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    sincos_pos_emb: bool = True
    patch_proj: bool = True
    post_mlp: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        if self.patch_proj:
            H, W = x.shape[1:3]
            nh, nw = H // self.patch_size, W // self.patch_size
            x = PatchProj(
                features=self.dim_tokens, patch_size=self.patch_size,
                dtype=self.dtype, name="proj",
            )(x)
        else:
            nh, nw = x.shape[1:3]
            x = nn.Conv(self.dim_tokens, kernel_size=(1, 1), dtype=self.dtype, name="proj")(x)

        n0h = self.resolution // self.patch_size if self.patch_proj else nh
        n0w = self.resolution // self.patch_size if self.patch_proj else nw
        if self.sincos_pos_emb:
            pos = build_2d_sincos_posemb(n0h, n0w, self.dim_tokens).reshape(n0h, n0w, -1)
        else:
            pos = self.param(
                "pos_emb", nn.initializers.truncated_normal(0.02),
                (n0h, n0w, self.dim_tokens), jnp.float32,
            )
        pos = _interp_posemb(pos, nh, nw).reshape(1, nh * nw, self.dim_tokens)
        x = x.reshape(B, nh * nw, self.dim_tokens) + pos.astype(self.dtype)

        for i in range(self.depth):
            x = Block(
                dim=self.dim_tokens, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, dtype=self.dtype, name=f"blocks_{i}",
            )(x)

        if self.post_mlp:
            # fp32 post-MLP, tanh activation (ViT-VQGAN; reference :495-497)
            x32 = x.astype(jnp.float32)
            h = LayerNorm(eps=1e-6, name="norm_mlp")(x32)
            x = x32 + Mlp(
                hidden_dim=int(self.mlp_ratio * self.dim_tokens), act=jnp.tanh,
                name="post_mlp",
            )(h)
            x = x.astype(self.dtype)
        return x.reshape(B, nh, nw, self.dim_tokens)


class ViTDecoder(nn.Module):
    """Latent grid -> images / feature maps (reference vit_models.py:504-661).

    Input (B, N_H, N_W, D); output (B, H, W, out_channels) with patch_proj,
    else (B, N_H, N_W, out_channels).
    """

    out_channels: int = 3
    patch_size: int = 16
    resolution: int = 256
    dim_tokens: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    sincos_pos_emb: bool = True
    patch_proj: bool = True
    post_mlp: bool = False
    out_conv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, nh, nw, D = x.shape
        n0 = self.resolution // self.patch_size
        if self.sincos_pos_emb:
            pos = build_2d_sincos_posemb(n0, n0, self.dim_tokens).reshape(n0, n0, -1)
        else:
            pos = self.param(
                "pos_emb", nn.initializers.truncated_normal(0.02),
                (n0, n0, self.dim_tokens), jnp.float32,
            )
        pos = _interp_posemb(pos, nh, nw).reshape(1, nh * nw, self.dim_tokens)
        x = x.reshape(B, nh * nw, D) + pos.astype(self.dtype)

        for i in range(self.depth):
            x = Block(
                dim=self.dim_tokens, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, dtype=self.dtype, name=f"blocks_{i}",
            )(x)

        if self.post_mlp:
            h = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm_mlp")(x)
            x = x + Mlp(
                hidden_dim=int(self.mlp_ratio * self.dim_tokens), act=jnp.tanh,
                dtype=self.dtype, name="post_mlp",
            )(h)

        ph = self.patch_size if self.patch_proj else 1
        x = nn.Dense(self.out_channels * ph * ph, dtype=self.dtype, name="out_proj")(x)
        # (B, nh*nw, c*ph*pw) -> (B, nh*ph, nw*pw, c); channel-major patch layout
        # matches the reference rearrange '... (c ph pw)' (vit_models.py:648-652).
        x = x.reshape(B, nh, nw, self.out_channels, ph, ph)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(B, nh * ph, nw * ph, self.out_channels)

        if self.out_conv:
            x = ConvNeXtBlock(dim=self.out_channels, dtype=self.dtype, name="out_conv_0")(x)
            x = ConvNeXtBlock(dim=self.out_channels, dtype=self.dtype, name="out_conv_1")(x)
        return x


# Size presets (reference vit_models.py:664-861)
VIT_SIZES = {
    # vit_t is a fourm_tpu addition for tests/debug runs (no reference preset)
    "vit_t": dict(dim_tokens=64, depth=2, num_heads=2),
    "vit_s": dict(dim_tokens=512, depth=8, num_heads=8),
    "vit_b": dict(dim_tokens=768, depth=12, num_heads=12),
    "vit_l": dict(dim_tokens=1024, depth=24, num_heads=16),
}


def build_vit_encoder(enc_type: str, in_channels: int, patch_size: int, resolution: int,
                      patch_proj: bool = True, post_mlp: bool = False,
                      dtype=jnp.float32) -> ViTEncoder:
    size = VIT_SIZES[enc_type.replace("_enc", "")]
    return ViTEncoder(
        in_channels=in_channels, patch_size=patch_size, resolution=resolution,
        patch_proj=patch_proj, post_mlp=post_mlp, dtype=dtype, **size,
    )


def build_vit_decoder(dec_type: str, out_channels: int, patch_size: int, resolution: int,
                      patch_proj: bool = True, post_mlp: bool = False,
                      out_conv: bool = False, dtype=jnp.float32) -> ViTDecoder:
    size = VIT_SIZES[dec_type.replace("_dec", "")]
    return ViTDecoder(
        out_channels=out_channels, patch_size=patch_size, resolution=resolution,
        patch_proj=patch_proj, post_mlp=post_mlp, out_conv=out_conv, dtype=dtype, **size,
    )
