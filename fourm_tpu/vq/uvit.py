"""UViT diffusion decoder: conditional UNet with a Transformer bottleneck.

Re-implements reference fourm/vq/models/uvit.py:45-1104 (and the diffusers UNet
pieces it borrows: ResnetBlock2D / Down-/Up-sample2D / Timesteps / TimestepEmbedding)
in flax, channel-last (NHWC — TPU-native). Features:

  * patched input (arXiv:2207.04316) + small conv down/up stacks,
  * Transformer mid blocks with adaLN modulation + adaLN-Zero gates
    (arXiv:2212.09748) and optional U-ViT long skips (arXiv:2209.12152),
  * conditioning by latent concat (TransformerConcatCond) or cross-attention
    (TransformerXattnCond), with a learned mask token for CFG condition dropout,
  * SDXL-style original-resolution embedding (arXiv:2307.01952).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.posemb import build_2d_sincos_posemb
from ..ops.transformer import mask_to_bias, dot_product_attention

Dtype = jnp.dtype


def modulate(x, shift, scale):
    """AdaLN modulation (reference uvit.py:45-46)."""
    return x * (1 + scale) + shift


def get_timestep_embedding(
    timesteps: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0, max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers Timesteps)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """2-layer MLP over the sinusoidal embedding (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """GroupNorm-SiLU-Conv x2 with time-embedding injection (diffusers ResnetBlock2D)."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    output_scale_factor: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        temb_proj = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + temb_proj[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_size: Optional[Tuple[int, int]] = None):
        B, H, W, C = x.shape
        size = out_size or (H * 2, W * 2)
        x = jax.image.resize(x, (B, size[0], size[1], C), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class AdaLNAttention(nn.Module):
    """Plain MHA used inside UViT blocks (reference uvit.py:129-173)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)]
        out = dot_product_attention(q, k, v, mask_to_bias(mask, N))
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class AdaLNBlock(nn.Module):
    """Transformer block with adaLN modulation + adaLN-Zero gates and optional
    long-skip input (reference uvit.py:226-254)."""

    dim: int
    num_heads: int
    temb_dim: Optional[int] = None
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, mask=None, skip_connection=None):
        D = self.dim
        if self.temb_dim is not None:
            st = nn.silu(temb)
            mod = nn.Dense(4 * D, dtype=self.dtype, name="adaLN_modulation")(st)
            shift_msa, scale_msa, shift_mlp, scale_mlp = jnp.split(mod[:, None, :], 4, axis=-1)
            gates = nn.Dense(
                2 * D, dtype=self.dtype, name="adaLN_gate",
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            )(st)
            gate_msa, gate_mlp = jnp.split(gates[:, None, :], 2, axis=-1)
        else:
            shift_msa = scale_msa = shift_mlp = scale_mlp = 0.0
            gate_msa = gate_mlp = 1.0
        if self.skip:
            x = nn.Dense(D, dtype=self.dtype, name="skip_linear")(
                jnp.concatenate([x, skip_connection], axis=-1)
            )
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + gate_msa * AdaLNAttention(
            dim=D, num_heads=self.num_heads, qkv_bias=self.qkv_bias, dtype=self.dtype, name="attn"
        )(modulate(h, shift_msa, scale_msa), mask)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = modulate(h, shift_mlp, scale_mlp)
        h = nn.Dense(int(D * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="mlp_fc2")(h)
        x = x + gate_mlp * h
        return x


class AdaLNDecoderBlock(nn.Module):
    """adaLN transformer block with cross-attention to a conditioning sequence
    (reference uvit.py:256-289)."""

    dim: int
    num_heads: int
    dim_context: int
    temb_dim: Optional[int] = None
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, temb=None, xa_mask=None, skip_connection=None):
        D = self.dim
        if self.temb_dim is not None:
            st = nn.silu(temb)
            mod = nn.Dense(6 * D, dtype=self.dtype, name="adaLN_modulation")(st)
            (shift_msa, scale_msa, shift_mxa, scale_mxa,
             shift_mlp, scale_mlp) = jnp.split(mod[:, None, :], 6, axis=-1)
            gates = nn.Dense(3 * D, dtype=self.dtype, name="adaLN_gate",
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros)(st)
            gate_msa, gate_mxa, gate_mlp = jnp.split(gates[:, None, :], 3, axis=-1)
        else:
            shift_msa = scale_msa = shift_mxa = scale_mxa = shift_mlp = scale_mlp = 0.0
            gate_msa = gate_mxa = gate_mlp = 1.0
        if self.skip:
            x = nn.Dense(D, dtype=self.dtype, name="skip_linear")(
                jnp.concatenate([x, skip_connection], axis=-1))
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + gate_msa * AdaLNAttention(
            dim=D, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="self_attn",
        )(modulate(h, shift_msa, scale_msa))
        # cross-attention: queries from x, keys/values from the conditioning
        B, N, _ = x.shape
        M = context.shape[1]
        hd = D // self.num_heads
        hq = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="query_norm")(x)
        hq = modulate(hq, shift_mxa, scale_mxa)
        ctx = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="context_norm")(context)
        q = nn.Dense(D, use_bias=self.qkv_bias, dtype=self.dtype, name="xattn_q")(hq)
        kv = nn.Dense(2 * D, use_bias=self.qkv_bias, dtype=self.dtype, name="xattn_kv")(ctx)
        q = jnp.moveaxis(q.reshape(B, N, self.num_heads, hd), 1, 2)
        kv = kv.reshape(B, M, 2, self.num_heads, hd)
        kk, vv = [jnp.moveaxis(kv[:, :, i], 1, 2) for i in range(2)]
        out = dot_product_attention(q, kk, vv, mask_to_bias(xa_mask, N))
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, D)
        x = x + gate_mxa * nn.Dense(D, dtype=self.dtype, name="xattn_proj")(out)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = modulate(h, shift_mlp, scale_mlp)
        h = nn.Dense(int(D * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="mlp_fc2")(h)
        return x + gate_mlp * h


class TransformerXattnCond(nn.Module):
    """UViT bottleneck with cross-attention conditioning (reference uvit.py:413-527)."""

    unet_dim: int
    cond_dim: int
    mid_layers: int = 12
    mid_num_heads: int = 12
    mid_dim: int = 768
    mid_mlp_ratio: float = 4.0
    mid_qkv_bias: bool = True
    time_embed_dim: int = 512
    hw_posemb: int = 16
    use_long_skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, cond, cond_mask=None):
        B, H, W, _ = x.shape
        x = x.reshape(B, H * W, -1)
        x = nn.Dense(self.mid_dim, dtype=self.dtype, name="mid_proj_in")(x)
        pos = build_2d_sincos_posemb(self.hw_posemb, self.hw_posemb, self.mid_dim)
        pos = pos.reshape(self.hw_posemb, self.hw_posemb, -1)
        if (H, W) != (self.hw_posemb, self.hw_posemb):
            pos = jax.image.resize(pos, (H, W, self.mid_dim), method="nearest")
        x = x + pos.reshape(1, H * W, self.mid_dim).astype(x.dtype)

        ctx = cond.reshape(B, cond.shape[1] * cond.shape[2], cond.shape[-1])
        xa_mask = None
        if cond_mask is not None:
            xa_mask = cond_mask.reshape(B, 1, -1)  # True = not attended

        blocks = [
            AdaLNDecoderBlock(
                dim=self.mid_dim, num_heads=self.mid_num_heads, dim_context=self.cond_dim,
                temb_dim=self.time_embed_dim, mlp_ratio=self.mid_mlp_ratio,
                qkv_bias=self.mid_qkv_bias,
                skip=(i > self.mid_layers // 2 and self.use_long_skip),
                dtype=self.dtype, name=f"mid_block_{i}",
            )
            for i in range(self.mid_layers)
        ]
        if not self.use_long_skip:
            for blk in blocks:
                x = blk(x, ctx, temb, xa_mask)
        else:
            skips = []
            n = self.mid_layers // 2
            for blk in blocks[:n]:
                x = blk(x, ctx, temb, xa_mask)
                skips.append(x)
            x = blocks[n](x, ctx, temb, xa_mask)
            for blk in blocks[n + 1:]:
                x = blk(x, ctx, temb, xa_mask, skip_connection=skips.pop())

        x = nn.Dense(self.unet_dim, dtype=self.dtype, name="mid_proj_out")(x)
        return x.reshape(B, H, W, self.unet_dim)


class TransformerConcatCond(nn.Module):
    """UViT bottleneck with latent-concat conditioning (reference uvit.py:291-412)."""

    unet_dim: int
    cond_dim: int
    mid_layers: int = 12
    mid_num_heads: int = 12
    mid_dim: int = 768
    mid_mlp_ratio: float = 4.0
    mid_qkv_bias: bool = True
    time_embed_dim: int = 512
    hw_posemb: int = 16
    use_long_skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, cond, cond_mask=None):
        B, H, W, _ = x.shape
        x = x.reshape(B, H * W, -1)
        x = nn.Dense(self.mid_dim, dtype=self.dtype, name="mid_proj_in")(x)

        # condition -> tokens at the mid resolution (nearest interp, uvit.py:377)
        if cond.shape[1:3] != (H, W):
            cond = jax.image.resize(cond, (B, H, W, cond.shape[-1]), method="nearest")
        cond = cond.reshape(B, H * W, -1)
        cond = nn.Dense(self.mid_dim, dtype=self.dtype, name="mid_cond_proj")(cond)
        mask_token = self.param("mask_token", nn.initializers.zeros, (self.mid_dim,), jnp.float32)
        if cond_mask is not None:
            # CFG condition dropout: masked positions take the learned mask token
            cm = cond_mask.astype(jnp.float32)[..., None]
            if cond_mask.shape[1:3] != (H, W):
                cm = jax.image.resize(cm, (B, H, W, 1), method="nearest")
            cm = cm.reshape(B, H * W, 1) > 0.5
            cond = jnp.where(cm, mask_token.astype(cond.dtype), cond)
        x = x + cond

        pos = build_2d_sincos_posemb(self.hw_posemb, self.hw_posemb, self.mid_dim)
        pos = pos.reshape(self.hw_posemb, self.hw_posemb, -1)
        if (H, W) != (self.hw_posemb, self.hw_posemb):
            pos = jax.image.resize(pos, (H, W, self.mid_dim), method="bicubic")
        x = x + pos.reshape(1, H * W, self.mid_dim).astype(x.dtype)

        blocks = [
            AdaLNBlock(
                dim=self.mid_dim, num_heads=self.mid_num_heads, temb_dim=self.time_embed_dim,
                mlp_ratio=self.mid_mlp_ratio, qkv_bias=self.mid_qkv_bias,
                skip=(i > self.mid_layers // 2 and self.use_long_skip),
                dtype=self.dtype, name=f"mid_block_{i}",
            )
            for i in range(self.mid_layers)
        ]
        if not self.use_long_skip:
            for blk in blocks:
                x = blk(x, temb)
        else:
            skips = []
            n = self.mid_layers // 2
            for blk in blocks[:n]:
                x = blk(x, temb)
                skips.append(x)
            x = blocks[n](x, temb)
            for blk in blocks[n + 1:]:
                x = blk(x, temb, skip_connection=skips.pop())

        x = nn.Dense(self.unet_dim, dtype=self.dtype, name="mid_proj_out")(x)
        return x.reshape(B, H, W, self.unet_dim)


class UViT(nn.Module):
    """Conditional UViT diffusion model (reference uvit.py:528-974), NHWC.

    __call__(sample (B,H,W,C), timestep (B,) or scalar, condition (B,Hc,Wc,Dc),
             cond_mask (B,Hc,Wc) bool, orig_res (B,2)) -> (B,H,W,C_out)
    """

    sample_size: Optional[int] = None
    in_channels: int = 3
    out_channels: int = 3
    patch_size: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512)
    layers_per_block: int = 2
    downsample_before_mid: bool = False
    mid_layers: int = 12
    mid_num_heads: int = 12
    mid_dim: int = 768
    mid_mlp_ratio: float = 4.0
    mid_qkv_bias: bool = True
    mid_hw_posemb: int = 32
    mid_use_long_skip: bool = False
    cond_dim: int = 32
    cond_type: str = "concat"
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    resnet_out_scale_factor: float = 1.0
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    res_embedding: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, condition, cond_mask=None, orig_res=None,
                 unconditional: bool = False):
        B = sample.shape[0]
        ch0 = self.block_out_channels[0]
        time_embed_dim = ch0 * 4

        timesteps = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (B,))
        t_emb = get_timestep_embedding(timesteps, ch0, self.flip_sin_to_cos, self.freq_shift)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )
        if self.res_embedding and orig_res is not None:
            h_orig = jnp.broadcast_to(jnp.asarray(orig_res)[..., 0].reshape(-1), (B,))
            w_orig = jnp.broadcast_to(jnp.asarray(orig_res)[..., 1].reshape(-1), (B,))
            h_emb = get_timestep_embedding(h_orig, ch0, self.flip_sin_to_cos, self.freq_shift)
            w_emb = get_timestep_embedding(w_orig, ch0, self.flip_sin_to_cos, self.freq_shift)
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="height_embedding")(h_emb.astype(self.dtype))
            emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="width_embedding")(w_emb.astype(self.dtype))

        # CFG unconditional pass: mask out the entire condition (reference
        # generates it via the cond_mask mechanism, vqvae.py:618-640)
        if unconditional:
            cond_mask = jnp.ones(condition.shape[:3], dtype=bool)

        # input patching
        x = nn.Conv(
            ch0, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding=0,
            dtype=self.dtype, name="conv_in",
        )(sample.astype(self.dtype))

        # down blocks
        res_stack = [x]
        n_blocks = len(self.block_out_channels)
        for i, out_ch in enumerate(self.block_out_channels):
            is_final = i == n_blocks - 1
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(
                    out_channels=out_ch, groups=self.norm_num_groups, eps=self.norm_eps,
                    output_scale_factor=self.resnet_out_scale_factor, dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(x, emb)
                res_stack.append(x)
            if not is_final:
                x = Downsample2D(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
                res_stack.append(x)
        if self.downsample_before_mid:
            x = Downsample2D(self.block_out_channels[-1], dtype=self.dtype, name="downsample_mid")(x)

        # mid transformer
        mid_cls = TransformerConcatCond if self.cond_type == "concat" else TransformerXattnCond
        x = mid_cls(
            unet_dim=self.block_out_channels[-1], cond_dim=self.cond_dim,
            mid_layers=self.mid_layers, mid_num_heads=self.mid_num_heads,
            mid_dim=self.mid_dim, mid_mlp_ratio=self.mid_mlp_ratio,
            mid_qkv_bias=self.mid_qkv_bias, time_embed_dim=time_embed_dim,
            hw_posemb=self.mid_hw_posemb, use_long_skip=self.mid_use_long_skip,
            dtype=self.dtype, name="mid_block",
        )(x, emb, condition.astype(self.dtype), cond_mask)

        if self.downsample_before_mid:
            x = Upsample2D(self.block_out_channels[-1], dtype=self.dtype, name="upsample_mid")(x)

        # up blocks (diffusers UpBlock2D: layers_per_block+1 resnets w/ skip concat)
        rev_channels = list(reversed(self.block_out_channels))
        for i, out_ch in enumerate(rev_channels):
            is_final = i == n_blocks - 1
            for j in range(self.layers_per_block + 1):
                res = res_stack.pop()
                x = jnp.concatenate([x, res], axis=-1)
                x = ResnetBlock2D(
                    out_channels=out_ch, groups=self.norm_num_groups, eps=self.norm_eps,
                    output_scale_factor=self.resnet_out_scale_factor, dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(x, emb)
            if not is_final:
                out_size = res_stack[-1].shape[1:3]
                x = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(x, out_size)

        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        # transpose_kernel=True matches torch ConvTranspose2d semantics so released
        # DiVAE decoder weights import directly (see utils/checkpoint.py)
        x = nn.ConvTranspose(
            self.out_channels, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            transpose_kernel=True, dtype=self.dtype, name="conv_out",
        )(x)
        return x


# Presets (reference uvit.py:976-1104)
UVIT_PRESETS = {
    # test/debug-scale preset (fourm_tpu addition, no reference equivalent)
    "uvit_t_p4_f16": dict(patch_size=4, block_out_channels=(32, 64),
                          layers_per_block=1, downsample_before_mid=True,
                          mid_layers=2, mid_num_heads=2, mid_dim=64),
    "uvit_b_p4_f16": dict(patch_size=4, block_out_channels=(128, 256), layers_per_block=2,
                          downsample_before_mid=True, mid_layers=12, mid_num_heads=12, mid_dim=768),
    "uvit_l_p4_f16": dict(patch_size=4, block_out_channels=(128, 256), layers_per_block=2,
                          downsample_before_mid=True, mid_layers=24, mid_num_heads=16, mid_dim=1024),
    "uvit_h_p4_f16": dict(patch_size=4, block_out_channels=(128, 256), layers_per_block=2,
                          downsample_before_mid=True, mid_layers=32, mid_num_heads=16, mid_dim=1280),
    "uvit_b_p4_f16_longskip": dict(patch_size=4, block_out_channels=(128, 256), layers_per_block=2,
                                   downsample_before_mid=True, mid_layers=13, mid_num_heads=12,
                                   mid_dim=768, mid_use_long_skip=True),
    "uvit_l_p4_f16_longskip": dict(patch_size=4, block_out_channels=(128, 256), layers_per_block=2,
                                   downsample_before_mid=True, mid_layers=25, mid_num_heads=16,
                                   mid_dim=1024, mid_use_long_skip=True),
    "uvit_b_p4_f8": dict(patch_size=4, block_out_channels=(128, 256), layers_per_block=2,
                         downsample_before_mid=False, mid_layers=12, mid_num_heads=12, mid_dim=768),
    "uvit_l_p4_f8": dict(patch_size=4, block_out_channels=(128, 256), layers_per_block=2,
                         downsample_before_mid=False, mid_layers=24, mid_num_heads=16, mid_dim=1024),
    "uvit_b_p4_f16_extraconv": dict(patch_size=4, block_out_channels=(128, 256, 512), layers_per_block=2,
                                    downsample_before_mid=False, mid_layers=12, mid_num_heads=12, mid_dim=768),
    "uvit_l_p4_f16_extraconv": dict(patch_size=4, block_out_channels=(128, 256, 512), layers_per_block=2,
                                    downsample_before_mid=False, mid_layers=24, mid_num_heads=16, mid_dim=1024),
}


def build_uvit(preset: str, **kwargs) -> UViT:
    return UViT(**{**UVIT_PRESETS[preset], **kwargs})
