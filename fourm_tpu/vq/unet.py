"""ADM-style UNet diffusion decoder ("unet_patched") — the decoder used by the
released 4M RGB/depth/edge DiVAE tokenizers.

Re-implements reference fourm/vq/models/unet/unet.py:103-752 in flax, NHWC:
guided-diffusion ResBlocks (GroupNorm-SiLU-Conv with timestep injection, optional
scale-shift norm), spatial self-attention at selected downsampling ratios,
zero-initialized output convs, and the PatchedUNetCondCat wrapper that patchifies
the input and concatenates nearest-upsampled conditioning channels
(arXiv:2207.04316).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def adm_timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Guided-diffusion sinusoidal embedding: cat([cos, sin])."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ADMResBlock(nn.Module):
    """Reference unet.py:163-275 (no up/down variant — 4M uses conv resampling)."""

    out_channels: int
    use_scale_shift_norm: bool = False
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        ch_in = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)
        e = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb))[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="out_norm")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + e
            h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if ch_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class ADMAttentionBlock(nn.Module):
    """Spatial self-attention (reference unet.py:277-375, legacy qkv order)."""

    num_heads: int = 1
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(h)
        hd = C // self.num_heads
        qkv = qkv.reshape(B, H * W, self.num_heads, 3, hd)
        q, k, v = [jnp.moveaxis(qkv[:, :, :, i], 1, 2) for i in range(3)]  # (B, nh, N, hd)
        scale = 1.0 / math.sqrt(math.sqrt(hd))  # legacy double-sqrt scaling
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = jnp.moveaxis(out, 1, 2).reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="proj_out")(out)
        return x + out.reshape(B, H, W, C)


class UNetModel(nn.Module):
    """ADM UNet (reference unet.py:411-692), NHWC."""

    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 3
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (8, 16)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_heads: int = 1
    use_scale_shift_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps):
        mc = self.model_channels
        time_dim = mc * 4
        emb = adm_timestep_embedding(jnp.broadcast_to(jnp.asarray(timesteps).reshape(-1), (x.shape[0],)), mc)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_0")(emb.astype(self.dtype))
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        ch = int(self.channel_mult[0] * mc)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="input_conv")(x.astype(self.dtype))
        hs = [h]
        ds = 1
        # down
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ADMResBlock(int(mult * mc), self.use_scale_shift_norm,
                                dtype=self.dtype, name=f"down_{level}_res_{i}")(h, emb)
                ch = int(mult * mc)
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(self.num_heads, dtype=self.dtype,
                                          name=f"down_{level}_attn_{i}")(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                            name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2
        # mid
        h = ADMResBlock(ch, self.use_scale_shift_norm, dtype=self.dtype, name="mid_res_0")(h, emb)
        h = ADMAttentionBlock(self.num_heads, dtype=self.dtype, name="mid_attn")(h)
        h = ADMResBlock(ch, self.use_scale_shift_norm, dtype=self.dtype, name="mid_res_1")(h, emb)
        # up
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ADMResBlock(int(mult * mc), self.use_scale_shift_norm,
                                dtype=self.dtype, name=f"up_{level}_res_{i}")(h, emb)
                ch = int(mult * mc)
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(self.num_heads, dtype=self.dtype,
                                          name=f"up_{level}_attn_{i}")(h)
                if level and i == self.num_res_blocks:
                    B, Hh, Ww, C = h.shape
                    h = jax.image.resize(h, (B, Hh * 2, Ww * 2, C), method="nearest")
                    h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                name=f"up_{level}_upsample")(h)
                    ds //= 2
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="out_conv")(h)


class PatchedUNetCondCat(nn.Module):
    """Patched UNet with conditioning concatenated to the patchified input
    (reference unet.py:693-747). Interface matches UViT: __call__(sample,
    timestep, condition, cond_mask, unconditional)."""

    in_channels: int = 3
    out_channels: int = 3
    cond_dim: int = 32
    patch_size: int = 4
    model_channels: int = 256
    num_res_blocks: int = 3
    attention_resolutions: Tuple[int, ...] = (4, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    use_scale_shift_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, condition, cond_mask=None, orig_res=None,
                 unconditional: bool = False):
        B, H, W, C = sample.shape
        P = self.patch_size
        nh, nw = H // P, W // P
        # patchify: (B, H, W, C) -> (B, nh, nw, C*P*P); channel-major patch layout
        # matches the reference rearrange 'b c (nh ph) (nw pw) -> b (c ph pw) nh nw'
        x = sample.reshape(B, nh, P, nw, P, C)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, nh, nw, C * P * P)

        if unconditional:
            cond_mask = jnp.ones(condition.shape[:3], dtype=bool)
        if cond_mask is not None:
            condition = jnp.where(cond_mask[..., None], 0.0, condition)
        cond_up = jax.image.resize(
            condition, (B, nh, nw, condition.shape[-1]), method="nearest"
        )
        x = jnp.concatenate([x.astype(self.dtype), cond_up.astype(self.dtype)], axis=-1)

        out = UNetModel(
            in_channels=C * P * P + self.cond_dim, model_channels=self.model_channels,
            out_channels=self.out_channels * P * P, num_res_blocks=self.num_res_blocks,
            attention_resolutions=self.attention_resolutions,
            channel_mult=self.channel_mult, use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype, name="unet",
        )(x, timestep)

        # depatchify
        out = out.reshape(B, nh, nw, self.out_channels, P, P)
        out = out.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, self.out_channels)
        return out


def unet_patched(in_channels=3, out_channels=3, cond_dim=32, dtype=jnp.float32, **kw):
    """Reference preset unet.py:748-757."""
    return PatchedUNetCondCat(
        in_channels=in_channels, out_channels=out_channels, cond_dim=cond_dim,
        patch_size=4, model_channels=256, num_res_blocks=3,
        attention_resolutions=(4, 8), channel_mult=(1, 2, 2, 2), dtype=dtype, **kw,
    )
