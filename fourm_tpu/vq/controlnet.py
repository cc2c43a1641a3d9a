"""ControlNet detokenizer decoder + SD-style VAE, TPU-native.

Re-implements the architecture of the reference VQControlNet decoder
(fourm/vq/models/controlnet.py:102-255 `ControlnetCond` and
fourm/vq/vqvae.py:766-1047) without requiring pretrained Stable Diffusion
weights: the frozen SD 1.5 UNet + trainable ControlNet copy + frozen SD VAE are
built here as flax modules of the same shape family (cross-attention UNet over
VAE latents, zero-initialized residual taps, conv conditioning embedding).
Pretrained weights, when available, load through the generic VQ safetensors
name mapping; random init keeps every code path testable offline.

Structure (names chosen to mirror the reference):
  * ControlNetCond.unet          — base UNet (frozen during ControlNet training)
  * ControlNetCond.controlnet    — trainable copy of the UNet down+mid path
  * controlnet.cond_embedding    — conv stack embedding the quantized-latent map
                                   (reference ControlNetConditioningEmbedding)
  * controlnet.zero_convs / mid_zero_conv — zero-init 1x1 residual taps
  * AutoencoderKL                — SD-style KL VAE for the latent target space
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import ADMResBlock, adm_timestep_embedding

Dtype = jnp.dtype


class SpatialSelfAttention(nn.Module):
    """Self-attention over an NHWC feature map (pre-norm, residual)."""

    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        hd = C // self.num_heads

        def split(t):
            return jnp.moveaxis(t.reshape(B, -1, self.num_heads, hd), 1, 2)

        logits = jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k),
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, split(v))
        out = jnp.moveaxis(out, 1, 2).reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="proj_out")(out)
        return x + out.reshape(B, H, W, C)


class SpatialCrossAttention(nn.Module):
    """Cross-attention from an NHWC feature map into a (B, L, D) context —
    the SD-UNet text-conditioning path (prompt embeddings)."""

    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(context.astype(self.dtype))
        v = nn.Dense(C, dtype=self.dtype, name="v")(context.astype(self.dtype))
        hd = C // self.num_heads

        def split(t):
            return jnp.moveaxis(t.reshape(B, -1, self.num_heads, hd), 1, 2)

        logits = jnp.einsum("bhnd,bhmd->bhnm", split(q), split(k),
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, split(v))
        out = jnp.moveaxis(out, 1, 2).reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                       name="proj_out")(out)
        return x + out.reshape(B, H, W, C)


class ControlNetConditioningEmbedding(nn.Module):
    """Conv stack embedding the conditioning map, zero-init final conv
    (reference controlnet.py:65-100)."""

    out_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_out_channels) - 1):
            h = nn.Conv(self.block_out_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f"block_{2*i}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.block_out_channels[i + 1], (3, 3), padding=1,
                        dtype=self.dtype, name=f"block_{2*i+1}")(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="conv_out")(h)


class _UNetConfigMixin:
    """Shared hyperparameters for the base UNet and its ControlNet copy."""


class UNetEncoderPath(nn.Module):
    """conv_in + down blocks + mid — the part of the UNet the ControlNet branch
    duplicates. Returns (h_mid, skip_list)."""

    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context, cond_embedding=None):
        mc = self.model_channels
        h = nn.Conv(int(self.channel_mult[0] * mc), (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        if cond_embedding is not None:
            h = h + cond_embedding
        hs = [h]
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ADMResBlock(int(mult * mc), use_scale_shift_norm=False,
                                dtype=self.dtype, name=f"down_{level}_res_{i}")(h, emb)
                if level in self.attention_levels:
                    h = SpatialSelfAttention(self.num_heads, dtype=self.dtype,
                                             name=f"down_{level}_attn_{i}")(h)
                    h = SpatialCrossAttention(self.num_heads, dtype=self.dtype,
                                              name=f"down_{level}_xattn_{i}")(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f"down_{level}_downsample")(h)
                hs.append(h)
        h = ADMResBlock(h.shape[-1], dtype=self.dtype, name="mid_res_0")(h, emb)
        h = SpatialSelfAttention(self.num_heads, dtype=self.dtype, name="mid_attn")(h)
        h = SpatialCrossAttention(self.num_heads, dtype=self.dtype,
                                  name="mid_xattn")(h, context)
        h = ADMResBlock(h.shape[-1], dtype=self.dtype, name="mid_res_1")(h, emb)
        return h, hs


class TimestepEmbed(nn.Module):
    model_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps, batch):
        t = jnp.broadcast_to(jnp.asarray(timesteps).reshape(-1), (batch,))
        emb = adm_timestep_embedding(t, self.model_channels).astype(self.dtype)
        emb = nn.Dense(self.model_channels * 4, dtype=self.dtype, name="fc1")(emb)
        return nn.Dense(self.model_channels * 4, dtype=self.dtype, name="fc2")(nn.silu(emb))


class CondUNet(nn.Module):
    """SD-style cross-attention UNet over latents, with optional ControlNet
    residual injection (reference: diffusers UNet2DConditionModel as used in
    controlnet.py:204-211)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, context, down_residuals=None,
                 mid_residual=None):
        mc = self.model_channels
        emb = TimestepEmbed(mc, dtype=self.dtype, name="time_embed")(
            timesteps, sample.shape[0]
        )
        h, hs = UNetEncoderPath(
            model_channels=mc, num_res_blocks=self.num_res_blocks,
            channel_mult=self.channel_mult, attention_levels=self.attention_levels,
            num_heads=self.num_heads, dtype=self.dtype, name="encoder",
        )(sample, emb, context)

        if mid_residual is not None:
            h = h + mid_residual
        if down_residuals is not None:
            hs = [s + r for s, r in zip(hs, down_residuals)]

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ADMResBlock(int(mult * mc), dtype=self.dtype,
                                name=f"up_{level}_res_{i}")(h, emb)
                if level in self.attention_levels:
                    h = SpatialSelfAttention(self.num_heads, dtype=self.dtype,
                                             name=f"up_{level}_attn_{i}")(h)
                    h = SpatialCrossAttention(self.num_heads, dtype=self.dtype,
                                              name=f"up_{level}_xattn_{i}")(h, context)
                if level and i == self.num_res_blocks:
                    B, H, W, C = h.shape
                    h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                    h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                                name=f"up_{level}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="out_norm")(h)
        # NOT zero-init: the SD UNet conv_out is normally initialized (diffusers
        # UNet2DConditionModel); with a frozen base, a zero final conv would
        # block all gradient to the ControlNet branch.
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(nn.silu(h))


class ControlNetBranch(nn.Module):
    """Trainable copy of the UNet encoder path + conditioning embedding +
    zero-init residual taps (reference diffusers ControlNetModel with a custom
    conditioning embedding, controlnet.py:126-152)."""

    in_channels: int = 4
    cond_channels: int = 32
    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    num_heads: int = 8
    cond_embedding_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, context, cond):
        mc = self.model_channels
        emb = TimestepEmbed(mc, dtype=self.dtype, name="time_embed")(
            timesteps, sample.shape[0]
        )
        cond_emb = ControlNetConditioningEmbedding(
            out_channels=int(self.channel_mult[0] * mc),
            block_out_channels=self.cond_embedding_channels,
            dtype=self.dtype, name="cond_embedding",
        )(cond.astype(self.dtype))
        h, hs = UNetEncoderPath(
            model_channels=mc, num_res_blocks=self.num_res_blocks,
            channel_mult=self.channel_mult, attention_levels=self.attention_levels,
            num_heads=self.num_heads, dtype=self.dtype, name="encoder",
        )(sample, emb, context, cond_embedding=cond_emb)

        down_residuals = [
            nn.Conv(s.shape[-1], (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name=f"zero_conv_{i}")(s)
            for i, s in enumerate(hs)
        ]
        mid_residual = nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                               kernel_init=nn.initializers.zeros,
                               name="mid_zero_conv")(h)
        return down_residuals, mid_residual


class ControlNetCond(nn.Module):
    """Frozen base UNet + trainable ControlNet branch conditioned on the
    quantized-token latent map (reference ControlnetCond, controlnet.py:102-255).

    Interface matches UViT/PatchedUNetCondCat so VQControlNet can drive it
    through the shared diffusion pipeline: __call__(sample, timestep, condition,
    cond_mask, unconditional, cond_scale, prompt_emb).
    """

    in_channels: int = 4
    cond_channels: int = 32
    sample_size: int = 28  # latent H=W (image_size / vae downscale 8)
    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    num_heads: int = 8
    context_len: int = 77
    context_dim: int = 768
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(
            model_channels=self.model_channels, num_res_blocks=self.num_res_blocks,
            channel_mult=self.channel_mult, attention_levels=self.attention_levels,
            num_heads=self.num_heads, dtype=self.dtype,
        )
        self.unet = CondUNet(in_channels=self.in_channels,
                             out_channels=self.in_channels, **kw, name="unet")
        self.controlnet = ControlNetBranch(
            in_channels=self.in_channels, cond_channels=self.cond_channels,
            **kw, name="controlnet",
        )
        # stands in for the frozen CLIP empty-prompt encoding the reference
        # stores as a non-trainable parameter (controlnet.py:158); real values
        # import through the checkpoint mapping
        self.empty_str_encoding = self.param(
            "empty_str_encoding", nn.initializers.normal(0.02),
            (self.context_len, self.context_dim), jnp.float32,
        )

    def __call__(self, sample, timestep, condition, cond_mask=None, orig_res=None,
                 unconditional: bool = False, cond_scale: float = 1.0,
                 prompt_emb: Optional[jnp.ndarray] = None):
        B = sample.shape[0]
        if cond_mask is not None:
            condition = jnp.where(cond_mask[..., None], 0.0, condition)
        cond = jax.image.resize(
            condition,
            (B, self.sample_size, self.sample_size, condition.shape[-1]),
            method="nearest",
        )
        if prompt_emb is None or unconditional:
            context = jnp.broadcast_to(
                self.empty_str_encoding[None].astype(self.dtype),
                (B, self.context_len, self.context_dim),
            )
        else:
            context = prompt_emb
        down_res, mid_res = self.controlnet(sample, timestep, context, cond)
        if unconditional:
            # reference zeroes the ControlNet contribution for the CFG
            # unconditional pass (controlnet.py:200-203)
            down_res = [jnp.zeros_like(r) for r in down_res]
            mid_res = jnp.zeros_like(mid_res)
        elif cond_scale != 1.0:
            down_res = [r * cond_scale for r in down_res]
            mid_res = mid_res * cond_scale
        return self.unet(sample, timestep, context,
                         down_residuals=down_res, mid_residual=mid_res)


# ------------------------------------------------------------------ KL VAE


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class _VAEEncoder(nn.Module):
    base_channels: int
    ch_mult: Tuple[int, ...]
    latent_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bc = self.base_channels
        h = nn.Conv(bc, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype))
        for level, mult in enumerate(self.ch_mult):
            h = VAEResBlock(bc * mult, dtype=self.dtype,
                            name=f"enc_{level}_res")(h)
            if level != len(self.ch_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f"enc_{level}_down")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="enc_norm")(h)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="enc_out")(nn.silu(h))


class _VAEDecoder(nn.Module):
    base_channels: int
    ch_mult: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        bc = self.base_channels
        h = nn.Conv(bc * self.ch_mult[-1], (3, 3), padding=1, dtype=self.dtype,
                    name="dec_in")(z.astype(self.dtype))
        for level, mult in reversed(list(enumerate(self.ch_mult))):
            h = VAEResBlock(bc * mult, dtype=self.dtype,
                            name=f"dec_{level}_res")(h)
            if level:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                            name=f"dec_{level}_up")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="dec_norm")(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                       name="dec_out")(nn.silu(h))


class AutoencoderKL(nn.Module):
    """SD-style KL VAE (frozen latent space for the ControlNet target path;
    reference uses diffusers AutoencoderKL via StableDiffusionPipeline,
    vqvae.py:846-848). 2^(len(ch_mult)-1)x spatial downscale, diagonal-gaussian
    latents, scaling_factor applied like the SD convention (vqvae.py:927-954)."""

    base_channels: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = _VAEEncoder(self.base_channels, self.ch_mult,
                                   self.latent_channels, self.dtype, name="encoder")
        self.decoder = _VAEDecoder(self.base_channels, self.ch_mult, self.dtype,
                                   name="decoder")

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))

    def encode(self, x, rng=None):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        else:
            z = mean
        return z * self.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.scaling_factor)


# ------------------------------------------------------------------ helpers


def controlnet_params_from_unet(params: dict) -> dict:
    """Initialize the ControlNet branch as a copy of the base UNet's encoder
    path + time embedding (diffusers ControlNetModel.from_unet, used at
    reference controlnet.py:126-128). Returns an updated params dict."""
    import copy as _copy

    out = _copy.deepcopy(params)
    node = out
    # accept either the decoder subtree or a full VQControlNet params tree
    if "params" in node:
        node = node["params"]
    if "decoder" in node:
        node = node["decoder"]
    unet, cn = node["unet"], node["controlnet"]
    for key in ("time_embed", "encoder"):
        if key in unet and key in cn:
            cn[key] = _copy.deepcopy(unet[key])
    return out


def vqcontrolnet_trainable_mask(params) -> dict:
    """{0., 1.} pytree: ONLY the ControlNet branch trains; the base UNet, the
    VAE, the VQ encoder/quantizer and the prompt encoding stay frozen
    (reference freeze_params controlnet.py:223-228 + _freeze_vae vqvae.py:1045)."""

    def walk(tree, trainable):
        if not isinstance(tree, dict):
            return jnp.full((), 1.0 if trainable else 0.0, jnp.float32)
        out = {}
        for k, v in tree.items():
            t = trainable or k == "controlnet"
            out[k] = walk(v, t)
        return out

    return walk(params, False)


class Token2VAE(nn.Module):
    """Adapter mapping quantized token latents to SD-VAE latent stats or
    samples (reference fourm/vq/models/lm_models.py:30-160): conv_in -> mid
    resblocks+attention -> upsampling decoder blocks -> 8ch (mean, std) or 4ch
    sample. Used standalone or as the ControlNet conditioning adapter
    (ControlNetAdapterEmbedding, controlnet.py:29-61)."""

    in_channels: int = 32
    output_type: str = "stats"  # "stats" (8ch mean+std) | "sample" (4ch)
    block_out_channels: Tuple[int, ...] = (256, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, quant):
        out_ch = self.latent_channels if self.output_type == "sample" else 2 * self.latent_channels
        ch = list(reversed(self.block_out_channels))
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            quant.astype(self.dtype))
        # mid: resblock + self-attention + resblock (diffusers UNetMidBlock2D)
        h = VAEResBlock(ch[0], dtype=self.dtype, name="mid_res_0")(h)
        h = SpatialSelfAttention(num_heads=1, dtype=self.dtype, name="mid_attn")(h)
        h = VAEResBlock(ch[0], dtype=self.dtype, name="mid_res_1")(h)
        # up blocks
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block + 1):
                h = VAEResBlock(c, dtype=self.dtype, name=f"up_{i}_res_{j}")(h)
            if i != len(ch) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="conv_norm_out")(h)
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(nn.silu(h))

    def sample(self, x, rng=None):
        """stats (mean, std) -> sampled latent (reference :128-133)."""
        if x.shape[-1] == self.latent_channels:
            return x
        mean, std = jnp.split(x, 2, axis=-1)
        noise = jax.random.normal(rng, std.shape, std.dtype) if rng is not None else 0.0
        return mean + std * noise
