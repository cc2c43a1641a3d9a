"""VQ tokenizer models: VQ (encoder+quantizer), VQVAE (+ViT/MLP decoder),
DiVAE (+UViT diffusion decoder).

Re-implements reference fourm/vq/vqvae.py:39-763 as flax modules, channel-last.
The public API mirrors the reference: encode / tokenize / tokens_to_embedding /
decode_tokens / autoencode / forward. Codebook EMA state lives in the "codebook"
variable collection (pass mutable=["codebook"] + an "rng" stream when training).

Diffusion decoding (`divae_decode_tokens`) is a free function running ONE jitted
lax.scan over timesteps (reference PipelineCond host-loops each step).
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.modality_info import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
from .mlp_models import build_mlp
from .quantizer import VectorQuantize
from .scheduling import DiffusionScheduler, diffusion_sample
from .uvit import UVIT_PRESETS, UViT
from .vit_models import VIT_SIZES, ViTDecoder, ViTEncoder

Dtype = jnp.dtype


class VQ(nn.Module):
    """Encoder + quantizer (reference vqvae.py:39-393). Inputs are NHWC images
    (B, H, W, C), or (B, H, W) int class maps for semantic segmentation."""

    image_size: int = 224
    image_size_enc: Optional[int] = None
    n_channels: int = 3
    n_labels: Optional[int] = None
    enc_type: str = "vit_b_enc"
    patch_proj: bool = True
    post_mlp: bool = False
    patch_size: int = 16
    codebook_size: int = 16384
    num_codebooks: int = 1
    latent_dim: int = 32
    norm_codes: bool = True
    norm_latents: bool = False
    ema_decay: float = 0.99
    threshold_ema_dead_code: float = 0.25
    code_replacement_policy: str = "batch_random"
    commitment_weight: float = 1.0
    kmeans_init: bool = False
    undo_std: bool = False
    freeze_enc: bool = False
    nearest_impl: str = "xla"  # "pallas" = fused codebook kernel at inference
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def setup(self):
        dtype = self.compute_dtype
        if self.n_labels is not None:
            self.cls_emb = nn.Embed(self.n_labels, self.n_channels, dtype=dtype, name="cls_emb")
        image_size_enc = self.image_size_enc or self.image_size
        if "vit" in self.enc_type:
            size = VIT_SIZES[self.enc_type.replace("_enc", "")]
            self.encoder = ViTEncoder(
                in_channels=self.n_channels, patch_size=self.patch_size,
                resolution=image_size_enc, patch_proj=self.patch_proj,
                post_mlp=self.post_mlp, dtype=dtype, name="encoder", **size,
            )
            self.enc_dim = size["dim_tokens"]
        elif "MLP" in self.enc_type:
            self.encoder, self.enc_dim = build_mlp(self.enc_type, dim_out=None, dtype=dtype)
        else:
            raise NotImplementedError(f"{self.enc_type} not implemented")
        # 1x1 conv == Dense on channel-last grids (reference quant_proj, vqvae.py:163)
        self.quant_proj = nn.Dense(self.latent_dim, dtype=dtype, name="quant_proj")
        self.quantize = VectorQuantize(
            dim=self.latent_dim, codebook_size=self.codebook_size,
            codebook_dim=self.latent_dim, heads=self.num_codebooks,
            use_cosine_sim=self.norm_codes, decay=self.ema_decay,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
            code_replacement_policy=self.code_replacement_policy,
            commitment_weight=self.commitment_weight, norm_latents=self.norm_latents,
            kmeans_init=self.kmeans_init, nearest_impl=self.nearest_impl, name="quantize",
        )

    # ------------------------------------------------------------- interface

    def prepare_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """Optionally undo ImageNet standardization to [-1, 1] and embed class maps
        (reference vqvae.py:269-285)."""
        if self.undo_std:
            mean = jnp.asarray(IMAGENET_DEFAULT_MEAN)
            std = jnp.asarray(IMAGENET_DEFAULT_STD)
            x = 2.0 * (x * std + mean) - 1.0
        if self.n_labels is not None:
            x = self.cls_emb(x.astype(jnp.int32))
        return x.astype(self.compute_dtype)

    def encode(self, x: jnp.ndarray, train: bool = False):
        """-> (quant (B, Hq, Wq, latent_dim), code_loss, tokens (B, Hq, Wq))."""
        x = self.prepare_input(x)
        h = self.encoder(x)
        if self.freeze_enc:
            h = jax.lax.stop_gradient(h)
        h = self.quant_proj(h)
        B, Hq, Wq, D = h.shape
        quant, tokens, code_loss = self.quantize(h.reshape(B, Hq * Wq, D), train=train)
        quant = quant.reshape(B, Hq, Wq, -1)
        tokens = tokens.reshape((B, Hq, Wq) if self.num_codebooks == 1 else (B, Hq, Wq, self.num_codebooks))
        return quant, code_loss, tokens

    def tokenize(self, x: jnp.ndarray) -> jnp.ndarray:
        _, _, tokens = self.encode(x)
        return tokens

    def tokens_to_embedding(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Codebook lookup: (B, Hq, Wq) -> (B, Hq, Wq, latent_dim)
        (reference vqvae.py:355-364)."""
        return self.quantize.indices_to_embedding(tokens)

    def init_codebook_kmeans(self, x: jnp.ndarray):
        x = self.prepare_input(x)
        h = self.quant_proj(self.encoder(x))
        self.quantize.init_codebook_kmeans(h)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        quant, code_loss, _ = self.encode(x, train=train)
        return quant, code_loss


class VQVAE(VQ):
    """VQ-VAE: encoder + quantizer + feed-forward decoder (reference vqvae.py:396-495)."""

    dec_type: str = "vit_b_dec"
    out_conv: bool = False
    image_size_dec: Optional[int] = None
    patch_size_dec: Optional[int] = None

    def setup(self):
        super().setup()
        dtype = self.compute_dtype
        out_channels = self.n_channels if self.n_labels is None else self.n_labels
        image_size_dec = self.image_size_dec or self.image_size
        patch_size = self.patch_size_dec or self.patch_size
        if "vit" in self.dec_type:
            size = VIT_SIZES[self.dec_type.replace("_dec", "")]
            self.decoder = ViTDecoder(
                out_channels=out_channels, patch_size=patch_size,
                resolution=image_size_dec, out_conv=self.out_conv,
                post_mlp=self.post_mlp, patch_proj=self.patch_proj,
                dtype=dtype, name="decoder", **size,
            )
            self.dec_dim = size["dim_tokens"]
        elif "MLP" in self.dec_type:
            self.decoder, self.dec_dim = build_mlp(self.dec_type, dim_out=out_channels, dtype=dtype)
        else:
            raise NotImplementedError(f"{self.dec_type} not implemented")
        self.post_quant_proj = nn.Dense(self.dec_dim, dtype=dtype, name="post_quant_proj")

    def decode_quant(self, quant: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_proj(quant))

    def decode_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.decode_quant(self.tokens_to_embedding(tokens))

    def autoencode(self, x: jnp.ndarray) -> jnp.ndarray:
        quant, _, _ = self.encode(x)
        return self.decode_quant(quant)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        quant, code_loss, _ = self.encode(x, train=train)
        dec = self.decode_quant(quant)
        return dec, code_loss


class DiVAE(VQ):
    """Diffusion VQ-VAE: encoder + quantizer + UViT diffusion decoder
    (reference vqvae.py:498-763, inspired by arXiv:2206.00386)."""

    dec_type: str = "uvit_b_p4_f16"
    num_train_timesteps: int = 1000
    cls_free_guidance_dropout: float = 0.0
    masked_cfg: bool = False
    masked_cfg_low: int = 0
    masked_cfg_high: Optional[int] = None
    scheduler: str = "ddpm"
    beta_schedule: str = "squaredcos_cap_v2"
    prediction_type: str = "v_prediction"
    clip_sample: bool = False
    thresholding: bool = True
    conditioning: str = "concat"
    zero_terminal_snr: bool = True
    image_size_dec: Optional[int] = None

    def setup(self):
        super().setup()
        image_size_dec = self.image_size_dec or self.image_size
        if "uvit_" in self.dec_type:
            self.decoder = UViT(
                sample_size=image_size_dec, in_channels=self.n_channels,
                out_channels=self.n_channels, cond_dim=self.latent_dim,
                cond_type=self.conditioning, dtype=self.compute_dtype, name="decoder",
                **UVIT_PRESETS[self.dec_type],
            )
        elif "unet_" in self.dec_type:
            from .unet import unet_patched

            self.decoder = unet_patched(
                in_channels=self.n_channels, out_channels=self.n_channels,
                cond_dim=self.latent_dim, dtype=self.compute_dtype, name="decoder",
            )
        else:
            raise NotImplementedError(f"dec_type {self.dec_type} not implemented")

    def noise_scheduler(self) -> DiffusionScheduler:
        return DiffusionScheduler(
            kind=self.scheduler, num_train_timesteps=self.num_train_timesteps,
            beta_schedule=self.beta_schedule, prediction_type=self.prediction_type,
            clip_sample=self.clip_sample, thresholding=self.thresholding,
            zero_terminal_snr=self.zero_terminal_snr,
        )

    def sample_cond_mask(self, rng: jax.Array, B: int, Hq: int, Wq: int) -> jnp.ndarray:
        """Training-time CFG condition dropout (reference vqvae.py:618-640):
        with prob `cls_free_guidance_dropout` a sample's condition is dropped;
        with masked_cfg, a random token subset is dropped instead."""
        rng_b, rng_n, rng_k = jax.random.split(rng, 3)
        drop = jax.random.bernoulli(rng_b, self.cls_free_guidance_dropout, (B,))
        cond_mask = jnp.broadcast_to(drop[:, None, None], (B, Hq, Wq))
        if self.masked_cfg:
            n = Hq * Wq
            high = self.masked_cfg_high if self.masked_cfg_high is not None else n
            k = jax.random.randint(rng_k, (B,), self.masked_cfg_low, high + 1)
            noise = jax.random.uniform(rng_n, (B, n))
            ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
            mask = (ranks >= k[:, None]).reshape(B, Hq, Wq)
            cond_mask = mask & cond_mask
        return cond_mask

    def denoise_step(self, noised, timesteps, quant, cond_mask=None, orig_res=None,
                     unconditional: bool = False):
        """One decoder evaluation (used by the jitted sampling scan)."""
        return self.decoder(noised, timesteps, quant, cond_mask=cond_mask,
                            orig_res=orig_res, unconditional=unconditional)

    def __call__(self, input_clean, input_noised, timesteps, cond_mask=None,
                 orig_res=None, train: bool = False):
        """Training forward (reference vqvae.py:727-763): encode clean input,
        denoise the noised input conditioned on the quantized latents."""
        quant, code_loss, _ = self.encode(input_clean, train=train)
        if cond_mask is None and self.cls_free_guidance_dropout > 0.0 and train:
            B, Hq, Wq, _ = quant.shape
            cond_mask = self.sample_cond_mask(self.make_rng("rng"), B, Hq, Wq)
        dec = self.decoder(input_noised, timesteps, quant, cond_mask=cond_mask, orig_res=orig_res)
        return dec, code_loss


def divae_decode_quant(
    model: DiVAE,
    variables,
    quant: jnp.ndarray,
    rng: jax.Array,
    timesteps: Optional[int] = None,
    image_size: Optional[int] = None,
    guidance_scale: float = 0.0,
    guidance_rescale: float = 0.0,
    scheduler: Optional[DiffusionScheduler] = None,
    scheduler_timesteps_mode: str = "trailing",
    orig_res=None,
) -> jnp.ndarray:
    """Diffusion decoding of quantized latents as ONE lax.scan program
    (reference decode_quant + PipelineCond, vqvae.py:657-694)."""
    sched = scheduler or model.noise_scheduler()
    size = image_size or model.image_size
    B = quant.shape[0]
    shape = (B, size, size, model.n_channels)

    def model_fn(noisy, t, cond):
        return model.apply(variables, noisy, t, cond, orig_res=orig_res, method="denoise_step")

    def model_fn_uncond(noisy, t, cond):
        return model.apply(
            variables, noisy, t, cond, orig_res=orig_res, unconditional=True,
            method="denoise_step",
        )

    return diffusion_sample(
        model_fn, sched, rng, quant, shape, timesteps=timesteps,
        guidance_scale=guidance_scale, guidance_rescale=guidance_rescale,
        scheduler_timesteps_mode=scheduler_timesteps_mode,
        model_fn_uncond=model_fn_uncond,
    )


def divae_decode_tokens(model: DiVAE, variables, tokens: jnp.ndarray, rng: jax.Array, **kw):
    quant = model.apply(variables, tokens, method="tokens_to_embedding")
    return divae_decode_quant(model, variables, quant, rng, **kw)


class VQControlNet(VQ):
    """VQ encoder + ControlNet diffusion decoder over a frozen KL-VAE latent
    space (reference vqvae.py:766-1047). Weights-optional: the SD UNet / VAE
    stand-ins are random-init flax modules of the same architecture family;
    pretrained weights import through the VQ safetensors mapping.

    Training target space is the VAE latent (epsilon prediction by default,
    PNDM scaled-linear schedule — the SD 1.5 configuration the reference
    inherits from StableDiffusionPipeline, vqvae.py:845-846)."""

    image_size_sd: Optional[int] = None
    cls_free_guidance_dropout: float = 0.0
    masked_cfg: bool = False
    masked_cfg_low: int = 0
    masked_cfg_high: Optional[int] = None
    num_train_timesteps: int = 1000
    prediction_type: str = "epsilon"
    beta_schedule: str = "scaled_linear"
    beta_start: float = 0.00085
    beta_end: float = 0.012
    # decoder scale (SD 1.5: model_channels=320, mult (1,2,4,4); tests shrink)
    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    num_heads: int = 8
    context_len: int = 77
    context_dim: int = 768
    vae_base_channels: int = 128
    vae_ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    latent_channels: int = 4

    def setup(self):
        super().setup()
        from .controlnet import AutoencoderKL, ControlNetCond

        image_size_sd = self.image_size_sd or self.image_size
        vae_down = 2 ** (len(self.vae_ch_mult) - 1)
        self.decoder = ControlNetCond(
            in_channels=self.latent_channels, cond_channels=self.latent_dim,
            sample_size=image_size_sd // vae_down,
            model_channels=self.model_channels, num_res_blocks=self.num_res_blocks,
            channel_mult=self.channel_mult, attention_levels=self.attention_levels,
            num_heads=self.num_heads, context_len=self.context_len,
            context_dim=self.context_dim, dtype=self.compute_dtype, name="decoder",
        )
        self.vae = AutoencoderKL(
            base_channels=self.vae_base_channels, ch_mult=self.vae_ch_mult,
            latent_channels=self.latent_channels, dtype=self.compute_dtype,
            name="vae",
        )

    def noise_scheduler(self) -> DiffusionScheduler:
        return DiffusionScheduler(
            kind="ddim", num_train_timesteps=self.num_train_timesteps,
            beta_schedule=self.beta_schedule, beta_start=self.beta_start,
            beta_end=self.beta_end, prediction_type=self.prediction_type,
            clip_sample=False, thresholding=False, zero_terminal_snr=False,
        )

    # conditioning dropout shares DiVAE's sampler (reference sample_mask,
    # vqvae.py:856-887 — same argsort-of-noise construction)
    sample_cond_mask = DiVAE.sample_cond_mask

    def vae_encode(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Image -> frozen VAE latent, scaled (reference vqvae.py:927-938)."""
        return jax.lax.stop_gradient(self.vae.encode(self.prepare_input(x), rng))

    def vae_decode(self, z: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
        x = self.vae.decode(z)
        return jnp.clip(x, -1.0, 1.0) if clip else x

    def denoise_step(self, noised, timesteps, quant, cond_mask=None, orig_res=None,
                     unconditional: bool = False, cond_scale: float = 1.0,
                     prompt_emb=None):
        return self.decoder(noised, timesteps, quant, cond_mask=cond_mask,
                            unconditional=unconditional, cond_scale=cond_scale,
                            prompt_emb=prompt_emb)

    def init_all(self, input_clean, input_noised, timesteps):
        """Init-only forward touching every submodule (decoder + VAE) so one
        variables tree covers training, VAE encode/decode, and sampling."""
        dec, code_loss = self(input_clean, input_noised, timesteps)
        z = self.vae.encode(self.prepare_input(input_clean))
        _ = self.vae.decode(z)
        return dec, code_loss

    def __call__(self, input_clean, input_noised, timesteps, cond_mask=None,
                 prompt_emb=None, orig_res=None, train: bool = False):
        """Training forward (reference vqvae.py:1007-1043): encode clean input
        to quantized tokens, predict the noise of `input_noised` (a noised VAE
        LATENT, shape (B, Hl, Wl, latent_channels))."""
        quant, code_loss, _ = self.encode(input_clean, train=train)
        if cond_mask is None and self.cls_free_guidance_dropout > 0.0 and train:
            B, Hq, Wq, _ = quant.shape
            cond_mask = self.sample_cond_mask(self.make_rng("rng"), B, Hq, Wq)
        dec = self.decoder(input_noised, timesteps, quant, cond_mask=cond_mask,
                           prompt_emb=prompt_emb)
        return dec, code_loss


def controlnet_decode_quant(
    model: "VQControlNet",
    variables,
    quant: jnp.ndarray,
    rng: jax.Array,
    timesteps: Optional[int] = None,
    guidance_scale: float = 0.0,
    cond_scale: float = 1.0,
    scheduler_timesteps_mode: str = "leading",
    vae_decode: bool = True,
    prompt_emb=None,
) -> jnp.ndarray:
    """ControlNet diffusion decoding in VAE-latent space, one lax.scan program
    (reference decode_quant + PipelineCond, vqvae.py:884-921)."""
    sched = model.noise_scheduler()
    vae_down = 2 ** (len(model.vae_ch_mult) - 1)
    size = (model.image_size_sd or model.image_size) // vae_down
    B = quant.shape[0]
    shape = (B, size, size, model.latent_channels)

    def model_fn(noisy, t, cond):
        return model.apply(variables, noisy, t, cond, cond_scale=cond_scale,
                           prompt_emb=prompt_emb, method="denoise_step")

    def model_fn_uncond(noisy, t, cond):
        return model.apply(variables, noisy, t, cond, unconditional=True,
                           method="denoise_step")

    z = diffusion_sample(
        model_fn, sched, rng, quant, shape, timesteps=timesteps,
        guidance_scale=guidance_scale,
        scheduler_timesteps_mode=scheduler_timesteps_mode,
        model_fn_uncond=model_fn_uncond,
    )
    if vae_decode:
        return model.apply(variables, z, method="vae_decode")
    return z


def controlnet_decode_tokens(model: "VQControlNet", variables, tokens, rng, **kw):
    quant = model.apply(variables, tokens, method="tokens_to_embedding")
    return controlnet_decode_quant(model, variables, quant, rng, **kw)
