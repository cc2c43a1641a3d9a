"""Per-modality encoder/decoder embedding modules.

Functional equivalents of the reference adapters (fourm/models/encoder_embeddings.py,
fourm/models/decoder_embeddings.py), as flax modules over fixed-shape modality dicts.

Differences from the reference, by design:
  * modality embeddings (`mod_emb`) are owned by the parent FourM model so they can
    be shared between encoder and decoder paths (reference fm.py:176-180 shares them
    by aliasing module attributes); embedding modules here return (x, emb) with emb
    NOT including mod_emb — the parent adds it.
  * raw images are NHWC (TPU-native layout). The patch flattening order (ph, pw, c)
    matches the reference's rearrange (encoder_embeddings.py:301), so imported
    projection weights are identical.
  * sin-cos positional tables are recomputed on the fly (buffers, not weights).
  * the transformer width `dim` is a static module field (flax modules are built
    once from config; the reference's late `init(dim_tokens)` pattern is torch-ism).

Boolean masks use True = masked out / padding, like the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.posemb import build_1d_sincos_posemb, build_2d_sincos_posemb
from ..ops.token_select import compact_position_ids

Dtype = jnp.dtype


class SequenceEncoderEmbedding(nn.Module):
    """Embeds discrete token sequences (captions, detection strings, ...).

    Reference: encoder_embeddings.py:22-121. Positional embeddings are indexed by
    *compacted* position ids (cumsum over unmasked tokens) so that left-packed valid
    tokens get consecutive positions.
    """

    vocab_size: int
    max_length: int
    dim: int
    sincos_pos_emb: bool = True
    max_sincos_pos_emb: int = 512
    padding_idx: int = 0
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.sincos_pos_emb and self.max_length > self.max_sincos_pos_emb:
            raise ValueError(f"max_length {self.max_length} > {self.max_sincos_pos_emb}")
        self.token_emb = nn.Embed(
            self.vocab_size, self.dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="token_emb",
        )
        if not self.sincos_pos_emb:
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02), (self.max_length, self.dim), jnp.float32
            )

    def __call__(self, tensor: jnp.ndarray, input_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ids = tensor
        x = self.token_emb(ids)
        x = jnp.where((ids == self.padding_idx)[..., None], 0.0, x)
        if self.sincos_pos_emb:
            pos_table = build_1d_sincos_posemb(self.max_sincos_pos_emb, self.dim)[: self.max_length]
        else:
            pos_table = self.pos_emb
        pos_id = compact_position_ids(input_mask)
        pos = jnp.take(pos_table, jnp.minimum(pos_id, self.max_length - 1), axis=0)
        pos = jnp.where(input_mask[..., None], 0.0, pos).astype(self.dtype)
        return x.astype(self.dtype), pos


class ImageTokenEncoderEmbedding(nn.Module):
    """Embeds tokenized image modalities on a fixed grid.

    Reference: encoder_embeddings.py:123-211. `tensor` is (B, H*W) int tokens.
    """

    vocab_size: int
    grid_h: int
    grid_w: int
    dim: int
    sincos_pos_emb: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.token_emb = nn.Embed(
            self.vocab_size, self.dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="token_emb",
        )
        if not self.sincos_pos_emb:
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02),
                (self.grid_h * self.grid_w, self.dim), jnp.float32,
            )

    def __call__(self, tensor: jnp.ndarray, input_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = tensor.shape[0]
        ids = tensor.reshape(B, -1)
        x = self.token_emb(ids)
        n = self.grid_h * self.grid_w
        pos = (
            build_2d_sincos_posemb(self.grid_h, self.grid_w, self.dim)
            if self.sincos_pos_emb else self.pos_emb
        )
        pos = jnp.broadcast_to(pos[None].astype(self.dtype), (B, n, self.dim))
        return x.astype(self.dtype), pos


class ImageEncoderEmbedding(nn.Module):
    """Patchifies and projects raw images / feature maps (NHWC).

    Reference: encoder_embeddings.py:214-309. The projection has no bias so the
    modality embedding comes fully from mod_emb.
    """

    num_channels: int
    patch_size: int
    grid_h: int
    grid_w: int
    dim: int
    sincos_pos_emb: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.proj = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj")
        if not self.sincos_pos_emb:
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02),
                (self.grid_h * self.grid_w, self.dim), jnp.float32,
            )

    def __call__(self, tensor: jnp.ndarray, input_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = tensor  # (B, H, W, C)
        B, H, W, C = x.shape
        ph = pw = self.patch_size
        nh, nw = H // ph, W // pw
        # (B, nh, ph, nw, pw, C) -> (B, nh*nw, ph*pw*C); flatten order (ph, pw, c)
        # matches reference rearrange 'b d (nh ph) (nw pw) -> b (nh nw) (ph pw d)'.
        x = x.reshape(B, nh, ph, nw, pw, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, nh * nw, ph * pw * C)
        x = self.proj(x.astype(self.dtype))
        n = self.grid_h * self.grid_w
        pos = (
            build_2d_sincos_posemb(self.grid_h, self.grid_w, self.dim)
            if self.sincos_pos_emb else self.pos_emb
        )
        pos = jnp.broadcast_to(pos[None].astype(self.dtype), (B, n, self.dim))
        return x.astype(self.dtype), pos


class SequenceEmbEncoderEmbedding(nn.Module):
    """Projects pre-computed embedding sequences (e.g. T5-XXL captions).

    Reference: encoder_embeddings.py:312-421.
    """

    max_length: int
    dim: int
    orig_emb_dim: int = 4096
    sincos_pos_emb: bool = True
    max_sincos_pos_emb: int = 512
    bottleneck_dim: int = 64
    use_bottleneck: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.use_bottleneck:
            self.emb_proj = [
                nn.Dense(self.bottleneck_dim, dtype=self.dtype, name="emb_proj_0"),
                nn.Dense(self.dim, dtype=self.dtype, name="emb_proj_1"),
            ]
        else:
            self.emb_proj = nn.Dense(self.dim, dtype=self.dtype, name="emb_proj")
        if not self.sincos_pos_emb:
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02), (self.max_length, self.dim), jnp.float32
            )

    def __call__(self, tensor: jnp.ndarray, input_mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = tensor.astype(self.dtype)
        if self.use_bottleneck:
            for layer in self.emb_proj:
                x = layer(x)
        else:
            x = self.emb_proj(x)
        if self.sincos_pos_emb:
            pos_table = build_1d_sincos_posemb(self.max_sincos_pos_emb, self.dim)[: self.max_length]
        else:
            pos_table = self.pos_emb
        pos_id = compact_position_ids(input_mask)
        pos = jnp.take(pos_table, jnp.minimum(pos_id, self.max_length - 1), axis=0)
        pos = jnp.where(input_mask[..., None], 0.0, pos).astype(self.dtype)
        return x.astype(self.dtype), pos


class SequenceDecoderEmbedding(nn.Module):
    """Decoder-side sequence embedding with (optionally tied) output projection.

    Reference: decoder_embeddings.py:24-160. `embed` returns (x, emb, ids);
    `logits` projects decoder outputs to the vocabulary (weight-tied by default).
    """

    vocab_size: int
    max_length: int
    dim: int
    sincos_pos_emb: bool = True
    max_sincos_pos_emb: int = 512
    padding_idx: int = 0
    share_embedding: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.token_emb = nn.Embed(
            self.vocab_size, self.dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="token_emb",
        )
        if not self.share_embedding:
            self.to_logits = nn.Dense(
                self.vocab_size, use_bias=False, dtype=self.dtype, name="to_logits"
            )
        if not self.sincos_pos_emb:
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02), (self.max_length, self.dim), jnp.float32
            )

    def embed(self, tensor: jnp.ndarray, target_mask: jnp.ndarray):
        ids = tensor
        x = self.token_emb(ids)
        x = jnp.where((ids == self.padding_idx)[..., None], 0.0, x)
        if self.sincos_pos_emb:
            pos_table = build_1d_sincos_posemb(self.max_sincos_pos_emb, self.dim)[: self.max_length]
        else:
            pos_table = self.pos_emb
        # Positions beyond max_length are clamped to 0 (decoder_embeddings.py:129-131).
        pos_id = compact_position_ids(target_mask, max_length=self.max_length)
        pos = jnp.take(pos_table, pos_id, axis=0)
        pos = jnp.where(target_mask[..., None], 0.0, pos).astype(self.dtype)
        return x.astype(self.dtype), pos, ids

    def logits(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.share_embedding:
            return self.token_emb.attend(x)
        return self.to_logits(x)

    def token_embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Raw token embedding lookup (zeroing padding), for AR decoding."""
        x = self.token_emb(ids)
        return jnp.where((ids == self.padding_idx)[..., None], 0.0, x).astype(self.dtype)

    def pos_table(self, max_len: int) -> jnp.ndarray:
        """Positional table slice (max_len, D) for compacted AR positions."""
        if self.sincos_pos_emb:
            table = build_1d_sincos_posemb(self.max_sincos_pos_emb, self.dim)[: self.max_length]
        else:
            table = self.pos_emb
        n = min(max_len, self.max_length)
        out = table[:n]
        if max_len > n:  # positions beyond max_length clamp to posemb 0 (ref :129-131)
            out = jnp.concatenate([out, jnp.broadcast_to(table[:1], (max_len - n, table.shape[1]))])
        return out

    def __call__(self, tensor, target_mask):
        x, pos, ids = self.embed(tensor, target_mask)
        _ = self.logits(x)
        return x, pos, ids


class ImageTokenDecoderEmbedding(nn.Module):
    """Decoder-side image-token embedding with (optionally tied) output projection.

    Reference: decoder_embeddings.py:163-284.
    """

    vocab_size: int
    grid_h: int
    grid_w: int
    dim: int
    sincos_pos_emb: bool = True
    share_embedding: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.token_emb = nn.Embed(
            self.vocab_size, self.dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02), name="token_emb",
        )
        if not self.share_embedding:
            self.to_logits = nn.Dense(
                self.vocab_size, use_bias=False, dtype=self.dtype, name="to_logits"
            )
        if not self.sincos_pos_emb:
            self.pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02),
                (self.grid_h * self.grid_w, self.dim), jnp.float32,
            )

    def embed(self, tensor: jnp.ndarray, target_mask: jnp.ndarray):
        B = tensor.shape[0]
        ids = tensor.reshape(B, -1)
        x = self.token_emb(ids)
        n = self.grid_h * self.grid_w
        pos = (
            build_2d_sincos_posemb(self.grid_h, self.grid_w, self.dim)
            if self.sincos_pos_emb else self.pos_emb
        )
        pos = jnp.broadcast_to(pos[None].astype(self.dtype), (B, n, self.dim))
        return x.astype(self.dtype), pos, ids

    def logits(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.share_embedding:
            return self.token_emb.attend(x)
        return self.to_logits(x)

    def __call__(self, tensor, target_mask):
        x, pos, ids = self.embed(tensor, target_mask)
        _ = self.logits(x)
        return x, pos, ids
