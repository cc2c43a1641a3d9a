"""FourM: the 4M multimodal masked-modeling encoder-decoder, TPU-native.

Re-implements the semantics of the reference model (fourm/models/fm.py:54-780) as a
fixed-shape flax module:

  * per-modality embeddings produce (x, emb) streams which are concatenated in a
    deterministic registry order (reference: fm.py:245-334; the reference shuffles
    decoder modality order per forward — that only matters in `decoder_causal_mask`
    mode, which defaults off; we keep a deterministic order and document it);
  * the Dirichlet-budgeted "masked token-subset selection" (fm.py:338-475) is an
    exact integer-key top-k (ops/token_select.py) instead of a float argsort;
  * per-modality cross-entropy uses fixed-capacity bucketed gathers instead of
    ragged boolean indexing (fm.py:547-637): for each target modality we gather the
    first C_mod positions belonging to it (C_mod = min(stream length, M) — exact,
    never drops tokens) and compute logits only for that bucket;
  * decoder attention-mask expansion (fm.py:440-475) is pure tensor math feeding an
    additive-bias attention kernel.

Masks: boolean, True = masked out / padding, matching the reference convention.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..data.modality_info import MODALITY_INFO, ModalitySpec
from ..ops.token_select import (
    adapt_decoder_attention_mask,
    gather_tokens,
    select_tokens,
)
from ..ops.transformer import Block, DecoderBlock, LayerNorm
from .embeddings import (
    ImageEncoderEmbedding,
    ImageTokenDecoderEmbedding,
    ImageTokenEncoderEmbedding,
    SequenceDecoderEmbedding,
    SequenceEmbEncoderEmbedding,
    SequenceEncoderEmbedding,
)

SEQ_TYPES = ("seq", "seq_emb", "seq_token")


@dataclass(frozen=True)
class FourMConfig:
    """Static configuration of a FourM model (reference fm.py:81-174 + registry)."""

    encoder_modalities: Tuple[str, ...]
    decoder_modalities: Tuple[str, ...]
    dim: int = 768
    encoder_depth: int = 12
    decoder_depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    norm_bias: bool = True
    act: str = "gelu"
    gated_mlp: bool = False
    qk_norm: bool = False
    decoder_causal_mask: bool = False
    decoder_sep_mask: bool = True
    num_register_tokens: int = 0
    share_modality_embeddings: bool = True
    # released HF checkpoints untie decoder embeddings (reference fm.py:813-815)
    decoder_share_embedding: bool = True
    drop_path_rate_encoder: float = 0.0
    drop_path_rate_decoder: float = 0.0
    shared_drop_path: bool = False
    remat: bool = False  # activation checkpointing per block (jax.checkpoint)
    dtype: str = "float32"  # compute dtype; params are always fp32

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def spec(self, mod: str) -> ModalitySpec:
        return MODALITY_INFO[mod]


def _act(name: str):
    # "gelu" is the exact erf form to match torch nn.GELU (reference fm_utils
    # act_layer default); flax nn.gelu defaults to the tanh approximation.
    return {
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "silu": nn.silu,
        "relu": nn.relu,
    }[name]


def _grid_for(spec: ModalitySpec) -> Tuple[int, int]:
    g = spec.grid_size
    if g is not None:
        return g
    # global-token modalities (tok_dinov2_global etc.): square grid from max_tokens
    n = int(round(spec.resolved_max_tokens() ** 0.5))
    return (n, n)


def _build_encoder_embedding(spec: ModalitySpec, dim: int, dtype) -> Optional[nn.Module]:
    if spec.encoder_embedding is None:
        return None
    if spec.encoder_embedding == "image":
        gh, gw = _grid_for(spec)
        return ImageEncoderEmbedding(
            num_channels=spec.num_channels, patch_size=spec.patch_size,
            grid_h=gh, grid_w=gw, dim=dim, sincos_pos_emb=spec.sincos_pos_emb, dtype=dtype,
        )
    if spec.encoder_embedding == "image_token":
        gh, gw = _grid_for(spec)
        return ImageTokenEncoderEmbedding(
            vocab_size=spec.vocab_size, grid_h=gh, grid_w=gw, dim=dim,
            sincos_pos_emb=spec.sincos_pos_emb, dtype=dtype,
        )
    if spec.encoder_embedding == "sequence":
        return SequenceEncoderEmbedding(
            vocab_size=spec.vocab_size, max_length=spec.max_length, dim=dim,
            sincos_pos_emb=spec.sincos_pos_emb, dtype=dtype,
        )
    if spec.encoder_embedding == "sequence_emb":
        return SequenceEmbEncoderEmbedding(
            max_length=spec.max_length, dim=dim, orig_emb_dim=spec.orig_emb_dim, dtype=dtype,
        )
    raise ValueError(f"unknown encoder embedding kind {spec.encoder_embedding}")


def _build_decoder_embedding(spec: ModalitySpec, dim: int, dtype, share_embedding: bool = True) -> Optional[nn.Module]:
    if spec.decoder_embedding is None:
        return None
    if spec.decoder_embedding == "image_token":
        gh, gw = _grid_for(spec)
        return ImageTokenDecoderEmbedding(
            vocab_size=spec.vocab_size, grid_h=gh, grid_w=gw, dim=dim,
            sincos_pos_emb=spec.sincos_pos_emb, share_embedding=share_embedding, dtype=dtype,
        )
    if spec.decoder_embedding == "sequence":
        return SequenceDecoderEmbedding(
            vocab_size=spec.vocab_size, max_length=spec.max_length, dim=dim,
            sincos_pos_emb=spec.sincos_pos_emb, share_embedding=share_embedding, dtype=dtype,
        )
    raise ValueError(f"unknown decoder embedding kind {spec.decoder_embedding}")


class FourM(nn.Module):
    """4M encoder-decoder over modality dicts.

    mod_dict format (per modality): {
      'tensor': int tokens (B, L) / image-token grid flattened (B, N) / raw NHWC image,
      'input_mask': (B, L) bool, True = NOT an encoder input,
      'target_mask': (B, L) bool, True = NOT a decoder target,
      'decoder_attention_mask': (B, L) int32 compressed decoder attn mask,
    }
    """

    config: FourMConfig

    def setup(self):
        cfg = self.config
        dtype = cfg.compute_dtype

        enc_embs, dec_embs = {}, {}
        for mod in cfg.encoder_modalities:
            m = _build_encoder_embedding(cfg.spec(mod), cfg.dim, dtype)
            if m is not None:
                enc_embs[mod] = m
        for mod in cfg.decoder_modalities:
            m = _build_decoder_embedding(cfg.spec(mod), cfg.dim, dtype, cfg.decoder_share_embedding)
            if m is not None:
                dec_embs[mod] = m
        self.encoder_embeddings = enc_embs
        self.decoder_embeddings = dec_embs

        # Modality embeddings, shared between encoder and decoder when configured
        # (reference fm.py:176-180).
        mod_emb = {}
        for mod in {*enc_embs, *dec_embs}:
            mod_emb[mod] = self.param(
                f"mod_emb_{mod}", nn.initializers.normal(0.02), (cfg.dim,), jnp.float32
            )
        if not cfg.share_modality_embeddings:
            self.dec_mod_emb = {
                mod: self.param(
                    f"dec_mod_emb_{mod}", nn.initializers.normal(0.02), (cfg.dim,), jnp.float32
                )
                for mod in dec_embs
            }
        else:
            self.dec_mod_emb = mod_emb
        self.mod_emb = mod_emb

        act = _act(cfg.act)
        block_kw = dict(
            dim=cfg.dim,
            num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            proj_bias=cfg.proj_bias, mlp_bias=cfg.mlp_bias, act=act,
            gated_mlp=cfg.gated_mlp, qk_norm=cfg.qk_norm, norm_bias=cfg.norm_bias,
            dtype=dtype,
        )
        total_depth = cfg.encoder_depth + cfg.decoder_depth
        if cfg.shared_drop_path:
            dprs = [cfg.drop_path_rate_encoder * i / max(total_depth - 1, 1) for i in range(total_depth)]
            dpr_enc, dpr_dec = dprs[: cfg.encoder_depth], dprs[cfg.encoder_depth :]
        else:
            dpr_enc = [cfg.drop_path_rate_encoder * i / max(cfg.encoder_depth - 1, 1) for i in range(cfg.encoder_depth)]
            dpr_dec = [cfg.drop_path_rate_decoder * i / max(cfg.decoder_depth - 1, 1) for i in range(cfg.decoder_depth)]

        BlockCls = nn.remat(Block, static_argnums=(3,)) if cfg.remat else Block
        DecBlockCls = nn.remat(DecoderBlock, static_argnums=(5,)) if cfg.remat else DecoderBlock
        self.encoder = [
            BlockCls(**block_kw, drop_path_rate=dpr_enc[i], name=f"encoder_{i}")
            for i in range(cfg.encoder_depth)
        ]
        self.encoder_norm = LayerNorm(use_bias=cfg.norm_bias, dtype=dtype, name="encoder_norm")
        self.decoder_proj_context = nn.Dense(cfg.dim, dtype=dtype, name="decoder_proj_context")
        self.decoder = [
            DecBlockCls(**block_kw, drop_path_rate=dpr_dec[i], name=f"decoder_{i}")
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = LayerNorm(use_bias=cfg.norm_bias, dtype=dtype, name="decoder_norm")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (cfg.dim,), jnp.float32
        )
        if cfg.num_register_tokens > 0:
            self.register_tokens = self.param(
                "register_tokens", nn.initializers.normal(0.02),
                (cfg.num_register_tokens, cfg.dim), jnp.float32,
            )

    # ------------------------------------------------------------------ encoder

    def _cat_encoder(self, mod_dict: Dict[str, Dict[str, jnp.ndarray]]):
        """Embed and concatenate all encoder modalities (reference fm.py:245-278)."""
        xs, embs, masks, modids = [], [], [], []
        dtype = self.config.compute_dtype
        for mod in self.config.encoder_modalities:
            if mod not in mod_dict or mod not in self.encoder_embeddings:
                continue
            d = mod_dict[mod]
            x, pos = self.encoder_embeddings[mod](d["tensor"], d["input_mask"])
            emb = pos + self.mod_emb[mod].astype(dtype)
            xs.append(x)
            embs.append(emb)
            masks.append(d["input_mask"])
            modids.append(
                jnp.full(d["input_mask"].shape, self.config.spec(mod).id, dtype=jnp.int32)
            )
        return (
            jnp.concatenate(xs, axis=1),
            jnp.concatenate(embs, axis=1),
            jnp.concatenate(masks, axis=1),
            jnp.concatenate(modids, axis=1),
        )

    def forward_mask_encoder(
        self, mod_dict, num_encoder_tokens: Optional[int]
    ):
        """Select the encoder token subset (reference fm.py:338-390).

        num_encoder_tokens=None keeps the full concatenated stream (generation path,
        fixed shape — validity handled by the attention mask)."""
        x_all, emb_all, mask_all, modid_all = self._cat_encoder(mod_dict)
        B = x_all.shape[0]
        if num_encoder_tokens is not None:
            idx = select_tokens(mask_all, num_encoder_tokens)
            x = gather_tokens(x_all, idx)
            emb = gather_tokens(emb_all, idx)
            mask = jnp.take_along_axis(mask_all, idx, axis=1)
            modid = jnp.take_along_axis(modid_all, idx, axis=1)
        else:
            x, emb, mask, modid = x_all, emb_all, mask_all, modid_all

        if self.config.num_register_tokens > 0:
            reg = jnp.broadcast_to(
                self.register_tokens[None].astype(x.dtype),
                (B, self.config.num_register_tokens, self.config.dim),
            )
            x = jnp.concatenate([reg, x], axis=1)
            emb = jnp.concatenate([jnp.zeros_like(reg), emb], axis=1)
            mask = jnp.concatenate(
                [jnp.zeros((B, reg.shape[1]), dtype=bool), mask], axis=1
            )
            modid = jnp.concatenate(
                [jnp.full((B, reg.shape[1]), -1, jnp.int32), modid], axis=1
            )

        x = jnp.where(mask[..., None], 0.0, x)
        emb = jnp.where(mask[..., None], 0.0, emb)
        modid = jnp.where(mask, -1, modid)
        return x, emb, mask, modid

    def forward_encoder(self, x, encoder_mask, deterministic: bool = True):
        """Run encoder blocks; encoder_mask (B, N) or (B, 1, N) bool (fm.py:477-495)."""
        if encoder_mask is not None and encoder_mask.ndim == 2:
            encoder_mask = encoder_mask[:, None, :]
        for blk in self.encoder:
            x = blk(x, encoder_mask, deterministic)
        return self.encoder_norm(x)

    def encode(self, mod_dict, num_encoder_tokens: Optional[int] = None, deterministic: bool = True):
        """Embed + select + encode. Returns (enc_out, enc_emb, enc_mask, enc_modid)."""
        x, emb, mask, modid = self.forward_mask_encoder(mod_dict, num_encoder_tokens)
        out = self.forward_encoder(x + emb, mask, deterministic)
        return out, emb, mask, modid

    def decoder_context(self, enc_out, enc_emb):
        """Project encoder output and re-add embeddings (reference fm.py:674)."""
        return self.decoder_proj_context(enc_out) + enc_emb

    # ------------------------------------------------------------------ decoder

    def _cat_decoder(self, mod_dict):
        """Embed and concatenate decoder modalities with AR shift for sequence types
        (reference fm.py:279-334). Returns per-token streams + static segment table."""
        xs, embs, masks, ids, attn, modids = [], [], [], [], [], []
        dtype = self.config.compute_dtype
        mask_token = self.mask_token.astype(dtype)
        for mod in self.config.decoder_modalities:
            if mod not in mod_dict or mod not in self.decoder_embeddings:
                continue
            d = mod_dict[mod]
            spec = self.config.spec(mod)
            x, pos, tok_ids = self.decoder_embeddings[mod].embed(d["tensor"], d["target_mask"])
            emb = pos + self.dec_mod_emb[mod].astype(dtype)
            if spec.type in SEQ_TYPES:
                # next-token prediction: input[:-1] predicts ids[1:]; merged mask
                # drops the last unmasked position (fm.py:308-318).
                xs.append(x[:, :-1])
                embs.append(emb[:, :-1])
                ids.append(tok_ids[:, 1:])
                masks.append(jnp.logical_or(d["target_mask"][:, 1:], d["target_mask"][:, :-1]))
                attn.append(d["decoder_attention_mask"][:, :-1])
                n = x.shape[1] - 1
            else:
                # image modalities: decoder input is the mask token (fm.py:320-327)
                xs.append(jnp.broadcast_to(mask_token, x.shape))
                embs.append(emb)
                ids.append(tok_ids)
                masks.append(d["target_mask"])
                attn.append(d["decoder_attention_mask"])
                n = x.shape[1]
            modids.append(jnp.full((x.shape[0], n), spec.id, dtype=jnp.int32))
        return (
            jnp.concatenate(xs, axis=1),
            jnp.concatenate(embs, axis=1),
            jnp.concatenate(masks, axis=1),
            jnp.concatenate(ids, axis=1),
            jnp.concatenate(attn, axis=1),
            jnp.concatenate(modids, axis=1),
        )

    def forward_mask_decoder(self, mod_dict, num_decoder_tokens: Optional[int]):
        """Select decoder token subset + build the full attention mask (fm.py:392-438)."""
        x_all, emb_all, mask_all, ids_all, attn_all, modid_all = self._cat_decoder(mod_dict)
        if num_decoder_tokens is not None:
            idx = select_tokens(mask_all, num_decoder_tokens)
            x = gather_tokens(x_all, idx)
            emb = gather_tokens(emb_all, idx)
            mask = jnp.take_along_axis(mask_all, idx, axis=1)
            ids = jnp.take_along_axis(ids_all, idx, axis=1)
            attn = jnp.take_along_axis(attn_all, idx, axis=1)
            modid = jnp.take_along_axis(modid_all, idx, axis=1)
        else:
            x, emb, mask, ids, attn, modid = x_all, emb_all, mask_all, ids_all, attn_all, modid_all

        x = jnp.where(mask[..., None], 0.0, x)
        emb = jnp.where(mask[..., None], 0.0, emb)
        ids = jnp.where(mask, 0, ids)
        sa_mask = adapt_decoder_attention_mask(
            attn, modid, causal=self.config.decoder_causal_mask,
            sep_mask=self.config.decoder_sep_mask,
        )
        modid = jnp.where(mask, -1, modid)
        return x, emb, mask, ids, sa_mask, modid

    def forward_decoder(self, y, context, encoder_mask, decoder_attention_mask, deterministic: bool = True):
        """Run decoder blocks (fm.py:497-519)."""
        if encoder_mask is not None and encoder_mask.ndim == 2:
            encoder_mask = encoder_mask[:, None, :]
        for blk in self.decoder:
            y = blk(y, context, decoder_attention_mask, encoder_mask, deterministic)
        return self.decoder_norm(y)

    def mod_logits(self, mod: str, y: jnp.ndarray) -> jnp.ndarray:
        """Logits for one modality over all given decoder outputs."""
        return self.decoder_embeddings[mod].logits(y)

    # ------------------------------------------------ generation forwards

    def forward_generation_img(self, mod_dict, target_mod: str, sa_keys_valid,
                               num_encoder_tokens: Optional[int] = None):
        """Generation forward for an img-type target modality over its FULL token
        grid (fixed shape). Equivalent to reference forward_enc_dec_maskgit/
        roar_batched (generate.py:628-765), which gather only the currently-masked
        positions (dynamic shapes): here every grid position is a decoder query but
        self-attention keys are restricted to `sa_keys_valid` (True = attendable,
        i.e. still-to-decode for MaskGIT, this step's random subset for ROAR) —
        logits at valid positions are bitwise-equivalent to the gathered version.

        num_encoder_tokens: optional static budget compacting the encoder stream
        to the first K selected (valid-first) tokens — the sampler passes a
        host-computed bucket ≥ the number of valid conditioning tokens, cutting
        encoder+cross-attention cost ~6x for mod-21 chains (the full stream is
        3024 tokens while typical conditioning is a few hundred). Selection keeps
        every valid token, so logits are unchanged.

        Returns logits (B, N_grid, V).
        """
        enc_out, enc_emb, enc_mask, _ = self.encode(mod_dict, num_encoder_tokens)
        context = self.decoder_context(enc_out, enc_emb)
        d = mod_dict[target_mod]
        dtype = self.config.compute_dtype
        x, pos, _ids = self.decoder_embeddings[target_mod].embed(d["tensor"], d["target_mask"])
        emb = pos + self.dec_mod_emb[target_mod].astype(dtype)
        y = jnp.broadcast_to(self.mask_token.astype(dtype), x.shape) + emb
        sa_mask = ~sa_keys_valid[:, None, :]  # (B, 1, N) keys; broadcast over queries
        y = self.forward_decoder(y, context, enc_mask, sa_mask)
        return self.mod_logits(target_mod, y)

    def ar_prefill(self, mod_dict, target_mod: str, max_len: int,
                   num_encoder_tokens: Optional[int] = None):
        """Encoder pass + per-layer cross-attention K/V + target position embeddings
        for KV-cached AR decoding. Returns (cross_kvs, enc_mask, y_emb (B, L, D)).
        num_encoder_tokens: see forward_generation_img — compacts the context the
        per-token cross-attention reads EVERY decode step."""
        enc_out, enc_emb, enc_mask, _ = self.encode(mod_dict, num_encoder_tokens)
        context = self.decoder_context(enc_out, enc_emb)
        cross_kvs = self.decoder_cross_kvs(context)
        dtype = self.config.compute_dtype
        B = enc_out.shape[0]
        pos = self.decoder_embeddings[target_mod].pos_table(max_len)  # (L, D)
        y_emb = (pos + self.dec_mod_emb[target_mod]).astype(dtype)
        y_emb = jnp.broadcast_to(y_emb[None], (B, max_len, y_emb.shape[-1]))
        return cross_kvs, enc_mask, y_emb

    # ------------------------------------------------ autoregressive decoding

    def decoder_cross_kvs(self, context):
        """Precompute per-layer cross-attention K/V from the encoder context —
        computed once per AR generation instead of once per token (the reference
        re-projects the context every step, generate.py:888-918)."""
        return [blk.cross_kv(context) for blk in self.decoder]

    def embed_target_token(self, mod: str, ids: jnp.ndarray) -> jnp.ndarray:
        """Token embedding lookup for AR decoding (seq modalities)."""
        return self.decoder_embeddings[mod].token_embed(ids)

    def decode_one_token(self, y_t, caches, cross_kvs, enc_mask, step_idx):
        """One KV-cached decoder step. y_t: (B, 1, D); caches: per-layer (k, v)
        in the (B, H, Dh, L_max) decode layout (dense TPU memory tiles — see
        ops.transformer.decode_attention); returns (normed output, new caches)."""
        new_caches = []
        for blk, (ck, cv), (xk, xv) in zip(self.decoder, caches, cross_kvs):
            y_t, ck, cv = blk.step(y_t, ck, cv, xk, xv, enc_mask, step_idx)
            new_caches.append((ck, cv))
        return self.decoder_norm(y_t), new_caches

    def init_kv_caches(self, batch_size: int, max_len: int):
        """Zeroed per-layer self-attention KV caches, (B, H, Dh, L) layout."""
        cfg = self.config
        head_dim = cfg.dim // cfg.num_heads
        shape = (batch_size, cfg.num_heads, head_dim, max_len)
        zeros = jnp.zeros(shape, cfg.compute_dtype)
        return [(zeros, zeros) for _ in range(cfg.decoder_depth)]

    # ------------------------------------------------------------------ loss

    def _decoder_stream_length(self, mod: str, mod_dict) -> int:
        """Length this modality contributes to the decoder stream, from the actual
        data shapes (seq tensors are (max_tokens+1)*2 long — masking.py layout —
        and lose one position to the AR shift)."""
        spec = self.config.spec(mod)
        t = mod_dict[mod]["tensor"]
        n = int(np.prod(t.shape[1:])) if t.ndim > 2 else t.shape[1]
        return n - 1 if spec.type in SEQ_TYPES else n

    def forward_loss(
        self, y, target_ids, decoder_modid, mods, mod_dict, num_decoder_tokens,
        loss_type: str = "mod",
    ):
        """Per-modality CE via exact fixed-capacity buckets (fm.py:547-637).

        For each target modality: gather the first C positions with its id
        (C = min(stream length, M), which upper-bounds how many tokens the modality
        can occupy — the bucket is exact). CE in fp32.
        """
        M = y.shape[1]
        mod_loss, mod_count = {}, {}
        total_sum = 0.0
        total_cnt = 0.0
        for mod in mods:
            spec = self.config.spec(mod)
            cap = min(self._decoder_stream_length(mod, mod_dict), num_decoder_tokens or M, M)
            bucket = select_tokens(decoder_modid != spec.id, cap)
            y_m = gather_tokens(y, bucket)  # (B, C, D)
            tgt = jnp.take_along_axis(target_ids, bucket, axis=1)
            valid = jnp.take_along_axis(decoder_modid, bucket, axis=1) == spec.id
            logits = self.mod_logits(mod, y_m).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
            cnt = jnp.sum(valid)
            s = jnp.sum(jnp.where(valid, ce, 0.0))
            mod_loss[mod] = s / jnp.maximum(cnt, 1)
            mod_count[mod] = cnt
            # reference token loss weights each modality by logits.numel() =
            # n_valid_tokens * vocab_size (fm.py:628-637), NOT by token count —
            # matched exactly here (verified in tests/test_reference_parity.py)
            vocab = logits.shape[-1]
            total_sum = total_sum + mod_loss[mod] * cnt * vocab
            total_cnt = total_cnt + cnt * vocab
        if loss_type in ("mod", "modality"):
            loss = sum(mod_loss.values()) / max(len(mod_loss), 1)
        elif loss_type == "token":
            loss = total_sum / jnp.maximum(total_cnt, 1)
        else:
            raise ValueError(f"invalid loss type {loss_type}")
        return loss, mod_loss, mod_count

    # ------------------------------------------------------------------ forward

    def __call__(
        self,
        mod_dict: Dict[str, Dict[str, jnp.ndarray]],
        num_encoder_tokens: int,
        num_decoder_tokens: int,
        loss_type: str = "mod",
        return_logits: bool = False,
        deterministic: bool = True,
    ):
        """Full training forward (reference fm.py:640-692)."""
        enc_out, enc_emb, enc_mask, _ = self.encode(
            mod_dict, num_encoder_tokens, deterministic
        )
        dec_x, dec_emb, dec_mask, target_ids, sa_mask, dec_modid = self.forward_mask_decoder(
            mod_dict, num_decoder_tokens
        )
        context = self.decoder_context(enc_out, enc_emb)
        y = self.forward_decoder(dec_x + dec_emb, context, enc_mask, sa_mask, deterministic)

        target_mods = [
            m for m in self.config.decoder_modalities
            if m in mod_dict and m in self.decoder_embeddings
        ]
        if return_logits:
            return {mod: self.mod_logits(mod, y) for mod in target_mods}
        loss, mod_loss, mod_count = self.forward_loss(
            y, target_ids, dec_modid, target_mods, mod_dict, num_decoder_tokens, loss_type
        )
        return loss, (mod_loss, mod_count)


# ---------------------------------------------------------------------- registry

MODEL_SIZES = {
    "tiny": dict(dim=384, encoder_depth=6, decoder_depth=6, num_heads=6),
    "small": dict(dim=512, encoder_depth=8, decoder_depth=8, num_heads=8),
    "base": dict(dim=768, encoder_depth=12, decoder_depth=12, num_heads=12),
    "large": dict(dim=1024, encoder_depth=24, decoder_depth=24, num_heads=16),
    "xlarge": dict(dim=2048, encoder_depth=24, decoder_depth=24, num_heads=32),
}

_FLAVORS = {
    "gelu": dict(act="gelu"),
    "swiglu_nobias": dict(
        act="silu", gated_mlp=True, qkv_bias=False, proj_bias=False,
        mlp_bias=False, norm_bias=False,
    ),
    "swiglu_qknorm_nobias": dict(
        act="silu", gated_mlp=True, qkv_bias=False, proj_bias=False,
        mlp_bias=False, norm_bias=False, qk_norm=True,
    ),
}

# 13 registered constructors matching reference fm.py:33-50 / :839-1130.
MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {}
for _size in MODEL_SIZES:
    for _flavor, _fkw in _FLAVORS.items():
        if _flavor == "swiglu_qknorm_nobias" and _size in ("tiny", "small"):
            continue
        _d = MODEL_SIZES[_size]["encoder_depth"]
        _name = f"fm_{_size}_{_d}e_{_d}d_{_flavor}"
        MODEL_REGISTRY[_name] = {**MODEL_SIZES[_size], **_fkw}


def create_fourm_config(
    model_name: str,
    encoder_modalities: Tuple[str, ...],
    decoder_modalities: Tuple[str, ...],
    **overrides,
) -> FourMConfig:
    """Build a FourMConfig from a registered size variant (reference registry
    fm.py:839-1130 + utils/timm/registry.py)."""
    if model_name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {model_name}; known: {sorted(MODEL_REGISTRY)}")
    kw = dict(MODEL_REGISTRY[model_name])
    kw.update(overrides)
    return FourMConfig(
        encoder_modalities=tuple(encoder_modalities),
        decoder_modalities=tuple(decoder_modalities),
        **kw,
    )
