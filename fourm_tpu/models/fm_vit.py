"""FourMViT: the 4M encoder repackaged as an RGB-only ViT for transfer learning.

Re-implements reference fourm/models/fm_vit.py:49-484: patch embedding + encoder
blocks (+ optional final norm and output head), with `params_from_fourm` to
initialize from a trained FourM's encoder weights (the reference loads 4M encoder
checkpoints into it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.transformer import Block, LayerNorm
from .embeddings import ImageEncoderEmbedding
from .fourm import MODEL_REGISTRY, _act


@dataclass(frozen=True)
class FourMViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    dim: int = 768
    encoder_depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    norm_bias: bool = True
    act: str = "gelu"
    gated_mlp: bool = False
    qk_norm: bool = False
    drop_path_rate: float = 0.0
    encoder_norm: bool = True
    num_classes: Optional[int] = None  # adds a mean-pool linear head
    dtype: str = "float32"


class FourMViT(nn.Module):
    """RGB-only ViT sharing the FourM encoder architecture (fm_vit.py:49-233)."""

    config: FourMViTConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        n = cfg.img_size // cfg.patch_size
        self.rgb_embedding = ImageEncoderEmbedding(
            num_channels=cfg.in_chans, patch_size=cfg.patch_size, grid_h=n, grid_w=n,
            dim=cfg.dim, sincos_pos_emb=True, dtype=dtype,
            name=f"encoder_embeddings_rgb@{cfg.img_size}",
        )
        self.mod_emb = self.param(
            f"mod_emb_rgb@{cfg.img_size}", nn.initializers.normal(0.02), (cfg.dim,), jnp.float32
        )
        dpr = [cfg.drop_path_rate * i / max(cfg.encoder_depth - 1, 1) for i in range(cfg.encoder_depth)]
        self.encoder = [
            Block(
                dim=cfg.dim, num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias, proj_bias=cfg.proj_bias, mlp_bias=cfg.mlp_bias,
                act=_act(cfg.act), gated_mlp=cfg.gated_mlp, qk_norm=cfg.qk_norm,
                norm_bias=cfg.norm_bias, drop_path_rate=dpr[i], dtype=dtype,
                name=f"encoder_{i}",
            )
            for i in range(cfg.encoder_depth)
        ]
        if cfg.encoder_norm:
            self.norm = LayerNorm(use_bias=cfg.norm_bias, dtype=dtype, name="encoder_norm")
        if cfg.num_classes is not None:
            self.head = nn.Dense(cfg.num_classes, dtype=dtype, name="head")

    def forward_features(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(B, H, W, C) NHWC image -> (B, N, D) encoder features (fm_vit.py:182-199)."""
        cfg = self.config
        B = x.shape[0]
        n = (cfg.img_size // cfg.patch_size) ** 2
        mask = jnp.zeros((B, n), dtype=bool)
        tokens, pos = self.rgb_embedding(x, mask)
        x = tokens + pos + self.mod_emb.astype(tokens.dtype)
        for blk in self.encoder:
            x = blk(x, None, deterministic)
        if cfg.encoder_norm:
            x = self.norm(x)
        return x

    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        feats = self.forward_features(x, deterministic)
        if self.config.num_classes is not None:
            return self.head(jnp.mean(feats, axis=1))
        return feats


def vit_config_from_registry(model_name: str, **overrides) -> FourMViTConfig:
    """Build from the 13 registered size variants (reference fm_vit.py:273-484)."""
    if model_name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {model_name}")
    kw = dict(MODEL_REGISTRY[model_name])
    kw.pop("decoder_depth", None)
    return FourMViTConfig(**{**kw, **overrides})


def params_from_fourm(fourm_params: Dict, img_size: int = 224) -> Dict:
    """Extract the encoder weights of a trained FourM into a FourMViT params tree
    (the transfer-learning warm start, reference fm_vit.py docstring)."""
    src = fourm_params["params"] if "params" in fourm_params else fourm_params
    out = {}
    rgb_key = f"encoder_embeddings_rgb@{img_size}"
    for key, val in src.items():
        if key.startswith("encoder_") and (key.split("_")[-1].isdigit() or key == "encoder_norm"):
            out[key] = val
        elif key == rgb_key:
            out[key] = val
        elif key == f"mod_emb_rgb@{img_size}":
            out[key] = val
    return {"params": out}
