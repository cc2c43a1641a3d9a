"""Teacher feature extractors for dataset pre-tokenization.

Replaces the reference's vendored OpenAI CLIP visual encoder and torchhub
DINOv2 (save_vq_tokens.py:188-196, :270-287): a configurable flax ViT covering
both geometries, with torch-state-dict import mappings so released weights load
when available; random init keeps the pipeline testable offline.

Feature contract (matching the reference extraction):
  * CLIP-B16:        ln_post(tokens)[no cls] @ proj -> (B, 14, 14, 512)
  * DINOv2-B14:      x_norm_patchtokens -> (B, 16, 16, 768)
  * DINOv2-B14-global: x_norm_clstoken -> (B, 1, 1, 768)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.transformer import LayerNorm, gelu_exact


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class _TeacherBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    act: Callable = gelu_exact
    layer_scale: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.transformer import Attention

        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                      name="attn")(h)
        if self.layer_scale:
            h = h * self.param("gamma_1", nn.initializers.constant(1e-5),
                               (self.dim,), jnp.float32)
        x = x + h
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(self.act(h))
        if self.layer_scale:
            h = h * self.param("gamma_2", nn.initializers.constant(1e-5),
                               (self.dim,), jnp.float32)
        return x + h


class ViTTeacher(nn.Module):
    """CLIP-visual / DINOv2-style ViT producing patch-token feature maps."""

    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    image_size: int = 224
    act_name: str = "gelu"  # "gelu" (DINOv2) or "quick_gelu" (CLIP)
    pre_norm: bool = False  # CLIP ln_pre
    layer_scale: bool = False  # DINOv2 LayerScale
    patch_bias: bool = True  # CLIP conv1 has no bias
    output_dim: int = 0  # CLIP output projection (ln_post @ proj); 0 = none
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_global: bool = False):
        act = quick_gelu if self.act_name == "quick_gelu" else gelu_exact
        B = x.shape[0]
        n = self.image_size // self.patch_size
        h = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    use_bias=self.patch_bias, dtype=self.dtype, name="patch_embed")(
            x.astype(self.dtype))
        h = h.reshape(B, n * n, self.width)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.width), jnp.float32)
        h = jnp.concatenate([jnp.broadcast_to(cls.astype(h.dtype), (B, 1, self.width)), h], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n * n + 1, self.width), jnp.float32)
        h = h + pos[None].astype(h.dtype)
        if self.pre_norm:
            h = LayerNorm(dtype=self.dtype, name="ln_pre")(h)
        for i in range(self.depth):
            h = _TeacherBlock(dim=self.width, num_heads=self.num_heads, act=act,
                              layer_scale=self.layer_scale, dtype=self.dtype,
                              name=f"blocks_{i}")(h)
        h = LayerNorm(dtype=self.dtype, name="ln_post")(h)
        dim = self.width
        if self.output_dim:
            # CLIP: ln_post(tokens) @ proj (reference utils/clip/model.py:275-276)
            proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                              (self.width, self.output_dim), jnp.float32)
            h = h @ proj.astype(h.dtype)
            dim = self.output_dim
        if return_global:
            return h[:, 0].reshape(B, 1, 1, dim)
        return h[:, 1:].reshape(B, n, n, dim)


TEACHER_PRESETS: Dict[str, Dict] = {
    # OpenAI CLIP ViT-B/16 visual tower (reference clip.load("ViT-B/16").visual)
    "CLIP-B16": dict(patch_size=16, width=768, depth=12, num_heads=12,
                     act_name="quick_gelu", pre_norm=True, patch_bias=False,
                     output_dim=512),
    # DINOv2 ViT-B/14 (reference torch.hub dinov2_vitb14)
    "DINOv2-B14": dict(patch_size=14, width=768, depth=12, num_heads=12,
                       act_name="gelu", layer_scale=True),
    "DINOv2-B14-global": dict(patch_size=14, width=768, depth=12, num_heads=12,
                              act_name="gelu", layer_scale=True),
}


def _t(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def import_clip_visual_state(state: Dict[str, np.ndarray], variables) -> Dict:
    """Map OpenAI CLIP `visual.*` torch weights into ViTTeacher variables."""
    p = jax.tree.map(lambda v: v, variables)["params"]
    g = lambda k: np.asarray(state[k], np.float32)

    p["patch_embed"]["kernel"] = jnp.asarray(
        np.transpose(g("visual.conv1.weight"), (2, 3, 1, 0)))
    p["cls_token"] = jnp.asarray(g("visual.class_embedding").reshape(1, 1, -1))
    p["pos_embed"] = jnp.asarray(g("visual.positional_embedding"))
    p["ln_pre"]["weight"] = jnp.asarray(g("visual.ln_pre.weight"))
    p["ln_pre"]["bias"] = jnp.asarray(g("visual.ln_pre.bias"))
    i = 0
    while f"visual.transformer.resblocks.{i}.ln_1.weight" in state:
        b = p[f"blocks_{i}"]
        pre = f"visual.transformer.resblocks.{i}"
        b["norm1"]["weight"] = jnp.asarray(g(f"{pre}.ln_1.weight"))
        b["norm1"]["bias"] = jnp.asarray(g(f"{pre}.ln_1.bias"))
        b["attn"]["qkv"]["kernel"] = jnp.asarray(_t(g(f"{pre}.attn.in_proj_weight")))
        b["attn"]["qkv"]["bias"] = jnp.asarray(g(f"{pre}.attn.in_proj_bias"))
        b["attn"]["proj"]["kernel"] = jnp.asarray(_t(g(f"{pre}.attn.out_proj.weight")))
        b["attn"]["proj"]["bias"] = jnp.asarray(g(f"{pre}.attn.out_proj.bias"))
        b["norm2"]["weight"] = jnp.asarray(g(f"{pre}.ln_2.weight"))
        b["norm2"]["bias"] = jnp.asarray(g(f"{pre}.ln_2.bias"))
        b["fc1"]["kernel"] = jnp.asarray(_t(g(f"{pre}.mlp.c_fc.weight")))
        b["fc1"]["bias"] = jnp.asarray(g(f"{pre}.mlp.c_fc.bias"))
        b["fc2"]["kernel"] = jnp.asarray(_t(g(f"{pre}.mlp.c_proj.weight")))
        b["fc2"]["bias"] = jnp.asarray(g(f"{pre}.mlp.c_proj.bias"))
        i += 1
    p["ln_post"]["weight"] = jnp.asarray(g("visual.ln_post.weight"))
    p["ln_post"]["bias"] = jnp.asarray(g("visual.ln_post.bias"))
    if "visual.proj" in state:
        p["proj"] = jnp.asarray(g("visual.proj"))
    return {"params": p}


def import_dinov2_state(state: Dict[str, np.ndarray], variables) -> Dict:
    """Map DINOv2 torchhub weights into ViTTeacher variables."""
    p = jax.tree.map(lambda v: v, variables)["params"]
    g = lambda k: np.asarray(state[k], np.float32)

    p["patch_embed"]["kernel"] = jnp.asarray(
        np.transpose(g("patch_embed.proj.weight"), (2, 3, 1, 0)))
    p["patch_embed"]["bias"] = jnp.asarray(g("patch_embed.proj.bias"))
    p["cls_token"] = jnp.asarray(g("cls_token").reshape(1, 1, -1))
    p["pos_embed"] = jnp.asarray(g("pos_embed").reshape(-1, g("pos_embed").shape[-1]))
    i = 0
    while f"blocks.{i}.norm1.weight" in state:
        b = p[f"blocks_{i}"]
        pre = f"blocks.{i}"
        b["norm1"]["weight"] = jnp.asarray(g(f"{pre}.norm1.weight"))
        b["norm1"]["bias"] = jnp.asarray(g(f"{pre}.norm1.bias"))
        b["attn"]["qkv"]["kernel"] = jnp.asarray(_t(g(f"{pre}.attn.qkv.weight")))
        b["attn"]["qkv"]["bias"] = jnp.asarray(g(f"{pre}.attn.qkv.bias"))
        b["attn"]["proj"]["kernel"] = jnp.asarray(_t(g(f"{pre}.attn.proj.weight")))
        b["attn"]["proj"]["bias"] = jnp.asarray(g(f"{pre}.attn.proj.bias"))
        b["gamma_1"] = jnp.asarray(g(f"{pre}.ls1.gamma"))
        b["gamma_2"] = jnp.asarray(g(f"{pre}.ls2.gamma"))
        b["norm2"]["weight"] = jnp.asarray(g(f"{pre}.norm2.weight"))
        b["norm2"]["bias"] = jnp.asarray(g(f"{pre}.norm2.bias"))
        b["fc1"]["kernel"] = jnp.asarray(_t(g(f"{pre}.mlp.fc1.weight")))
        b["fc1"]["bias"] = jnp.asarray(g(f"{pre}.mlp.fc1.bias"))
        b["fc2"]["kernel"] = jnp.asarray(_t(g(f"{pre}.mlp.fc2.weight")))
        b["fc2"]["bias"] = jnp.asarray(g(f"{pre}.mlp.fc2.bias"))
        i += 1
    p["ln_post"]["weight"] = jnp.asarray(g("norm.weight"))
    p["ln_post"]["bias"] = jnp.asarray(g("norm.bias"))
    return {"params": p}


def get_feature_extractor(task: str, ckpt_path: Optional[str] = None,
                          image_size: int = 224):
    """Build the teacher for a pre-tokenization task (reference
    save_vq_tokens.py:188-196). Returns callable(images NHWC) -> features NHWC,
    or None for raw-pixel tasks."""
    if task not in TEACHER_PRESETS:
        return None
    preset = dict(TEACHER_PRESETS[task])
    is_global = task.endswith("-global")
    model = ViTTeacher(image_size=image_size, **preset)
    x0 = jnp.zeros((1, image_size, image_size, 3))
    variables = model.init(jax.random.key(0), x0)
    if ckpt_path:
        if ckpt_path.endswith(".safetensors"):
            from safetensors.numpy import load_file

            state = load_file(ckpt_path)
        elif ckpt_path.endswith(".pth") or ckpt_path.endswith(".pt"):
            import torch

            raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            raw = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
            state = {k: v.float().numpy() for k, v in raw.items()}
        else:
            state = dict(np.load(ckpt_path))
        if "CLIP" in task:
            variables = import_clip_visual_state(state, variables)
        else:
            variables = import_dinov2_state(state, variables)
        print(f"[teacher] loaded {task} weights from {ckpt_path}")
    else:
        print(f"[teacher] WARNING: no --teacher_ckpt for {task}; RANDOM weights "
              "(pipeline-validation mode, not real features)")

    fwd = jax.jit(lambda x: model.apply(variables, x, return_global=is_global))
    return fwd
