"""Generated-token decoding and visualization (decode_dict).

Re-implements reference fourm/utils/plotting_utils.py:47-673: maps generated mod
dicts back to images / text / structured outputs via the tokenizer decoders.

Tokenizers are provided as {transform_key: TokenizerBundle}, where a bundle holds a
VQVAE or DiVAE flax model + variables. Diffusion decoding runs the jitted lax.scan
pipeline. Human-pose mesh rendering (vendored HMR2 in the reference) is replaced by
a skeleton-free placeholder for now (visualization-only feature).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.modality_info import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
from ..data.transforms import MetadataTransform, get_transform_key, get_transform_resolution
from .text_tokenizer import get_sentinel_to_id_mapping, merge_span_masking


@dataclasses.dataclass
class TokenizerBundle:
    """A VQ tokenizer (model + variables) usable for decoding."""

    model: Any
    variables: Any

    @property
    def is_diffusion(self) -> bool:
        from ..vq.vqvae import DiVAE

        return isinstance(self.model, DiVAE)

    def decode_tokens(self, tokens: jnp.ndarray, timesteps: Optional[int] = None,
                      image_size: Optional[int] = None, rng: Optional[jax.Array] = None):
        if self.is_diffusion:
            from ..vq.vqvae import divae_decode_tokens

            return divae_decode_tokens(
                self.model, self.variables, tokens, rng or jax.random.key(0),
                timesteps=timesteps, image_size=image_size,
            )
        return self.model.apply(self.variables, tokens, method="decode_tokens")


def denormalize(img: np.ndarray, mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
    """Invert channel-last normalization (reference utils/misc denormalize)."""
    return np.asarray(img) * np.asarray(std) + np.asarray(mean)


def np_squeeze(array: np.ndarray, axis: int = 0):
    return array.squeeze(axis) if array.shape[axis] == 1 else array


def pca_visualize(features: np.ndarray, n_components: int = 3) -> np.ndarray:
    """Project a (H, W, C) feature map to RGB via PCA (reference :65-78)."""
    H, W, C = features.shape
    flat = np.asarray(features, dtype=np.float64).reshape(-1, C)
    flat = flat - flat.mean(0)
    _u, _s, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:n_components].T
    proj = (proj - proj.min(0)) / (proj.max(0) - proj.min(0) + 1e-8)
    return proj.reshape(H, W, n_components)


def _grid(tokens: np.ndarray, image_size: int, patch_size: int) -> jnp.ndarray:
    n = image_size // patch_size
    t = jnp.asarray(tokens)
    if t.ndim == 1:
        t = t[None]
    return t.reshape(t.shape[0], n, n)


# ------------------------------------------------------------- text decoders

def decode_text(mod_dict, key: str, text_tokenizer) -> Tuple:
    """Decode input/target/merged text of a sequence modality (reference :473-510)."""
    sentinel_ids = set(get_sentinel_to_id_mapping(text_tokenizer).values())
    tensor = np.asarray(mod_dict[key]["tensor"])
    input_mask = np.asarray(mod_dict[key]["input_mask"])
    target_mask = np.asarray(mod_dict[key]["target_mask"])
    B = tensor.shape[0]
    inputs, targets, merged = [], [], []
    for i in range(B):
        in_seq = tensor[i][~input_mask[i]].tolist()
        tgt_seq = tensor[i][~target_mask[i]].tolist()
        merged_seq = merge_span_masking(in_seq, tgt_seq, sentinel_ids)
        inputs.append(text_tokenizer.decode(in_seq, skip_special_tokens=False))
        targets.append(text_tokenizer.decode(tgt_seq, skip_special_tokens=False))
        merged.append(text_tokenizer.decode(merged_seq, skip_special_tokens=False))
    if B == 1:
        return inputs[0], targets[0], merged[0]
    return inputs, targets, merged


_METADATA_TRANSFORM = MetadataTransform(shuffle=False, random_trunc=False, return_chunks=False)


def decode_metadata(mod_dict, text_tokenizer, key: str = "metadata"):
    """Parse generated 'v1=.. v0=..' metadata strings back to a dict
    (reference :419-471)."""
    decoded = decode_text(mod_dict, key, text_tokenizer)[2]
    all_decoded = decoded if isinstance(decoded, list) else [decoded]
    all_decoded = [d.replace(" [EOS]", "").replace(" [PAD]", "") for d in all_decoded]
    out = []
    mt = _METADATA_TRANSFORM
    for d in all_decoded:
        parts, cur = [], []
        for p in d.split():
            if "v1" in p and cur:
                parts.append(cur)
                cur = []
            cur.append(p)
        if cur:
            parts.append(cur)
        md = {}
        for part in parts:
            if len(part) != 2:
                continue
            mid, mval = part
            if not (mid.startswith("v1=") and mval.startswith("v0=")) or mid not in mt.id_metadata_map:
                continue
            mtype = mt.id_metadata_map[mid]
            value = int(mval.split("=")[1])
            if mtype in mt.IMAGE_DIM_MODALITIES:
                value *= mt.image_dim_bin_size
            elif mtype in mt.MIN_MAX_BINS:
                vmin, vmax, bins = mt.MIN_MAX_BINS[mtype]
                value = (vmax - vmin) * (value / bins) + vmin
            md[mtype] = value
        out.append({k: md[k] for k in mt.METADATA_ID_MAP if k in md})
    return out[0] if len(out) == 1 else out


def convert_string_to_bboxes(bboxes_str: str, bins: int = 1000) -> List[Tuple]:
    """Parse 'v0=.. v1=.. v2=.. v3=.. class' strings (reference :863-888)."""
    tokens = bboxes_str.split()
    bboxes: List = []
    for tok in tokens:
        if tok.startswith("v0="):
            bboxes.append([min(int(tok[3:]), bins - 1) / (bins - 1)])
        elif tok.startswith("v1=") and bboxes and len(bboxes[-1]) == 1:
            bboxes[-1].append(min(int(tok[3:]), bins - 1) / (bins - 1))
        elif tok.startswith("v2=") and bboxes and len(bboxes[-1]) == 2:
            bboxes[-1].append(min(int(tok[3:]), bins - 1) / (bins - 1))
        elif tok.startswith("v3=") and bboxes and len(bboxes[-1]) == 3:
            bboxes[-1].append(min(int(tok[3:]), bins - 1) / (bins - 1))
        elif bboxes and len(bboxes[-1]) == 4:
            bboxes[-1].append(tok)
        elif bboxes and len(bboxes[-1]) >= 5 and not tok.startswith("v"):
            bboxes[-1][4] = f"{bboxes[-1][4]} {tok}"
    return [tuple(b) for b in bboxes if len(b) >= 5]


def visualize_bboxes(img: np.ndarray, bboxes_str: str, color=(255, 99, 71), thickness: int = 2):
    """Draw parsed bboxes on an RGB [0,1] image with PIL (reference :1042-1086)."""
    from PIL import Image, ImageDraw

    H, W = img.shape[:2]
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    for bbox in convert_string_to_bboxes(bboxes_str):
        x0, y0, x1, y1, cls = bbox[:5]
        draw.rectangle([x0 * W, y0 * H, x1 * W, y1 * H], outline=color, width=thickness)
        draw.text((x0 * W + 2, y0 * H + 2), str(cls), fill=color)
    return np.asarray(pil).astype(np.float32) / 255.0


def visualize_palette(palette_str: str, size: int = 224) -> np.ndarray:
    """Render 'v1=<n> v0=.. ...' palette strings as color strips."""
    values = [int(t[3:]) for t in palette_str.split() if t.startswith("v0=")]
    n = len(values) // 3
    if n == 0:
        return np.ones((size, size, 3), dtype=np.float32)
    img = np.zeros((size, size, 3), dtype=np.float32)
    w = size // n
    for i in range(n):
        rgb = np.asarray(values[3 * i : 3 * i + 3], dtype=np.float32) / 255.0
        img[:, i * w : (i + 1) * w if i < n - 1 else size] = rgb
    return img


# --------------------------------------------------------------- img decoders

def _colormap(img_norm: np.ndarray, name: str = "turbo") -> np.ndarray:
    import matplotlib.pyplot as plt

    return plt.get_cmap(name)(img_norm)[..., :3]


def decode_dict(
    mod_dict: Dict,
    tokenizers: Dict[str, TokenizerBundle],
    text_tokenizer,
    image_size: int = 224,
    patch_size: int = 16,
    decoding_steps: int = 25,
    to_rgb: bool = True,
    seed: Optional[int] = None,
) -> Dict[str, Any]:
    """Decode a generated mod dict into images / text / structured outputs
    (reference plotting_utils.py:673-838)."""
    rng = jax.random.key(seed if seed is not None else 0)
    dec: Dict[str, Any] = {}
    for key in mod_dict:
        k = get_transform_key(key)
        res = get_transform_resolution(key, image_size, to_tuple=False)
        d = mod_dict[key]

        if k == "rgb":
            img = denormalize(np.asarray(d["tensor"]))
            dec[key] = np_squeeze(np.clip(img, 0, 1))
        elif k in ("tok_rgb", "tok_normal", "tok_canny_edge", "tok_sam_edge"):
            if k not in tokenizers:
                continue
            rng, r = jax.random.split(rng)
            toks = _grid(np.asarray(d["tensor"]), res, patch_size)
            t = decoding_steps if k not in ("tok_canny_edge", "tok_sam_edge") else max(decoding_steps // 2, 1)
            rec = np.asarray(tokenizers[k].decode_tokens(toks, timesteps=t, image_size=res, rng=r))
            rec = np.clip(rec * 0.5 + 0.5, 0, 1)  # [-1,1] -> [0,1]
            dec[key] = np_squeeze(rec)
        elif k == "tok_depth":
            if k not in tokenizers:
                continue
            rng, r = jax.random.split(rng)
            toks = _grid(np.asarray(d["tensor"]), res, patch_size)
            rec = np.asarray(tokenizers[k].decode_tokens(toks, timesteps=decoding_steps,
                                                         image_size=res, rng=r))[..., 0]
            if not to_rgb:
                dec[key] = np_squeeze(rec)
            else:
                imgs = []
                for img in rec:
                    norm = (img - img.min()) / (img.max() - img.min() + 1e-8)
                    imgs.append(_colormap(norm))
                dec[key] = np_squeeze(np.stack(imgs))
        elif k == "tok_semseg":
            if k not in tokenizers:
                continue
            toks = _grid(np.asarray(d["tensor"]), res, patch_size)
            logits = np.asarray(tokenizers[k].decode_tokens(toks))
            if not to_rgb:
                dec[key] = np_squeeze(logits)
            else:
                semseg = logits.argmax(-1)
                imgs = [_colormap(s / max(s.max(), 1), "viridis") for s in semseg]
                dec[key] = np_squeeze(np.stack(imgs))
        elif k in ("tok_clip", "tok_dinov2", "tok_imagebind"):
            if k not in tokenizers:
                continue
            ps = 14 if k in ("tok_dinov2", "tok_imagebind") else patch_size
            toks = _grid(np.asarray(d["tensor"]), res, ps)
            feats = np.asarray(tokenizers[k].decode_tokens(toks))
            dec[key] = np_squeeze(np.stack([pca_visualize(f) for f in feats]))
        elif k in ("tok_dinov2_global", "tok_imagebind_global"):
            if k not in tokenizers:
                continue
            toks = np.asarray(d["tensor"])
            toks = jnp.asarray(toks.reshape(toks.shape[0], 4, 4))
            dec[key] = np_squeeze(np.asarray(tokenizers[k].decode_tokens(toks)))
        elif k in ("caption", "det", "sam_instance", "human_poses"):
            _, _, merged = decode_text(mod_dict, key, text_tokenizer)
            strip = lambda s: s.replace("[EOS]", "").replace("[PAD]", "").strip()
            dec[key] = [strip(s) for s in merged] if isinstance(merged, list) else strip(merged)
        elif k == "metadata":
            dec[key] = decode_metadata(mod_dict, text_tokenizer, key)
        elif k == "color_palette":
            _, _, merged = decode_text(mod_dict, key, text_tokenizer)
            merged = merged if isinstance(merged, list) else [merged]
            imgs = [visualize_palette(m.replace(" [EOS]", "")) for m in merged]
            dec[key] = np_squeeze(np.stack(imgs))
        elif k == "t5_caption":
            continue
        else:
            continue
    return dec
