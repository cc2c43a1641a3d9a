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
        elif k in ("caption", "det"):
            _, _, merged = decode_text(mod_dict, key, text_tokenizer)
            strip = lambda s: s.replace("[EOS]", "").replace("[PAD]", "").strip()
            dec[key] = [strip(s) for s in merged] if isinstance(merged, list) else strip(merged)
        elif k == "sam_instance":
            if k in tokenizers:
                dec[key] = decode_sam_instances(
                    mod_dict, tokenizers, text_tokenizer, key=key, image_size=res)
            else:
                _, _, merged = decode_text(mod_dict, key, text_tokenizer)
                strip = lambda s: s.replace("[EOS]", "").replace("[PAD]", "").strip()
                dec[key] = [strip(s) for s in merged] if isinstance(merged, list) else strip(merged)
        elif k == "human_poses":
            _, _, merged = decode_text(mod_dict, key, text_tokenizer)
            strip = lambda s: s.replace("[EOS]", "").replace("[PAD]", "").strip()
            texts = [strip(s) for s in merged] if isinstance(merged, list) else [strip(merged)]
            if k in tokenizers:
                background = dec.get("rgb@224")
                imgs = [visualize_human_poses(t, tokenizers[k], background,
                                              image_size=res) for t in texts]
                dec[key] = np_squeeze(np.stack(imgs))
            else:
                dec[key] = texts if len(texts) > 1 else texts[0]
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


# ------------------------------------------------------------- SAM instances


def _group_by_identifier(items, identifier):
    """[a,b,c,a,d,d] with identifier a -> [[b,c],[d,d]] (reference
    plotting_utils.py:534-539)."""
    from itertools import groupby

    return [list(g) for key, g in groupby(items, lambda x: x == identifier) if not key]


def _map_location(inp: str, tokens: bool = False):
    """'v0=123' -> 123; with tokens=True, 'v1=x' -> x+512 (reference :541-558)."""
    if "=" not in inp:
        return None
    axis, position = inp.split("=")
    try:
        position = int(position)
    except ValueError:
        return None
    if tokens:
        return position if axis == "v0" else position + 512
    return position


def _bbox_iou(box1, box2) -> float:
    x1, y1 = max(box1[0], box2[0]), max(box1[1], box2[1])
    x2, y2 = min(box1[2], box2[2]), min(box1[3], box2[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    a1 = (box1[2] - box1[0]) * (box1[3] - box1[1])
    a2 = (box2[2] - box2[0]) * (box2[3] - box2[1])
    return inter / max(a1 + a2 - inter, 1e-9)


def decode_sam_instances(mod_dict, tokenizers: Dict[str, TokenizerBundle],
                         text_tokenizer, key: str = "sam_instance",
                         image_size: int = 224, token_len: int = 16) -> np.ndarray:
    """Decode SAM-instance token strings to a colored per-instance mask image
    (reference plotting_utils.py:512-672): parse point/polygon groups, decode
    each 16-token polygon through the SAM-instance tokenizer (sigmoid mask),
    dedupe near-identical instances (Dice > 0.8 and bbox IoU > 0.9), paint by
    descending area with a deterministic palette."""
    import cv2

    decoded = decode_text(mod_dict, key, text_tokenizer)[2]
    all_decoded = decoded if isinstance(decoded, list) else [decoded]
    all_decoded = [d.replace(" [EOS]", "").replace("[EOS]", "") for d in all_decoded]

    rng = np.random.default_rng(seed=0)
    sam_palette = [rng.integers(0, 255, size=3) for _ in range(1000)]

    outputs = []
    for dec_str in all_decoded:
        tokens_per_sample, bboxes_per_sample, areas = [], [], []
        parts = dec_str.split()
        for part in _group_by_identifier(parts, identifier="point"):
            if len(part[2:]) <= 1:  # 'none' cases
                continue
            for positions in _group_by_identifier(part, identifier="polygon"):
                if len(positions) != token_len + 4:
                    continue
                bbox, toks = positions[:4], positions[4:]
                min_w, min_h, max_w, max_h = map(_map_location, bbox)
                if None in (min_w, max_w, min_h, max_h) or min_w >= max_w or min_h >= max_h:
                    continue
                toks = [_map_location(t, tokens=True) for t in toks]
                if None in toks:
                    continue
                tokens_per_sample.append(np.array(toks))
                bboxes_per_sample.append(np.array([min_h, min_w, max_h, max_w]))
                areas.append((max_w - min_w) * (max_h - min_h))

        final = np.zeros((image_size, image_size, 3), dtype=np.uint8)
        if not areas:
            outputs.append(final)
            continue
        order = np.argsort(-np.asarray(areas))
        tokens_arr = np.stack(tokens_per_sample)[order].reshape(-1, 4, 4)
        bboxes_arr = np.stack(bboxes_per_sample)[order]
        masks = np.asarray(tokenizers[key].decode_tokens(jnp.asarray(tokens_arr)))
        masks = 1.0 / (1.0 + np.exp(-masks.astype(np.float64)))  # sigmoid
        masks = masks.reshape(masks.shape[0], masks.shape[1], masks.shape[2])

        rep_masks, rep_boxes = [], []
        for mask, bbox in zip(masks, bboxes_arr):
            if (mask.max() - mask.min()) < 0.9:
                continue
            for rms, rbs in zip(rep_masks, rep_boxes):
                rm, rb = rms[0], rbs[0]
                dice = 2 * ((rm * mask).sum() + 0.01) / (rm.sum() + mask.sum() + 0.01)
                if dice > 0.8 and _bbox_iou(rb, bbox) > 0.9:
                    rms.append(mask)
                    rbs.append(bbox)
                    break
            else:
                rep_masks.append([mask])
                rep_boxes.append([bbox])

        for i, (rms, rbs) in enumerate(zip(rep_masks, rep_boxes)):
            mask = np.mean(rms, axis=0)
            min_h, min_w, max_h, max_w = np.mean(rbs, axis=0).astype(np.int32).tolist()
            mask = cv2.resize(mask, (max(max_w - min_w, 1), max(max_h - min_h, 1)),
                              interpolation=cv2.INTER_CUBIC)
            max_w, max_h = min(max_w, image_size), min(max_h, image_size)
            m = mask[: max_h - min_h, : max_w - min_w] > 0.5
            final[min_h:max_h, min_w:max_w, :][m] = sam_palette[i]
        outputs.append(final)
    return outputs[0] if len(outputs) == 1 else np.stack(outputs)


# ------------------------------------------------------------- human poses

# SMPL kinematic tree (public model topology: parent index per joint)
SMPL_PARENTS = (-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
                16, 17, 18, 19, 20, 21)
# Approximate SMPL neutral rest-pose joint locations (meters). This replaces
# the licensed SMPL mesh data the reference vendors via HMR2 (plotting_utils.py
# :913-932, itself optional there): good enough to drive a skeleton render.
SMPL_REST_JOINTS = np.array([
    [0.00, 0.00, 0.00], [0.06, -0.09, 0.00], [-0.06, -0.09, 0.00],
    [0.00, 0.10, 0.00], [0.10, -0.49, 0.00], [-0.10, -0.49, 0.00],
    [0.00, 0.23, 0.00], [0.09, -0.90, 0.00], [-0.09, -0.90, 0.00],
    [0.00, 0.29, 0.00], [0.11, -0.97, 0.12], [-0.11, -0.97, 0.12],
    [0.00, 0.47, 0.00], [0.04, 0.42, 0.00], [-0.04, 0.42, 0.00],
    [0.00, 0.58, 0.00], [0.17, 0.44, 0.00], [-0.17, 0.44, 0.00],
    [0.43, 0.42, 0.00], [-0.43, 0.42, 0.00], [0.68, 0.42, 0.00],
    [-0.68, 0.42, 0.00], [0.76, 0.42, 0.00], [-0.76, 0.42, 0.00],
])


def parse_human_pose_instances(pose_str: str) -> list:
    """Parse the 39-token-per-instance pose string into structured params
    (reference visualize_human_poses parsing, plotting_utils.py:934-1000):
    bbox_xyxy (224px space), pred_cam (3,), betas (10,), global_orient (3,3),
    pose_token_ids (8,) for the pose tokenizer."""
    words = pose_str.split()
    instances = []
    for inst in range(len(words) // 39):
        w = words[inst * 39: (inst + 1) * 39]
        try:
            out = {}
            out["bbox_xyxy"] = np.array([int(w[i][3:]) / 999 * 224 for i in (1, 2, 3, 4)])
            ci = w.index("camera")
            out["pred_cam"] = np.array(
                [(int(w[ci + j][3:]) - 49.95) / 49.95 for j in (1, 2, 3)])
            si = w.index("shape")
            out["betas"] = np.array(
                [(int(w[si + j][3:]) - 499.5) / 166.5 for j in range(1, 11)])
            gi = w.index("global")
            out["global_orient"] = np.array(
                [(int(w[gi + j][3:]) - 499.5) / 499.5 for j in range(1, 10)]
            ).reshape(3, 3)
            pi = w.index("pose")
            out["pose_token_ids"] = np.array([
                int(w[pi + 1 + j][3:]) + (512 if w[pi + 1 + j].startswith("v1") else 0)
                for j in range(8)
            ])
            instances.append(out)
        except (ValueError, IndexError):
            continue
    return instances


def _smpl_forward_kinematics(global_orient: np.ndarray,
                             body_rotmats: np.ndarray) -> np.ndarray:
    """Joint positions from per-joint rotations over the approximate rest
    skeleton (pose2rot=False semantics). body_rotmats: (23, 3, 3)."""
    def orthonormalize(R):
        u, _, vt = np.linalg.svd(R)
        return u @ vt

    n = len(SMPL_PARENTS)
    rots = [orthonormalize(global_orient)]
    pos = [SMPL_REST_JOINTS[0]]
    for i in range(1, n):
        p = SMPL_PARENTS[i]
        local = orthonormalize(body_rotmats[i - 1]) if i - 1 < len(body_rotmats) else np.eye(3)
        rots.append(rots[p] @ local)
        pos.append(pos[p] + rots[p] @ (SMPL_REST_JOINTS[i] - SMPL_REST_JOINTS[p]))
    return np.stack(pos)


def _cam_crop_to_full(pred_cam, box_center, box_size, img_size, focal_length):
    """HMR2 weak-perspective crop-cam -> full-image translation (reference
    hmr2 renderer cam_crop_to_full)."""
    s, tx, ty = pred_cam
    w, h = img_size
    bs = box_size * s + 1e-9
    tz = 2 * focal_length / bs
    tx_full = 2 * (box_center[0] - w / 2) / bs + tx
    ty_full = 2 * (box_center[1] - h / 2) / bs + ty
    return np.array([tx_full, ty_full, tz])


def visualize_human_poses(pose_str: str, pose_tokenizer: TokenizerBundle,
                          background: Optional[np.ndarray] = None,
                          image_size: int = 224) -> np.ndarray:
    """Render decoded human poses as 2D skeletons over the (optional) RGB
    background. Replaces the reference's optional SMPL-mesh render
    (plotting_utils.py:934-1040) with a dependency-free skeleton: decode the
    8 pose tokens to 23 body rotation matrices via the pose tokenizer, run
    forward kinematics over an approximate rest skeleton, project with the
    predicted crop camera, draw bones."""
    import cv2

    img = (np.ascontiguousarray((background * 255).astype(np.uint8))
           if background is not None and np.ndim(background) == 3
           else np.zeros((image_size, image_size, 3), np.uint8))
    focal = 5000.0 / 256.0 * image_size

    for inst in parse_human_pose_instances(pose_str):
        try:
            toks = jnp.asarray(inst["pose_token_ids"].reshape(1, 8, 1))
            dec = np.asarray(pose_tokenizer.decode_tokens(toks)).reshape(-1)
            if dec.size < 23 * 9:
                continue
            body_rotmats = dec[: 23 * 9].reshape(23, 3, 3)
            joints = _smpl_forward_kinematics(inst["global_orient"], body_rotmats)
            # SMPL/graphics y-up -> image y-down
            joints = joints * np.array([1.0, -1.0, 1.0])
            bbox = inst["bbox_xyxy"] / 224.0 * image_size
            center = np.array([(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2])
            size = max((bbox[2] - bbox[0]), (bbox[3] - bbox[1]))
            t = _cam_crop_to_full(inst["pred_cam"], center, size,
                                  (image_size, image_size), focal)
            pts = joints + t
            xy = np.stack([
                focal * pts[:, 0] / np.maximum(pts[:, 2], 1e-6) + image_size / 2,
                focal * pts[:, 1] / np.maximum(pts[:, 2], 1e-6) + image_size / 2,
            ], axis=1).astype(np.int32)
            cv2.rectangle(img, (int(bbox[0]), int(bbox[1])), (int(bbox[2]), int(bbox[3])),
                          (166, 189, 219), 1)
            for i in range(1, len(SMPL_PARENTS)):
                p = SMPL_PARENTS[i]
                cv2.line(img, tuple(xy[p]), tuple(xy[i]), (66, 135, 245), 2)
            for x, y in xy:
                cv2.circle(img, (int(x), int(y)), 2, (255, 255, 255), -1)
        except Exception as e:  # mirror reference's per-instance tolerance
            print(f"Error decoding human pose instance: {e}")
            continue
    return img.astype(np.float32) / 255.0
