"""Per-modality load/preprocess/augment/postprocess transforms.

Host-side numpy/PIL re-implementation of reference fourm/data/modality_transforms.py
(1386 LoC): one sampled crop/flip is applied consistently to every modality via
UnifiedDataTransform; sequence-like modalities (detection, metadata, poses,
palettes) are serialized to coordinate-token strings for the shared WordPiece
tokenizer. Outputs are numpy, channel-LAST (H, W, C) — the TPU-native layout the
models consume (the reference emits torch CHW).

The albumentations bbox helpers the reference uses (bbox_crop/bbox_hflip/
filter_bboxes) are re-implemented in `bbox_ops` below.
"""

from __future__ import annotations

import gzip
import json
import random
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from .modality_info import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
    IMAGENET_SURFACE_NORMAL_MEAN,
    IMAGENET_SURFACE_NORMAL_STD,
)


# ------------------------------------------------------------- name helpers

def get_transform_key(mod_name: str) -> str:
    """Strip the @resolution suffix (reference modality_transforms.py:39-40)."""
    return mod_name.split("@")[0]


def get_transform_resolution(mod_name: str, default_resolution, to_tuple: bool = True):
    res = int(mod_name.split("@")[1]) if "@" in mod_name else default_resolution
    return (res, res) if to_tuple and not isinstance(res, tuple) else res


def get_transform(mod_name: str, transforms_dict: Dict):
    return transforms_dict.get(get_transform_key(mod_name), IdentityTransform())


_PIL_MODES = {
    None: None,
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "nearest": Image.NEAREST,
}


# ------------------------------------------------------------------ bbox ops

class bbox_ops:
    """Normalized-bbox math equivalent to albumentations' helpers."""

    @staticmethod
    def crop(bbox, x_min, y_min, x_max, y_max, rows, cols):
        """Crop a normalized (x0, y0, x1, y1) bbox; crop window in pixels."""
        crop_w, crop_h = x_max - x_min, y_max - y_min
        x0, y0, x1, y1 = bbox[:4]
        return (
            (x0 * cols - x_min) / crop_w,
            (y0 * rows - y_min) / crop_h,
            (x1 * cols - x_min) / crop_w,
            (y1 * rows - y_min) / crop_h,
        )

    @staticmethod
    def hflip(bbox):
        x0, y0, x1, y1 = bbox[:4]
        return (1.0 - x1, y0, 1.0 - x0, y1)

    @staticmethod
    def filter(bboxes, rows, cols, min_visibility=0.0, min_area=0.0):
        """Clip to [0,1], drop degenerate / mostly-out-of-frame boxes
        (albumentations filter_bboxes semantics)."""
        out = []
        for bbox in bboxes:
            coords = np.asarray(bbox[:4], dtype=np.float64)
            if (coords[2] <= 0 or coords[3] <= 0 or coords[0] >= 1 or coords[1] >= 1):
                continue
            clipped = np.clip(coords, 0.0, 1.0)
            area = (coords[2] - coords[0]) * (coords[3] - coords[1]) * rows * cols
            clip_area = (clipped[2] - clipped[0]) * (clipped[3] - clipped[1]) * rows * cols
            if clip_area <= min_area or area <= 0:
                continue
            if clip_area / max(area, 1e-12) < min_visibility:
                continue
            out.append(tuple(clipped.tolist()) + tuple(bbox[4:]))
        return out


# ---------------------------------------------------------- unified transform

class UnifiedDataTransform:
    """Apply ONE sampled crop/flip consistently to every modality
    (reference modality_transforms.py:67-135)."""

    def __init__(self, transforms_dict: Dict, image_augmenter, resample_mode: Optional[str] = None,
                 add_sizes: bool = False):
        self.transforms_dict = transforms_dict
        self.image_augmenter = image_augmenter
        self.resample_mode = resample_mode
        self.add_sizes = add_sizes

    def __call__(self, mod_dict: Dict) -> Dict:
        crop_settings = mod_dict.pop("crop_settings", None)
        mod_dict = {k: get_transform(k, self.transforms_dict).preprocess(v)
                    for k, v in mod_dict.items()}
        crop_coords, flip, orig_size, target_size, rand_aug_idx = self.image_augmenter(
            mod_dict, crop_settings
        )
        out = {
            k: get_transform(k, self.transforms_dict).image_augment(
                v, crop_coords=crop_coords, flip=flip, orig_size=orig_size,
                target_size=get_transform_resolution(k, target_size),
                rand_aug_idx=rand_aug_idx, resample_mode=self.resample_mode,
            )
            for k, v in mod_dict.items()
        }
        out = {k: get_transform(k, self.transforms_dict).postprocess(v) for k, v in out.items()}
        if self.add_sizes:
            out["crop_coords"] = np.asarray(crop_coords)
            out["orig_size"] = np.asarray(orig_size)
        return out


class AbstractTransform(ABC):
    @abstractmethod
    def load(self, sample):
        ...

    @abstractmethod
    def preprocess(self, sample):
        ...

    @abstractmethod
    def image_augment(self, v, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        ...

    @abstractmethod
    def postprocess(self, v):
        ...


class ImageTransform(AbstractTransform):
    @staticmethod
    def pil_loader(path: str) -> Image.Image:
        return Image.open(path)

    @staticmethod
    def image_hflip(img: Image.Image, flip: bool) -> Image.Image:
        return img.transpose(Image.FLIP_LEFT_RIGHT) if flip else img

    @staticmethod
    def image_crop_and_resize(img: Image.Image, crop_coords, target_size,
                              resample_mode: Optional[str] = None) -> Image.Image:
        top, left, h, w = crop_coords
        th, tw = target_size
        img = img.crop((left, top, left + w, top + h))
        return img.resize((tw, th), resample=_PIL_MODES[resample_mode])


class RGBTransform(ImageTransform):
    """(reference :198-243) -> float32 (H, W, 3), normalized."""

    def __init__(self, imagenet_default_mean_and_std: bool = True, color_jitter: bool = False,
                 color_jitter_strength: float = 0.5):
        self.mean = np.asarray(
            IMAGENET_DEFAULT_MEAN if imagenet_default_mean_and_std else IMAGENET_INCEPTION_MEAN,
            dtype=np.float32,
        )
        self.std = np.asarray(
            IMAGENET_DEFAULT_STD if imagenet_default_mean_and_std else IMAGENET_INCEPTION_STD,
            dtype=np.float32,
        )
        self.color_jitter = color_jitter
        self.strength = color_jitter_strength

    def _jitter(self, img: Image.Image) -> Image.Image:
        from PIL import ImageEnhance, ImageOps

        s = self.strength
        if random.random() < 0.8:
            for enh, amt in [(ImageEnhance.Brightness, 0.8 * s), (ImageEnhance.Contrast, 0.8 * s),
                             (ImageEnhance.Color, 0.8 * s)]:
                img = enh(img).enhance(1.0 + random.uniform(-amt, amt))
        if random.random() < 0.2:
            img = ImageOps.grayscale(img).convert("RGB")
        return img

    def load(self, path):
        return self.pil_loader(path)

    def preprocess(self, sample):
        sample = sample.convert("RGB")
        if self.color_jitter:
            sample = self._jitter(sample)
        return sample

    def image_augment(self, img, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        img = self.image_crop_and_resize(img, crop_coords, target_size, resample_mode)
        return self.image_hflip(img, flip)

    def postprocess(self, sample):
        arr = np.asarray(sample, dtype=np.float32) / 255.0
        return (arr - self.mean) / self.std


class DepthTransform(ImageTransform):
    """uint16 depth -> float32 (H, W, 1), optionally robust-standardized
    (reference :245-288)."""

    def __init__(self, standardize_depth: bool = True):
        self.standardize_depth = standardize_depth

    @staticmethod
    def truncated_depth_standardization(depth: np.ndarray, thresh: float = 0.1) -> np.ndarray:
        trunc = np.sort(depth.reshape(-1))
        trunc = trunc[int(thresh * len(trunc)): int((1 - thresh) * len(trunc))]
        return (depth - trunc.mean()) / np.sqrt(trunc.var() + 1e-6)

    def load(self, path):
        return self.pil_loader(path)

    def preprocess(self, sample):
        return sample

    def image_augment(self, img, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        img = self.image_crop_and_resize(img, crop_coords, target_size, resample_mode)
        return self.image_hflip(img, flip)

    def postprocess(self, sample):
        arr = np.asarray(sample, dtype=np.float32) / (2**16 - 1.0)
        if self.standardize_depth:
            arr = self.truncated_depth_standardization(arr)
        return arr[..., None]


class NormalTransform(ImageTransform):
    """Surface normals; horizontal flip negates the x (red) channel
    (reference :289-325)."""

    def __init__(self, standardize_surface_normals: bool = False):
        self.mean = np.asarray(
            IMAGENET_SURFACE_NORMAL_MEAN if standardize_surface_normals else (0.5, 0.5, 0.5),
            dtype=np.float32,
        )
        self.std = np.asarray(
            IMAGENET_SURFACE_NORMAL_STD if standardize_surface_normals else (0.5, 0.5, 0.5),
            dtype=np.float32,
        )

    def load(self, path):
        return self.pil_loader(path)

    def preprocess(self, sample):
        return sample

    def image_hflip(self, img: Image.Image, flip: bool) -> Image.Image:
        if flip:
            arr = np.array(img.transpose(Image.FLIP_LEFT_RIGHT))
            arr[:, :, 0] = 255 - arr[:, :, 0]
            img = Image.fromarray(arr)
        return img

    def image_augment(self, img, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        img = self.image_crop_and_resize(img, crop_coords, target_size, resample_mode)
        return self.image_hflip(img, flip)

    def postprocess(self, sample):
        arr = np.asarray(sample, dtype=np.float32) / 255.0
        return (arr - self.mean) / self.std


class SemsegTransform(ImageTransform):
    """Class-index maps -> int64 (H, W); nearest resampling (reference :327-382)."""

    def __init__(self, scale_factor: float = 1.0, shift_idx_by_one: bool = False,
                 id_mapping: Optional[Dict] = None, select_channel: Optional[int] = None):
        self.scale_factor = scale_factor
        self.shift_idx_by_one = shift_idx_by_one
        self.id_mapping = id_mapping
        self.select_channel = select_channel

    def load(self, path):
        sample = self.pil_loader(path)
        if self.select_channel is not None:
            sample = sample.split()[self.select_channel]
        return sample

    def preprocess(self, sample):
        sample = sample.convert("P")
        if self.id_mapping is not None:
            arr = np.asarray(sample)
            arr = np.vectorize(lambda x: self.id_mapping.get(x, x))(arr)
            sample = Image.fromarray(arr.astype(np.uint8), mode="P")
        if self.shift_idx_by_one:
            arr = np.asarray(sample) + 1
            sample = Image.fromarray(arr.astype(np.uint8), mode="P")
        return sample

    def image_augment(self, img, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        img = self.image_crop_and_resize(img, crop_coords, target_size, resample_mode="nearest")
        return self.image_hflip(img, flip)

    def postprocess(self, sample):
        if self.scale_factor != 1.0:
            th = int(sample.height * self.scale_factor)
            tw = int(sample.width * self.scale_factor)
            sample = sample.resize((tw, th), resample=Image.NEAREST)
        return np.asarray(sample, dtype=np.int64)


class MaskTransform(ImageTransform):
    """Validity masks -> bool (H, W, 1); min-pooled dilation (reference :570-600)."""

    def __init__(self, mask_pool_size: int = 1):
        self.mask_pool_size = int(mask_pool_size)

    def load(self, path):
        return self.pil_loader(path)

    def preprocess(self, sample):
        return sample

    def image_augment(self, img, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        img = self.image_crop_and_resize(img, crop_coords, target_size, resample_mode="nearest")
        return self.image_hflip(img, flip)

    def postprocess(self, sample):
        mask = np.asarray(sample, dtype=np.float32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = mask / 255.0 if mask.max() > 1.0 else mask
        p = self.mask_pool_size
        if p > 1:
            H, W = mask.shape
            pooled = mask[: H // p * p, : W // p * p].reshape(H // p, p, W // p, p).min(axis=(1, 3))
            mask = np.repeat(np.repeat(pooled, p, axis=0), p, axis=1)
        return (mask == 1.0)[..., None]


class TokTransform(AbstractTransform):
    """Pre-computed token arrays: select the crop matching rand_aug_idx
    (reference :602-622)."""

    def load(self, path):
        return np.load(path).astype(np.int64)

    def preprocess(self, sample):
        return sample

    def image_augment(self, v, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        if rand_aug_idx is None:
            raise ValueError(
                "Crop settings / augmentation index missing for a pre-tokenized modality"
            )
        return np.asarray(v[rand_aug_idx])

    def postprocess(self, sample):
        return sample


def _bbox_area(b):
    return (b[2] - b[0]) * (b[3] - b[1])


def _bbox_score(b):
    return b[5]


def _bbox_rand(_b):
    return random.random()


def _bbox_dist_to_orig(b):
    return b[0] ** 2 + b[1] ** 2


class DetectionTransform(AbstractTransform):
    """Instances -> coordinate-token string 'v0=.. v1=.. v2=.. v3=.. class'
    (reference :625-753). Picklable (no lambdas) so datasets can run in
    multiprocessing workers."""

    def _order(self, bboxes):
        if self.bbox_order_name == "area":
            return sorted(bboxes, key=_bbox_area, reverse=True)
        if self.bbox_order_name == "score":
            return sorted(bboxes, key=_bbox_score, reverse=True)
        if self.bbox_order_name == "random":
            return sorted(bboxes, key=_bbox_rand)
        return sorted(bboxes, key=_bbox_dist_to_orig)

    def __init__(self, det_threshold: float = 0.6, det_max_instances: Optional[int] = None,
                 bbox_order: str = "dist_to_orig", coord_bins: int = 1000,
                 min_visibility: float = 0.0, return_raw: bool = False):
        self.det_threshold = det_threshold
        self.det_max_instances = det_max_instances
        self.coord_bins = coord_bins
        self.min_visibility = min_visibility
        self.return_raw = return_raw
        if bbox_order not in ("area", "score", "random", "dist_to_orig"):
            raise ValueError(f"unknown bbox order {bbox_order}")
        self.bbox_order_name = bbox_order

    def load(self, path):
        with open(path) as f:
            return json.load(f)

    def preprocess(self, sample):
        return [
            inst["boxes"] + [inst["class_name"], inst["score"]]
            for inst in sample["instances"]
            if inst["score"] >= self.det_threshold
        ]

    def image_augment(self, bboxes, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx=None, resample_mode=None):
        orig_h, orig_w = orig_size
        top, left, h, w = crop_coords
        bboxes = [
            bbox_ops.crop(b, left, top, left + w, top + h, orig_h, orig_w) + tuple(b[4:])
            for b in bboxes
        ]
        bboxes = bbox_ops.filter(bboxes, h, w, min_visibility=self.min_visibility)
        if flip:
            bboxes = [bbox_ops.hflip(b) + tuple(b[4:]) for b in bboxes]
        if self.det_max_instances is not None and len(bboxes) > self.det_max_instances:
            bboxes = sorted(bboxes, key=_bbox_score, reverse=True)[: self.det_max_instances]
        return self._order(bboxes)

    def postprocess(self, bboxes):
        if self.return_raw:
            return bboxes
        bins = self.coord_bins
        parts = [
            " ".join([
                f"v0={round(x0 * (bins - 1))}", f"v1={round(y0 * (bins - 1))}",
                f"v2={round(x1 * (bins - 1))}", f"v3={round(y1 * (bins - 1))}", str(cls),
            ])
            for (x0, y0, x1, y1, cls, _score) in bboxes
        ]
        return " ".join(parts)


class CaptionTransform(AbstractTransform):
    """(reference :755-794)"""

    def __init__(self, aligned_captions: bool = True, no_aug: bool = False):
        self.aligned_captions = aligned_captions
        self.no_aug = no_aug

    def load(self, path):
        if path.endswith(".txt"):
            return Path(path).read_text()
        if path.endswith(".json"):
            with open(path) as f:
                return json.load(f)
        if path.endswith(".json.gz"):
            with gzip.open(path, "rb") as f:
                return json.load(f)
        raise ValueError(f"unsupported caption file {path}")

    def preprocess(self, sample):
        return sample

    def image_augment(self, val, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        if isinstance(val, (list, tuple)):
            if self.aligned_captions:
                val = val[0] if rand_aug_idx is None else val[rand_aug_idx]
            else:
                val = random.choice(val) if not self.no_aug else val[0]
        if isinstance(val, dict):
            val = val["caption"]
        return val

    def postprocess(self, sample):
        return sample


class CaptionEmbTransform(AbstractTransform):
    """Pre-computed caption embeddings, e.g. T5-XXL (reference :796-841)."""

    def __init__(self, aligned_captions: bool = True, no_aug: bool = False):
        self.aligned_captions = aligned_captions
        self.no_aug = no_aug

    def load(self, path):
        if path.endswith(".npz"):
            data = np.load(path)
            return {"emb": data["emb"], "mask_valid": data["mask_valid"]}
        raise ValueError(f"invalid caption embedding file {path}")

    def preprocess(self, sample):
        return sample

    def image_augment(self, val, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        emb, mask_valid = val["emb"], val["mask_valid"].astype(bool)
        if emb.shape[0] > 1:
            if self.aligned_captions:
                idx = 0 if rand_aug_idx is None else rand_aug_idx
            else:
                idx = 0 if self.no_aug else random.randint(0, emb.shape[0] - 1)
        else:
            idx = 0
        return emb[idx][mask_valid[idx]]

    def postprocess(self, sample):
        return np.asarray(sample, dtype=np.float32)


class MetadataTransform(AbstractTransform):
    """Metadata dict -> 'v1=<type> v0=<binned value>' chunks (reference :843-1007)."""

    METADATA_ID_MAP = {
        "original_width": "v1=0", "original_height": "v1=1", "caption_n_chars": "v1=2",
        "caption_n_words": "v1=3", "caption_n_sentences": "v1=4", "n_humans": "v1=5",
        "n_sam_instances": "v1=6", "n_coco_instances": "v1=7",
        "coco_instance_diversity": "v1=8", "colorfulness": "v1=9", "brightness": "v1=10",
        "contrast": "v1=11", "saturation": "v1=12", "entropy": "v1=13",
        "walkability": "v1=14", "objectness": "v1=15", "semantic_diversity": "v1=16",
        "geometric_complexity": "v1=17", "occlusion_score": "v1=18",
        "watermark_score": "v1=19", "aesthetic_score": "v1=20",
    }
    IMAGE_DIM_MODALITIES = ["original_height", "original_width"]
    INT_MODALITIES = [
        "caption_n_chars", "caption_n_words", "caption_n_sentences", "n_humans",
        "n_sam_instances", "n_coco_instances", "coco_instance_diversity",
        "semantic_diversity",
    ]
    MANUAL_BINS = {"watermark_score": [0.5], "aesthetic_score": [4.5, 5.5]}
    MIN_MAX_BINS = {
        "colorfulness": (0, 150, 50), "brightness": (0, 255, 50), "contrast": (0, 127, 50),
        "saturation": (0, 255, 50), "entropy": (0, 10, 50), "walkability": (0, 1, 50),
        "objectness": (0, 1, 50), "geometric_complexity": (0, 0.75, 50),
        "occlusion_score": (0, 0.25, 50),
    }

    def __init__(self, special_vmin: int = 0, special_vmax: int = 999, shuffle: bool = True,
                 random_trunc: bool = False, return_chunks: bool = True,
                 return_raw: bool = False, image_dim_bin_size: int = 32):
        self.special_vmin = special_vmin
        self.special_vmax = special_vmax
        self.shuffle = shuffle
        self.random_trunc = random_trunc
        self.return_chunks = return_chunks
        self.return_raw = return_raw
        self.image_dim_bin_size = image_dim_bin_size
        self.id_metadata_map = {v: k for k, v in self.METADATA_ID_MAP.items()}

    def _to_string(self, metadata, key) -> str:
        mid = self.METADATA_ID_MAP[key]
        if key in self.IMAGE_DIM_MODALITIES:
            value = metadata[key] // self.image_dim_bin_size
            value = max(self.special_vmin, min(value, self.special_vmax))
        elif key in self.INT_MODALITIES:
            value = max(self.special_vmin, min(metadata[key], self.special_vmax))
        elif key in self.MANUAL_BINS:
            value = sum(1 for b in self.MANUAL_BINS[key] if metadata[key] >= b)
        else:
            vmin, vmax, bins = self.MIN_MAX_BINS[key]
            v = max(vmin, min(metadata[key], vmax))
            value = int((v - vmin) / (vmax - vmin) * (bins - 1))
        return f"{mid} v0={value}"

    def metadata_to_string(self, metadata, keys=None):
        keys = list(metadata.keys()) if keys is None else keys
        if self.shuffle:
            random.shuffle(keys)
        if self.random_trunc:
            keys = keys[: random.randint(1, len(keys))]
        strings = [self._to_string(metadata, k) for k in keys]
        return strings if self.return_chunks else " ".join(strings)

    def load(self, path):
        with open(path) as f:
            return json.load(f)

    def preprocess(self, sample):
        return sample

    def image_augment(self, val, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx=None, resample_mode=None):
        return val

    def postprocess(self, metadata):
        if self.return_raw:
            return metadata
        return self.metadata_to_string(metadata)


class ColorPaletteTransform(AbstractTransform):
    """Palette JSON -> 'v1=<len> v0=.. v0=..' string (reference :1174-1228)."""

    def __init__(self, coord_bins: int = 1000, return_raw: bool = False):
        self.coord_bins = coord_bins
        self.return_raw = return_raw

    def load(self, path):
        with open(path) as f:
            return json.load(f)

    def preprocess(self, sample):
        if self.return_raw:
            return sample
        length = random.randint(1, 7)
        return np.asarray(sample[0][str(length)]).flatten().tolist()

    def image_augment(self, palettes, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx=None, resample_mode=None):
        return palettes

    def postprocess(self, palettes):
        if self.return_raw:
            return palettes
        colors = [f"v1={round(len(palettes) / 3)}"]
        colors += [f"v0={round(v)}" for v in palettes]
        return " ".join(colors)


class HumanPoseTransform(AbstractTransform):
    """SMPL pose instances -> coordinate-token string (reference :1009-1172).

    only_pose=True returns the 207-dim body-pose vector for tokenizer training.
    """

    def __init__(self, coord_bins: int = 1000, only_pose: bool = False, return_raw: bool = False):
        self.coord_bins = coord_bins
        self.only_pose = only_pose
        self.return_raw = return_raw

    def load(self, path):
        with open(path) as f:
            return json.load(f)

    def preprocess(self, sample):
        instances = sample
        if self.only_pose:
            if len(instances) == 0:
                return np.zeros(207, dtype=np.float32)
            return np.asarray(
                instances["pred_smpl_params"]["body_pose"][0], dtype=np.float32
            ).flatten()
        if len(instances) == 0:
            return "none"
        n = len(instances["bbox_xyxy"])
        converted = []
        for i in range(n):
            converted.append(
                ["human"] + list(np.asarray(instances["bbox_xyxy"][i]).flatten())
                + ["global"] + list(np.asarray(instances["pred_smpl_params"]["global_orient"][i]).flatten())
                + ["pose"] + list(np.asarray(instances["pose_tokenized"][i]).flatten())
                + ["shape"] + list(np.asarray(instances["pred_smpl_params"]["betas"][i]).flatten())
                + ["camera"] + list(np.asarray(instances["pred_cam"][i]).flatten())
            )
        return converted

    def image_augment(self, humanposes, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx=None, resample_mode=None):
        if humanposes == "none" or self.only_pose:
            return humanposes
        orig_h, orig_w = orig_size
        top, left, h, w = crop_coords
        out = []
        for inst in humanposes:
            bbox = np.asarray(inst[1:5], dtype=np.float64)
            bbox[0::2] /= orig_w
            bbox[1::2] /= orig_h
            bbox = np.asarray(
                bbox_ops.crop(bbox, left, top, left + w, top + h, orig_h, orig_w)
            )
            if np.all(bbox[1::2] < 0) or np.all(bbox[0::2] < 0):
                continue
            if np.all(bbox[1::2] > 1.0) or np.all(bbox[0::2] > 1.0):
                continue
            inst = list(inst)
            inst[1:5] = np.clip(bbox, 0.0, 1.0).tolist()
            out.append(inst)
        return out if out else "none"

    def postprocess(self, humanposes):
        if humanposes == "none" or self.only_pose:
            return humanposes if not self.return_raw else []
        if self.return_raw:
            return humanposes
        bins = self.coord_bins
        result = ""
        for hp in humanposes:
            bboxes = hp[1:5]
            global_orient = np.asarray(hp[6:15], dtype=np.float64)
            pose_params = np.asarray(hp[16:24], dtype=np.float64)
            shape_params = np.asarray(hp[25:35], dtype=np.float64)
            camera_params = np.clip(np.asarray(hp[36:], dtype=np.float64), -1.0, 19.0)

            bbox_strs = [f"v{i}={round(bboxes[i] * (bins - 1))}" for i in range(4)]
            go = [f"v0={round(v * 499.5 + 499.5)}" for v in global_orient]
            pp = [
                f"v0={round(v)}" if v < 512 else f"v1={round(v - 512)}" for v in pose_params
            ]
            sh = [f"v0={round(v * 166.5 + 499.5)}" for v in shape_params]
            cam = [f"v0={round(v * 49.95 + 49.95)}" for v in camera_params]
            groups = [["pose"] + pp, ["global"] + go, ["camera"] + cam, ["shape"] + sh]
            random.shuffle(groups)
            parts = ["human"] + bbox_strs + [t for g in groups for t in g]
            result += " ".join(str(p) for p in parts) + " "
        return result


class CropSettingsTransform(AbstractTransform):
    """(reference :1335-1350)"""

    def load(self, path):
        return np.load(path)

    def preprocess(self, sample):
        raise NotImplementedError

    def image_augment(self, val, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        raise NotImplementedError

    def postprocess(self, sample):
        raise NotImplementedError


class IdentityTransform(AbstractTransform):
    def load(self, path):
        raise NotImplementedError

    def preprocess(self, sample):
        return sample

    def image_augment(self, val, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        return val

    def postprocess(self, sample):
        return sample


class JSONTransform(AbstractTransform):
    def load(self, path):
        if path.endswith(".json"):
            with open(path) as f:
                return json.load(f)
        if path.endswith(".json.gz"):
            with gzip.open(path, "rb") as f:
                return json.load(f)
        raise ValueError(path)

    def preprocess(self, sample):
        return sample

    def image_augment(self, val, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        return val

    def postprocess(self, sample):
        return sample


class SAMInstanceTokTransform(AbstractTransform):
    """Pre-tokenized SAM instances -> query-point-conditioned token string
    (reference :1231-1333): for random/grid query points, list the (bbox +
    BottleneckMLP token ids) of every instance polygon containing the point."""

    def __init__(self, image_size: int = 224, points_per_side: int = 7,
                 point_order: str = "random"):
        self.H = self.W = image_size
        self.points_per_h = self.points_per_w = points_per_side
        assert point_order in ("random", "grid")
        self.point_order = point_order
        self._grid = None

    def get_query_points(self) -> np.ndarray:
        if self.point_order == "grid":
            if self._grid is None:
                y, x = np.meshgrid(
                    np.linspace(0, self.H, self.points_per_h + 2)[1:-1],
                    np.linspace(0, self.W, self.points_per_w + 2)[1:-1],
                )
                self._grid = np.stack((x, y), axis=2).astype(np.int32).reshape(-1, 2)
            return self._grid
        y = np.random.randint(0, self.H, self.points_per_h)
        x = np.random.randint(0, self.W, self.points_per_w)
        return np.concatenate((x[:, None], y[:, None]), axis=1)

    def get_target_tokens(self, sample, query_points):
        import cv2

        instances_coords = [coords[0] for coords in sample["points"]]
        tokens = sample["token_ids"]
        bboxes = sample["bbox"]
        out = {}
        for point in query_points:
            point = (int(point[0]), int(point[1]))
            out[point] = []
            for coords, tok, bbox in zip(instances_coords, tokens, bboxes):
                if cv2.pointPolygonTest(coords, point, measureDist=True) >= 0:
                    out[point].append((tok, bbox))
        return out

    def convert_target_tokens_to_string(self, target_tokens) -> str:
        result = []
        points = list(target_tokens.keys())
        random.shuffle(points)
        for point in points:
            result += ["point", f"v0={point[1]}", f"v1={point[0]}"]
            random.shuffle(target_tokens[point])
            if not target_tokens[point]:
                result.append("none")
            for tok, bbox in target_tokens[point]:
                result.append("polygon")
                ymin, xmin, ymax, xmax = np.asarray(bbox).astype(np.int32)
                result += [f"v0={xmin}", f"v1={ymin}", f"v2={xmax}", f"v3={ymax}"]
                for idx in np.asarray(tok).tolist():
                    result.append(f"v0={idx}" if idx < 512 else f"v1={idx - 512}")
        return " ".join(result)

    def load(self, path):
        return np.load(path, allow_pickle=True)

    def preprocess(self, sample):
        for s in sample:
            s["token_ids"] = np.asarray(s["token_ids"]).astype(np.int32)
        return sample

    def image_augment(self, v, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx, resample_mode=None):
        if rand_aug_idx is None:
            raise ValueError("pre-tokenized SAM instances need an augmentation index")
        return v[rand_aug_idx]

    def postprocess(self, sample):
        qp = self.get_query_points()
        return self.convert_target_tokens_to_string(self.get_target_tokens(sample, qp))


class SAMInstanceTransform(AbstractTransform):
    """Raw SAM instance polygons -> fixed-size binary masks + bboxes, for SAM
    instance tokenizer training (reference :384-567). Crops clip polygons against
    the crop rectangle (adding border crossing points), resizes, drops tiny
    instances, and rasterizes each polygon to a mask_size x mask_size mask."""

    def __init__(self, mask_size: int = 64, max_instance_n: Optional[int] = 20,
                 bbox_area_threshold: float = 0.0005):
        self.mask_size = mask_size
        self.max_instance_n = max_instance_n
        self.bbox_area_threshold = bbox_area_threshold

    @staticmethod
    def get_bbox(instance):
        min_h, max_h = instance[:, :, 1].min(), instance[:, :, 1].max()
        min_w, max_w = instance[:, :, 0].min(), instance[:, :, 0].max()
        return [min_h, min_w, max_h, max_w]

    def _border_crossings(self, crop_points):
        p = crop_points[:, 0]
        p_next = np.roll(p, -1, axis=0)

        def fn(x, xn):
            out = []
            c_diff = p_next - p
            x_diff = x - xn
            for diff, c in zip(c_diff, p):
                A = np.array([[diff[0], x_diff[0]], [diff[1], x_diff[1]]], dtype=np.float64)
                b = (x - c).astype(np.float64)
                try:
                    lm = np.linalg.solve(A, b)
                except np.linalg.LinAlgError:
                    continue
                if 0 <= lm[0] <= 1 and 0 <= lm[1] <= 1:
                    out.append(lm[1] * xn + (1 - lm[1]) * x)
            return out

        return fn

    def crop_sample(self, sample, crop_coords):
        import cv2

        top, left, h, w = crop_coords
        region = (left, top, left + w, top + h)
        crop_points = np.array([
            [region[0], region[1]], [region[2], region[1]],
            [region[2], region[3]], [region[0], region[3]],
        ])[:, None]
        border_fn = self._border_crossings(crop_points)
        out = []
        for instance in sample:
            # extend with border-crossing points
            p = instance[:, 0]
            p_next = np.roll(p, -1, axis=0)
            pts = []
            for x, xn in zip(p, p_next):
                pts.append(x)
                for r in border_fn(x, xn):
                    pts.append(r.astype(np.int32))
            inst = np.stack(pts)[:, None]
            inside = (
                (inst[:, :, 0] > region[0]) & (inst[:, :, 0] < region[2])
                & (inst[:, :, 1] > region[1]) & (inst[:, :, 1] < region[3])
            )
            if not np.any(inside):
                continue
            clipped = inst.copy()
            clipped[:, :, 0] = np.clip(inst[:, :, 0], region[0], region[2])
            clipped[:, :, 1] = np.clip(inst[:, :, 1], region[1], region[3])
            # drop points that left the original polygon (redundant lines)
            kept = [q[0] for q in clipped
                    if cv2.pointPolygonTest(inst, (float(q[0, 0]), float(q[0, 1])), True) >= 0]
            if len(kept) < 3:
                continue
            clipped = np.stack(kept)[:, None]
            clipped[:, :, 0] -= region[0]
            clipped[:, :, 1] -= region[1]
            out.append(clipped)
        return out

    def image_augment(self, v, crop_coords, flip, orig_size, target_size,
                      rand_aug_idx=None, resample_mode=None):
        v = self.crop_sample(v, crop_coords)
        _, _, h, w = crop_coords
        th, tw = target_size
        scaled = []
        for inst in v:
            c = inst.copy()
            c[:, :, 0] = np.round(tw / w * c[:, :, 0])
            c[:, :, 1] = np.round(th / h * c[:, :, 1])
            scaled.append(c)
        # drop tiny instances
        kept = []
        for inst in scaled:
            min_h, min_w, max_h, max_w = self.get_bbox(inst)
            if (max_h - min_h) * (max_w - min_w) / (th * tw) >= self.bbox_area_threshold:
                kept.append(inst)
        if flip:
            flipped = []
            for inst in kept:
                c = inst.copy()
                c[:, :, 0] = tw - c[:, :, 0]
                flipped.append(c)
            kept = flipped
        return kept

    def load(self, path):
        return np.load(path, allow_pickle=True)

    def preprocess(self, sample):
        if self.max_instance_n is None or len(sample) <= self.max_instance_n:
            idx = np.arange(len(sample))
        else:
            idx = np.random.choice(len(sample), size=self.max_instance_n, replace=False)
        return [p["points"] for i, p in enumerate(sample) if i in idx]

    def postprocess(self, sample):
        import cv2

        n = self.max_instance_n if self.max_instance_n is not None else len(sample)
        masks = np.zeros((n, self.mask_size, self.mask_size), np.float32)
        bboxes = np.zeros((n, 4), np.float32)
        valid = np.full(n, False)
        for i, inst in enumerate(sample[:n]):
            bbox = self.get_bbox(inst)
            min_h, min_w, max_h, max_w = bbox
            c = inst.copy().astype(np.float64)
            c[:, :, 0] = (c[:, :, 0] - min_w) / max(max_w - min_w, 1e-6) * self.mask_size
            c[:, :, 1] = (c[:, :, 1] - min_h) / max(max_h - min_h, 1e-6) * self.mask_size
            mask = np.zeros((self.mask_size, self.mask_size), np.uint8)
            cv2.drawContours(mask, [c.astype(np.int32)], 0, 255, thickness=cv2.FILLED)
            masks[i] = mask / 255.0
            bboxes[i] = np.asarray(bbox, np.float32)
            valid[i] = True
        return {"instance": masks, "bbox": bboxes, "valid": valid}


# ---------------------------------------------------------------- registries
# (reference modality_info.py:386-427)

def default_modality_transforms() -> Dict[str, AbstractTransform]:
    return {
        "rgb": RGBTransform(imagenet_default_mean_and_std=True),
        "caption": CaptionTransform(aligned_captions=True),
        "det": DetectionTransform(det_threshold=0.6, bbox_order="dist_to_orig",
                                  coord_bins=1000, min_visibility=0.0),
        "tok_rgb": TokTransform(),
        "tok_depth": TokTransform(),
        "tok_normal": TokTransform(),
        "tok_semseg": TokTransform(),
        "tok_clip": TokTransform(),
        "t5_caption": CaptionEmbTransform(),
        "metadata": MetadataTransform(shuffle=True, random_trunc=False, return_chunks=True),
        "human_poses": HumanPoseTransform(coord_bins=1000),
        "color_palette": ColorPaletteTransform(coord_bins=1000),
        "tok_canny_edge": TokTransform(),
        "tok_sam_edge": TokTransform(),
        "tok_dinov2": TokTransform(),
        "tok_imagebind": TokTransform(),
        "tok_dinov2_global": TokTransform(),
        "tok_imagebind_global": TokTransform(),
        "sam_instance": SAMInstanceTokTransform(image_size=224, points_per_side=7, point_order="random"),
        "mask_valid": MaskTransform(mask_pool_size=1),
    }


def divae_modality_transforms() -> Dict[str, AbstractTransform]:
    return {
        "rgb": RGBTransform(imagenet_default_mean_and_std=False),
        "depth": DepthTransform(standardize_depth=True),
        "normal": NormalTransform(standardize_surface_normals=False),
        "mask_valid": MaskTransform(mask_pool_size=1),
        "semseg_coco": SemsegTransform(shift_idx_by_one=True),
        "canny_edge": RGBTransform(imagenet_default_mean_and_std=False),
        "human_poses": HumanPoseTransform(coord_bins=1000, only_pose=True),
        "sam_mask": SAMInstanceTransform(mask_size=64, max_instance_n=1),
    }
