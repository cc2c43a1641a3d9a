"""Perceptual losses + tokenizer evaluation metrics, TPU-native.

Re-implements the architecture of the reference perceptual-loss stack
(fourm/vq/percept_losses/lpips.py:66-140 and timm_perceptual_loss.py:25-110)
and the quantitative tokenizer-eval metrics the reference pulls from
torchmetrics (run_training_vqvae.py:1427-1640: FID, InceptionScore, MS-SSIM).

Weights policy (this build has no network access): the VGG16/LPIPS modules are
full architectures with a torch-state-dict import path (`import_lpips_state`);
random init keeps the math unit-testable; pretrained values load when a
checkpoint file is provided. MS-SSIM / FID / IS are pure math and need no
weights (FID/IS take features/logits from ANY provided extractor).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg16.features conv indices grouped by LPIPS slice
VGG16_SLICES: Tuple[Tuple[int, ...], ...] = (
    (0, 2),            # relu1_2
    (5, 7),            # relu2_2
    (10, 12, 14),      # relu3_3
    (17, 19, 21),      # relu4_3
    (24, 26, 28),      # relu5_3
)
VGG16_CHANNELS = (64, 128, 256, 512, 512)

# LPIPS input scaling constants (reference lpips.py ScalingLayer)
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 feature slices at the 5 LPIPS taps (reference lpips.py vgg16).
    Input NHWC. Conv params named `features_{i}` after the torchvision
    `features` index so the pretrained import is mechanical."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        outs = []
        for slice_idx, conv_ids in enumerate(VGG16_SLICES):
            ch = VGG16_CHANNELS[slice_idx]
            if slice_idx > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci in conv_ids:
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"features_{ci}")(x)
                x = nn.relu(x)
            outs.append(x)
        return outs


def _normalize_channels(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Unit-normalize the channel axis (reference normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Learned perceptual metric (reference lpips.py:66-110), NHWC inputs in
    [-1, 1]. lin layers are 1x1 bias-free convs named lin0..lin4."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.net = VGG16Features(dtype=self.dtype, name="net")
        self.lins = [
            nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}")
            for i in range(len(VGG16_CHANNELS))
        ]

    def __call__(self, input, target) -> jnp.ndarray:
        shift = jnp.asarray(_LPIPS_SHIFT, self.dtype)
        scale = jnp.asarray(_LPIPS_SCALE, self.dtype)
        f0 = self.net((input.astype(self.dtype) - shift) / scale)
        f1 = self.net((target.astype(self.dtype) - shift) / scale)
        val = 0.0
        for lin, a, b in zip(self.lins, f0, f1):
            diff = jnp.square(_normalize_channels(a) - _normalize_channels(b))
            val = val + jnp.mean(lin(diff), axis=(1, 2, 3))
        return val  # (B,)


def import_lpips_state(state_dict: dict, variables: dict) -> dict:
    """Map the reference LPIPS torch state dict (taming-transformers vgg.pth
    layout: net.slice{k}.{i}.weight, lin{j}.model.1.weight) into our variables."""
    out = jax.tree.map(lambda v: v, variables)
    params = out["params"]
    slice_of = {}
    for k, conv_ids in enumerate(VGG16_SLICES):
        for ci in conv_ids:
            slice_of[ci] = k + 1
    for ci, k in slice_of.items():
        w = np.asarray(state_dict[f"net.slice{k}.{ci}.weight"], np.float32)
        b = np.asarray(state_dict[f"net.slice{k}.{ci}.bias"], np.float32)
        params["net"][f"features_{ci}"]["kernel"] = jnp.asarray(
            np.transpose(w, (2, 3, 1, 0)))
        params["net"][f"features_{ci}"]["bias"] = jnp.asarray(b)
    for j in range(5):
        w = np.asarray(state_dict[f"lin{j}.model.1.weight"], np.float32)
        params[f"lin{j}"]["kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    return out


def load_lpips(path: str, image_size: int = 224):
    """Build an LPIPS module + variables from a safetensors/npz checkpoint of
    the reference torch state dict. Returns (module, variables)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
    else:
        state = dict(np.load(path))
    model = LPIPS()
    x = jnp.zeros((1, image_size, image_size, 3))
    variables = model.init(jax.random.key(0), x, x)
    return model, import_lpips_state(state, variables)


def feature_perceptual_loss(
    feats_pred: Sequence[jnp.ndarray],
    feats_target: Sequence[jnp.ndarray],
    feature_loss: str = "cosine",
) -> jnp.ndarray:
    """Distance over arbitrary feature lists (reference TimmPerceptualLoss
    forward, timm_perceptual_loss.py:63-110). Features (B, N, C) or NHWC."""
    loss = 0.0
    for fp, ft in zip(feats_pred, feats_target):
        if fp.ndim == 4:
            fp = fp.reshape(fp.shape[0], -1, fp.shape[-1])
            ft = ft.reshape(ft.shape[0], -1, ft.shape[-1])
        if feature_loss in ("l1", "mae"):
            fp = _normalize_channels(fp)
            ft = _normalize_channels(ft)
            loss = loss + jnp.abs(fp - ft).sum(-1).mean(-1)
        elif feature_loss in ("cosine", "cos"):
            cos = jnp.sum(_normalize_channels(fp) * _normalize_channels(ft), axis=-1)
            loss = loss + (1.0 - cos.mean(axis=-1))
        else:
            raise ValueError(f"unknown feature loss {feature_loss}")
    return jnp.mean(loss)


# ----------------------------------------------------------------- metrics


def ms_ssim(
    img1: np.ndarray,
    img2: np.ndarray,
    data_range: float = 2.0,
    weights: Sequence[float] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
) -> float:
    """Multi-scale SSIM (Wang et al. 2003) — pure numpy, NHWC, replaces
    torchmetrics MS-SSIM in the reference eval (run_training_vqvae.py:1485)."""
    def gaussian_kernel(size=11, sigma=1.5):
        g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
        g /= g.sum()
        return np.outer(g, g)

    def filt(x, k):
        from scipy.signal import convolve2d

        out = np.stack([
            np.stack([convolve2d(x[b, :, :, c], k, mode="valid")
                      for c in range(x.shape[-1])], axis=-1)
            for b in range(x.shape[0])
        ])
        return out

    def ssim_pair(a, b):
        k = gaussian_kernel()
        C1 = (0.01 * data_range) ** 2
        C2 = (0.03 * data_range) ** 2
        mu1, mu2 = filt(a, k), filt(b, k)
        s11 = filt(a * a, k) - mu1 * mu1
        s22 = filt(b * b, k) - mu2 * mu2
        s12 = filt(a * b, k) - mu1 * mu2
        cs = (2 * s12 + C2) / (s11 + s22 + C2)
        ssim = ((2 * mu1 * mu2 + C1) / (mu1**2 + mu2**2 + C1)) * cs
        return float(ssim.mean()), float(cs.mean())

    a = np.asarray(img1, np.float64)
    b = np.asarray(img2, np.float64)
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = ssim_pair(a, b)
        vals.append(s if i == levels - 1 else cs)
        if i != levels - 1:
            a = a[:, : a.shape[1] // 2 * 2, : a.shape[2] // 2 * 2]
            b = b[:, : b.shape[1] // 2 * 2, : b.shape[2] // 2 * 2]
            a = (a[:, ::2, ::2] + a[:, 1::2, ::2] + a[:, ::2, 1::2] + a[:, 1::2, 1::2]) / 4
            b = (b[:, ::2, ::2] + b[:, 1::2, ::2] + b[:, ::2, 1::2] + b[:, 1::2, 1::2]) / 4
    vals = np.clip(np.asarray(vals), 1e-8, None)
    return float(np.prod(vals ** np.asarray(weights)))


def frechet_distance(feats_real: np.ndarray, feats_fake: np.ndarray,
                     eps: float = 1e-6) -> float:
    """FID over ANY feature space (reference uses torchmetrics
    FrechetInceptionDistance; the Frechet math is identical, the feature
    extractor is pluggable — vq.inception.InceptionV3 is the
    reference-comparable default). Small-sample covariances are near-singular;
    the standard eps*I regularization (pytorch-fid calculate_frechet_distance)
    keeps sqrtm well-conditioned and warning-free."""
    from scipy import linalg

    import warnings

    mu1, mu2 = feats_real.mean(0), feats_fake.mean(0)
    s1 = np.cov(feats_real, rowvar=False)
    s2 = np.cov(feats_fake, rowvar=False)
    diff = mu1 - mu2
    with warnings.catch_warnings():
        # sqrtm warns (LinAlgWarning) on near-singular products before we can
        # regularize; the eps*I retry below is the canonical fix
        warnings.simplefilter("ignore")
        covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(s1.shape[0]) * eps
            covmean, _ = linalg.sqrtm((s1 + offset) @ (s2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def inception_score(probs: np.ndarray, splits: int = 10) -> Tuple[float, float]:
    """IS from class probabilities (reference torchmetrics InceptionScore)."""
    scores = []
    n = probs.shape[0]
    for i in range(splits):
        part = probs[i * n // splits: (i + 1) * n // splits]
        if len(part) == 0:
            continue
        py = part.mean(0, keepdims=True)
        kl = part * (np.log(part + 1e-10) - np.log(py + 1e-10))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def binary_iou(pred: np.ndarray, target: np.ndarray, threshold: float = 0.5) -> float:
    """Binary IoU (reference torchmetrics BinaryJaccardIndex for mask eval)."""
    p = np.asarray(pred) > threshold
    t = np.asarray(target) > threshold
    inter = np.logical_and(p, t).sum()
    union = np.logical_or(p, t).sum()
    return float(inter / union) if union else 1.0
