"""InceptionV3 feature extractor for reference-comparable FID / InceptionScore.

The reference evaluates tokenizers with torchmetrics FrechetInceptionDistance /
InceptionScore (run_training_vqvae.py:47-53,1427-1640), which run the
pt_inception-2015-12-05 ("FID variant") InceptionV3. This module re-implements
that architecture in flax (NHWC) with a mechanical torch-state-dict import, the
same pattern proven for VGG16/LPIPS (vq/percept_losses.py) and CLIP
(vq/teachers.py).

FID-variant differences from stock torchvision inception_v3 (pytorch-fid /
torch-fidelity, which torchmetrics wraps):
  * average-pool branches use count_include_pad=False (InceptionA/C and
    Mixed_7b / InceptionE_1);
  * Mixed_7c (InceptionE_2) uses MAX pooling in its pool branch;
  * the final fc has 1008 classes (original TF checkpoint).
Both variants are supported via `fid_variant`; the parity tests exercise the
exact eval-mode BatchNorm (folded to scale/bias), padding, and pooling
conventions against a live torch mirror with shared random weights.

Weights policy: no network in this environment — architectures init randomly
and `import_inception_state` loads the torch checkpoint when provided
(pt_inception-2015-12-05-6726825d.pth, the file torchmetrics downloads).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


def _avg_pool_3x3(x: jnp.ndarray, count_include_pad: bool) -> jnp.ndarray:
    """3x3 stride-1 pad-1 average pool, NHWC. count_include_pad=False divides by
    the number of in-bounds window elements (torch F.avg_pool2d semantics)."""
    window = (1, 3, 3, 1)
    strides = (1, 1, 1, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    if count_include_pad:
        return sums / 9.0
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, pads)
    return sums / counts


def _max_pool(x: jnp.ndarray, k: int, stride: int, pad: int = 0) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


class BasicConv2d(nn.Module):
    """Conv(no bias) + eval-mode BatchNorm folded to per-channel scale/bias +
    ReLU (torchvision BasicConv2d; BN eps=1e-3). The import path computes
    scale = gamma/sqrt(var+eps), bias = beta - mean*scale — exact in eval mode."""

    out_ch: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_ch, self.kernel, strides=(self.stride, self.stride),
            padding=(self.padding, self.padding) if isinstance(self.padding, int)
            else ((self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])),
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        return nn.relu(x * scale.astype(x.dtype) + bias.astype(x.dtype))


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=self.dtype, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=self.dtype, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pool branch: "avg" (Mixed_7b / FIDInceptionE_1, count_include_pad=False)
    # or "max" (Mixed_7c / FIDInceptionE_2)
    pool_mode: str = "avg"
    fid_variant: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max" and self.fid_variant:
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool_3x3(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """InceptionV3 trunk producing (features_2048, logits). NHWC input, already
    resized to 299x299 and scaled to [-1, 1] (use `preprocess`)."""

    num_classes: int = 1008  # FID checkpoint; torchvision uses 1000
    fid_variant: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dt = self.dtype
        x = BasicConv2d(32, (3, 3), stride=2, dtype=dt, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=dt, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=dt, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), dtype=dt, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=dt, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, self.fid_variant, dt, name="Mixed_5b")(x)
        x = InceptionA(64, self.fid_variant, dt, name="Mixed_5c")(x)
        x = InceptionA(64, self.fid_variant, dt, name="Mixed_5d")(x)
        x = InceptionB(dt, name="Mixed_6a")(x)
        x = InceptionC(128, self.fid_variant, dt, name="Mixed_6b")(x)
        x = InceptionC(160, self.fid_variant, dt, name="Mixed_6c")(x)
        x = InceptionC(160, self.fid_variant, dt, name="Mixed_6d")(x)
        x = InceptionC(192, self.fid_variant, dt, name="Mixed_6e")(x)
        x = InceptionD(dt, name="Mixed_7a")(x)
        x = InceptionE("avg", self.fid_variant, dt, name="Mixed_7b")(x)
        x = InceptionE("max", self.fid_variant, dt, name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        logits = nn.Dense(self.num_classes, dtype=dt, name="fc")(feats)
        return feats, logits


def preprocess(images: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """Images NHWC in [0, 1] (any resolution) -> 299x299 in [-1, 1], bilinear
    (torch-fidelity resizes before the trunk; exact TF-style resize differs at
    sub-pixel level — documented tolerance, not bit parity)."""
    B, H, W, C = images.shape
    if (H, W) != (size, size):
        images = jax.image.resize(images, (B, size, size, C), method="bilinear")
    return images * 2.0 - 1.0


def import_inception_state(state_dict: dict, variables: dict) -> dict:
    """Map a torch InceptionV3 state dict (torchvision / pytorch-fid
    pt_inception-2015-12-05 naming: <block>.<branch>.conv.weight +
    <block>.<branch>.bn.{weight,bias,running_mean,running_var}, fc.{weight,bias})
    into this module's variables. BN is folded to scale/bias (eval-mode exact)."""
    params = jax.tree.map(np.asarray, variables["params"])
    eps = 1e-3

    def fold(prefix, tree):
        w = np.asarray(state_dict[f"{prefix}.conv.weight"], np.float32)
        gamma = np.asarray(state_dict[f"{prefix}.bn.weight"], np.float32)
        beta = np.asarray(state_dict[f"{prefix}.bn.bias"], np.float32)
        mean = np.asarray(state_dict[f"{prefix}.bn.running_mean"], np.float32)
        var = np.asarray(state_dict[f"{prefix}.bn.running_var"], np.float32)
        scale = gamma / np.sqrt(var + eps)
        tree["conv"]["kernel"] = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        tree["bn_scale"] = scale
        tree["bn_bias"] = beta - mean * scale

    def walk(tree, prefix=""):
        for name, sub in tree.items():
            full = f"{prefix}.{name}" if prefix else name
            if isinstance(sub, dict) and "bn_scale" in sub:
                fold(full, sub)
            elif isinstance(sub, dict) and name != "fc":
                walk(sub, full)

    walk(params)
    if "fc.weight" in state_dict:
        params["fc"]["kernel"] = np.transpose(
            np.asarray(state_dict["fc.weight"], np.float32))
        params["fc"]["bias"] = np.asarray(state_dict["fc.bias"], np.float32)
    return {"params": jax.tree.map(jnp.asarray, params)}


def load_inception(path: Optional[str] = None, fid_variant: bool = True):
    """Build InceptionV3 (+ load the pt_inception torch checkpoint if given).
    Returns (module, variables)."""
    model = InceptionV3(fid_variant=fid_variant)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    if path is not None:
        if path.endswith(".safetensors"):
            from safetensors.numpy import load_file

            state = load_file(path)
        elif path.endswith(".npz"):
            state = dict(np.load(path))
        else:  # torch .pth
            import torch

            state = {k: v.numpy() for k, v in torch.load(
                path, map_location="cpu", weights_only=True).items()}
        variables = import_inception_state(state, variables)
    return model, variables


def inception_features_and_probs(model, variables, images_01_nhwc,
                                 batch_size: int = 32):
    """Helper for FID/IS evaluation loops: chunked forward over images in
    [0, 1], returns (features (N, 2048) np, probs (N, num_classes) np)."""
    fwd = jax.jit(lambda v, x: model.apply(v, preprocess(x)))
    feats, probs = [], []
    n = images_01_nhwc.shape[0]
    for i in range(0, n, batch_size):
        f, l = fwd(variables, jnp.asarray(images_01_nhwc[i : i + batch_size]))
        feats.append(np.asarray(f))
        probs.append(np.asarray(jax.nn.softmax(l, axis=-1)))
    return np.concatenate(feats), np.concatenate(probs)
