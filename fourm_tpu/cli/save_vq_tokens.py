"""Offline dataset pre-tokenization — the bridge between tokenizers and 4M
training data (reference save_vq_tokens.py:199-402).

For every image: create-or-reuse persisted crop settings (1 center + n-1 random
crops, shared across modalities so pre-computed tokens stay aligned), tokenize all
crops in one batched device call, save int16 token arrays per sample. Host-side
sharding across processes via --num_shards/--shard_id (the reference uses
DistributedSampler; here any process-level sharding works since samples are
independent).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("VQ pre-tokenization")
    p.add_argument("--data_root", required=True)
    p.add_argument("--domain", default="rgb")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--n_crops", type=int, default=3, help="1 center + n-1 random crops")
    p.add_argument("--ckpt_dir", default=None, help="orbax checkpoint dir of the tokenizer")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--crop_settings_dir", default=None)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard_id", type=int, default=0)
    p.add_argument("--skip_existing", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--corrupt_samples_log", default=None,
                   help="path to a corrupt-samples log: failures are appended; "
                        "if the file exists, ONLY the listed sample ids are "
                        "(re-)tokenized (reference save_vq_tokens.py:98-115)")
    p.add_argument("--task", default=None,
                   help="teacher feature task: CLIP-B16, DINOv2-B14, "
                        "DINOv2-B14-global (reference save_vq_tokens.py:188-196); "
                        "default: tokenize raw pixels of --domain")
    p.add_argument("--teacher_ckpt", default=None,
                   help="teacher weights (.pth torch state dict or .safetensors)")
    return p


def make_crop_settings(rng: np.random.RandomState, orig_size, n_crops: int) -> np.ndarray:
    """1 center crop + n-1 random resized crops, persisted as (n, 5) [top, left,
    h, w, flip] (reference SaveVQDataset :138-159)."""
    from ..data.augmenters import random_resized_crop_params

    H, W = orig_size
    settings = []
    s = min(H, W)
    settings.append([(H - s) // 2, (W - s) // 2, s, s, 0])
    for _ in range(n_crops - 1):
        top, left, h, w = random_resized_crop_params(H, W, (0.8, 1.0), (1.0, 1.0))
        settings.append([top, left, h, w, int(rng.rand() < 0.5)])
    return np.asarray(settings, dtype=np.int64)


def tokenize_folder(model, variables, data_root: str, domain: str, out_dir: str,
                    input_size: int = 224, n_crops: int = 3,
                    crop_settings_dir: Optional[str] = None, batch_size: int = 16,
                    num_shards: int = 1, shard_id: int = 0,
                    skip_existing: bool = True, seed: int = 0,
                    teacher=None, corrupt_samples_log=None) -> int:
    """Tokenize every sample of root/{domain}; returns number processed."""
    import jax
    import jax.numpy as jnp

    from ..data.datasets import MultiModalDatasetFolder
    from ..data.transforms import default_modality_transforms, divae_modality_transforms

    transforms = {**divae_modality_transforms(), **{}}
    if domain not in transforms:
        transforms.update(default_modality_transforms())
    key = domain.split("@")[0]
    if key not in transforms:
        # teacher-feature tasks (CLIP-B16, DINOv2-B14, ...) load plain RGB
        # images; the teacher turns them into features (reference :270-287)
        transforms[key] = transforms["rgb"]
    ds = MultiModalDatasetFolder(data_root, [domain], transforms)
    crop_settings_dir = crop_settings_dir or os.path.join(data_root, "crop_settings")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    from ..ops.transformer import use_pallas_attention

    _tokenize = jax.jit(lambda v, x: model.apply(v, x, method="tokenize"))

    def tokenize(v, x):
        # fused attention on the encoder hot path (TPU-only; no-op on CPU).
        # The context must be active while TRACING, i.e. around the call.
        with use_pallas_attention():
            return _tokenize(v, x)

    # re-tokenize-only-corrupt flow (reference save_vq_tokens.py:98-115): when
    # the log already exists, restrict processing to the listed sample ids and
    # ignore skip_existing for them
    only_ids = None
    if corrupt_samples_log and os.path.exists(corrupt_samples_log):
        with open(corrupt_samples_log) as f:
            only_ids = {l.strip() for l in f if l.strip()}
        print(f"[retokenize] {len(only_ids)} corrupt samples from {corrupt_samples_log}")

    n_done = 0
    t = transforms[domain.split("@")[0]]
    for idx in range(shard_id, len(ds), num_shards):
        sample_id = ds.sample_ids[idx]
        out_path = os.path.join(out_dir, f"{sample_id}.npy")
        if only_ids is not None:
            if sample_id not in only_ids:
                continue
        elif skip_existing and os.path.exists(out_path):
            continue
        os.makedirs(os.path.dirname(out_path), exist_ok=True)

        try:
            img = t.load(ds.paths[domain][idx])
            img = t.preprocess(img)
            W, H = img.size
            cs_path = os.path.join(crop_settings_dir, f"{sample_id}.npy")
            if os.path.exists(cs_path):
                settings = np.load(cs_path)
            else:
                settings = make_crop_settings(rng, (H, W), n_crops)
                os.makedirs(os.path.dirname(cs_path), exist_ok=True)
                np.save(cs_path, settings)

            crops = []
            for top, left, h, w, flip in settings:
                aug = t.image_augment(img, (top, left, h, w), bool(flip), (H, W),
                                      (input_size, input_size), rand_aug_idx=None)
                crops.append(t.postprocess(aug))
            x = jnp.asarray(np.stack(crops))
            if teacher is not None:
                # CLIP/DINOv2 feature pseudo-labeling (reference :270-287): the
                # tokenizer consumes teacher FEATURE maps, not pixels
                x = teacher(x)
            tokens = np.asarray(tokenize(variables, x)).astype(np.int16)
            tokens = tokens.reshape(tokens.shape[0], -1)  # (n_crops, Hq*Wq)
            np.save(out_path, tokens)
            n_done += 1
        except Exception as e:
            print(f"[data] failed to tokenize {sample_id}: {e}")
            if corrupt_samples_log:
                with open(corrupt_samples_log, "a") as f:
                    f.write(sample_id + chr(10))
            continue
    return n_done


def main(args=None):
    import jax

    from ..utils.checkpoint import auto_resume
    from ..utils.config import parse_args_with_config
    from ..vq import VQ

    args = parse_args_with_config(get_parser(), args)
    teacher = None
    n_channels = 3
    if args.task:
        from ..vq.teachers import TEACHER_PRESETS, get_feature_extractor

        teacher = get_feature_extractor(args.task, args.teacher_ckpt, args.input_size)
        n_channels = TEACHER_PRESETS[args.task]["width"]
    # encoder-only tokenizer (reference get_image_tokenizer(encoder_only=True))
    model = VQ(image_size=args.input_size, n_channels=n_channels,
               patch_proj=args.task is None)
    if args.ckpt_dir is None:
        raise SystemExit("--ckpt_dir with trained tokenizer weights is required")
    import jax.numpy as jnp

    if teacher is not None:
        x0 = teacher(jnp.zeros((1, args.input_size, args.input_size, 3)))
    else:
        x0 = jnp.zeros((1, args.input_size, args.input_size, 3))
    variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x0)
    restored, step = auto_resume(args.ckpt_dir, {"params": variables["params"],
                                                 "codebook": variables["codebook"]})
    if restored is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    variables = restored
    t0 = time.time()
    n = tokenize_folder(
        model, variables, args.data_root, args.domain, args.out_dir,
        input_size=args.input_size, n_crops=args.n_crops,
        crop_settings_dir=args.crop_settings_dir, batch_size=args.batch_size,
        num_shards=args.num_shards, shard_id=args.shard_id,
        skip_existing=args.skip_existing, seed=args.seed, teacher=teacher,
        corrupt_samples_log=args.corrupt_samples_log,
    )
    print(f"tokenized {n} samples in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
