"""VQ tokenizer training CLI: VQVAE (feed-forward decoder) and DiVAE (diffusion
decoder) in one SPMD path — the TPU equivalent of reference run_training_vqvae.py
/ run_training_divae.py.

Carried over: reconstruction losses mse/l1/smooth_l1/cross_entropy/cosine/binary
(:961-1003), codebook loss weighting, DiVAE noise/timestep sampling with
sample/epsilon/v_prediction targets (:964-990), SDXL orig-res conditioning, EMA
model of params, periodic eval with PSNR/MSE/MAE + codebook-usage histograms
(:1427-1640; FID/IS/LPIPS require pretrained torch nets and are gated out in this
offline build), k-means codebook init from the first batch.
"""

from __future__ import annotations

import argparse
import math
import os
import time
from functools import partial
from typing import Dict, Optional

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("VQ tokenizer training")
    p.add_argument("--model_type", default="vqvae", choices=["vqvae", "divae"])
    p.add_argument("--domain", default="rgb", help="modality to tokenize")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--input_size_min", type=int, default=None,
                   help="multi-resolution training: min size (reference :108-112)")
    p.add_argument("--input_size_max", type=int, default=None)
    p.add_argument("--resolution_step", type=int, default=32)
    p.add_argument("--n_channels", type=int, default=3)
    p.add_argument("--n_labels", type=int, default=None, help="semseg class count")
    p.add_argument("--enc_type", default="vit_b_enc")
    p.add_argument("--dec_type", default=None, help="default: vit_b_dec / uvit_b_p4_f16")
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--patch_proj", action="store_true", default=True)
    p.add_argument("--post_mlp", action="store_true")
    p.add_argument("--codebook_size", type=int, default=16384)
    p.add_argument("--num_codebooks", type=int, default=1)
    p.add_argument("--latent_dim", type=int, default=32)
    p.add_argument("--norm_codes", action="store_true", default=True)
    p.add_argument("--ema_decay", type=float, default=0.99)
    p.add_argument("--threshold_ema_dead_code", type=float, default=0.25)
    p.add_argument("--code_replacement_policy", default="batch_random",
                   choices=["batch_random", "linde_buzo_gray"])
    p.add_argument("--commitment_weight", type=float, default=1.0)
    p.add_argument("--codebook_weight", type=float, default=1.0)
    p.add_argument("--kmeans_init", action="store_true")
    p.add_argument("--freeze_enc", action="store_true",
                   help="freeze the encoder (reference frozenenc recipes)")
    p.add_argument("--quantizer_ema_decay", type=float, default=None)
    # losses
    p.add_argument("--loss_fn", default="mse",
                   choices=["mse", "l1", "smooth_l1", "cross_entropy", "cosine", "binary"])
    p.add_argument("--percept_loss_weight", type=float, default=0.0,
                   help="LPIPS perceptual loss weight (reference :413-431)")
    p.add_argument("--percept_loss_ckpt", default=None,
                   help="LPIPS weights (.safetensors/.npz of the reference torch "
                        "state dict); random init + warning when absent")
    p.add_argument("--fid_extractor", default="inception",
                   choices=["inception", "vgg", "none"],
                   help="FID feature extractor for eval: InceptionV3 (reference-"
                        "comparable, run_training_vqvae.py:47-53) or VGG pool5")
    p.add_argument("--fid_ckpt", default=None,
                   help="InceptionV3 weights (pt_inception .pth / .safetensors/"
                        ".npz); random init + warning when absent")
    # divae
    p.add_argument("--num_train_timesteps", type=int, default=1000)
    p.add_argument("--beta_schedule", default="squaredcos_cap_v2")
    p.add_argument("--prediction_type", default="v_prediction",
                   choices=["sample", "epsilon", "v_prediction"])
    p.add_argument("--cls_free_guidance_dropout", type=float, default=0.0)
    p.add_argument("--masked_cfg", action="store_true")
    p.add_argument("--zero_terminal_snr", action="store_true", default=True)
    # optimization
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--blr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--model_ema", action="store_true")
    p.add_argument("--model_ema_decay", type=float, default=0.9999)
    p.add_argument("--dtype", default="bfloat16")
    # data
    p.add_argument("--data_path", default=None)
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--mask_value", type=float, default=None)
    # misc
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--output_dir", default="out/train_vq")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_freq", type=int, default=500)
    p.add_argument("--save_ckpt_freq", type=int, default=1000)
    p.add_argument("--print_freq", type=int, default=50)
    return p


def compute_reconst_loss(pred, target, loss_fn: str):
    """Reference run_training_vqvae.py:961-1003, channel-last jnp."""
    import jax.numpy as jnp
    import jax

    if loss_fn == "mse":
        return jnp.mean(jnp.square(pred - target))
    if loss_fn == "l1":
        return jnp.mean(jnp.abs(pred - target))
    if loss_fn == "smooth_l1":
        d = jnp.abs(pred - target)
        return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
    if loss_fn == "cross_entropy":  # semseg: pred (B,H,W,L), target (B,H,W) ints
        logp = jax.nn.log_softmax(pred, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1))
    if loss_fn == "cosine":
        pn = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-8)
        tn = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-8)
        return jnp.mean(1.0 - jnp.sum(pn * tn, axis=-1))
    if loss_fn == "binary":
        logp = jax.nn.log_sigmoid(pred)
        lognp = jax.nn.log_sigmoid(-pred)
        return -jnp.mean(target * logp + (1 - target) * lognp)
    raise ValueError(loss_fn)


def eval_metrics(pred: np.ndarray, target: np.ndarray, tokens: np.ndarray,
                 codebook_size: int) -> Dict[str, float]:
    """PSNR / MSE / MAE + codebook usage (reference :1427-1640 subset)."""
    mse = float(np.mean((pred - target) ** 2))
    mae = float(np.mean(np.abs(pred - target)))
    rng = float(target.max() - target.min() + 1e-8)
    psnr = 10 * math.log10(rng**2 / max(mse, 1e-12))
    usage = len(np.unique(tokens)) / codebook_size
    return {"mse": mse, "mae": mae, "psnr": psnr, "codebook_usage": usage}


def main(args=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..parallel.mesh import batch_sharding, fsdp_sharding_for, make_mesh, replicated
    from ..utils.checkpoint import save_checkpoint
    from ..utils.config import parse_args_with_config
    from ..utils.logger import JSONLLogger
    from ..utils.optim import cosine_schedule, create_optimizer
    from ..vq import VQVAE, DiVAE

    args = parse_args_with_config(get_parser(), args)
    os.makedirs(args.output_dir, exist_ok=True)

    common = dict(
        image_size=args.input_size, n_channels=args.n_channels, n_labels=args.n_labels,
        enc_type=args.enc_type, patch_proj=args.patch_proj, post_mlp=args.post_mlp,
        patch_size=args.patch_size, codebook_size=args.codebook_size,
        num_codebooks=args.num_codebooks, latent_dim=args.latent_dim,
        norm_codes=args.norm_codes, ema_decay=args.ema_decay,
        threshold_ema_dead_code=args.threshold_ema_dead_code,
        code_replacement_policy=args.code_replacement_policy,
        commitment_weight=args.commitment_weight, kmeans_init=args.kmeans_init,
        freeze_enc=args.freeze_enc, dtype=args.dtype,
    )
    is_divae = args.model_type == "divae"
    if is_divae:
        model = DiVAE(
            dec_type=args.dec_type or "uvit_b_p4_f16",
            num_train_timesteps=args.num_train_timesteps,
            beta_schedule=args.beta_schedule, prediction_type=args.prediction_type,
            cls_free_guidance_dropout=args.cls_free_guidance_dropout,
            masked_cfg=args.masked_cfg, zero_terminal_snr=args.zero_terminal_snr,
            **common,
        )
        scheduler = model.noise_scheduler()
    else:
        model = VQVAE(dec_type=args.dec_type or "vit_b_dec", **common)
        scheduler = None

    # data (synthetic fallback; folder datasets via data/ as they are tokenizer-
    # training images, i.e. plain {rgb, depth, ...} folders)
    rng_np = np.random.RandomState(args.seed)
    S, C = args.input_size, args.n_channels
    # multi-resolution per-batch size sampling (reference run_training_vqvae.py
    # :108-112 / run_training_divae.py:958-961: hash(it) % choices). Each size
    # is its own compiled program; the choice per step is deterministic.
    if args.input_size_min and args.input_size_max:
        res_choices = list(range(args.input_size_min, args.input_size_max + 1,
                                 args.resolution_step))
    else:
        res_choices = [args.input_size]

    def res_for_step(step: int) -> int:
        return res_choices[hash(str(step)) % len(res_choices)]

    def synthetic_batch(size):
        if args.n_labels is not None:
            return rng_np.randint(0, args.n_labels, (args.batch_size, size, size)).astype(np.int32)
        return rng_np.rand(args.batch_size, size, size, C).astype(np.float32) * 2 - 1

    def synthetic_batches():
        step = 0
        while True:
            yield synthetic_batch(res_for_step(step))
            step += 1

    if args.synthetic_data or args.data_path is None:
        loader = synthetic_batches()
    else:
        from PIL import Image

        from ..data.datasets import MultiModalDatasetFolder, repeat_dataset
        from ..data.augmenters import RandomCropImageAugmenter
        from ..data.transforms import UnifiedDataTransform, divae_modality_transforms

        transforms = divae_modality_transforms()
        aug = RandomCropImageAugmenter(target_size=args.input_size, main_domain=args.domain)
        unified = UnifiedDataTransform(transforms, aug)
        ds = MultiModalDatasetFolder(args.data_path, [args.domain], transforms, transform=unified)
        sample_iter = repeat_dataset(ds)

        def folder_batches():
            while True:
                batch = [next(sample_iter)[args.domain] for _ in range(args.batch_size)]
                yield np.stack(batch)

        loader = folder_batches()

    mesh = make_mesh(data=-1, fsdp=args.fsdp)
    x0 = jnp.asarray(next(loader))
    rngs = {"params": jax.random.key(args.seed), "rng": jax.random.key(args.seed + 1)}
    if is_divae:
        variables = model.init(rngs, x0, jnp.zeros_like(x0, shape=x0.shape[:1] + (S, S, C)),
                               jnp.zeros((x0.shape[0],), jnp.int32))
    else:
        variables = model.init(rngs, x0)
    params = {"params": variables["params"]}
    codebook = {"codebook": variables["codebook"]}

    lr = args.blr * args.batch_size * len(jax.devices()) / 256.0
    sched = cosine_schedule(lr, args.total_steps, args.warmup_steps)
    tx = create_optimizer(params, sched, weight_decay=args.weight_decay,
                          clip_grad=args.clip_grad)
    opt_state = tx.init(params)
    ema_params = jax.tree.map(jnp.copy, params) if args.model_ema else None

    loss_fn_name = args.loss_fn

    # LPIPS perceptual loss (reference run_training_vqvae.py:413-431) — only
    # meaningful for image-space reconstructions
    lpips_model, lpips_vars = None, None
    if args.percept_loss_weight > 0 and args.n_labels is None:
        from ..vq.percept_losses import LPIPS, load_lpips

        if args.percept_loss_ckpt:
            lpips_model, lpips_vars = load_lpips(args.percept_loss_ckpt, args.input_size)
            print(f"[lpips] loaded weights from {args.percept_loss_ckpt}")
        else:
            lpips_model = LPIPS()
            xx = jnp.zeros((1, args.input_size, args.input_size, C))
            lpips_vars = lpips_model.init(jax.random.key(7), xx, xx)
            print("[lpips] WARNING: no --percept_loss_ckpt; using RANDOM VGG "
                  "weights (architecture-only mode, not a trained metric)")

    # InceptionV3 FID/IS extractor (reference run_training_vqvae.py:47-53 uses
    # torchmetrics FID/InceptionScore over InceptionV3) — built lazily at first
    # eval so training-only runs never pay for it
    _fid_state = {}

    def get_fid_extractor():
        if args.fid_extractor != "inception" or args.n_labels is not None:
            return None
        if "model" not in _fid_state:
            from ..vq.inception import load_inception

            _fid_state["model"], _fid_state["vars"] = load_inception(args.fid_ckpt)
            if args.fid_ckpt:
                print(f"[fid] InceptionV3 weights from {args.fid_ckpt}")
            else:
                print("[fid] WARNING: no --fid_ckpt; InceptionV3 runs with RANDOM "
                      "weights (pipeline exercise only, not a comparable FID)")
        return _fid_state["model"], _fid_state["vars"]

    def train_step(params, codebook, opt_state, batch, rng):
        rng_noise, rng_t, rng_q = jax.random.split(rng, 3)

        def loss(p):
            if is_divae:
                noise = jax.random.normal(rng_noise, batch.shape, jnp.float32)
                t = jax.random.randint(rng_t, (batch.shape[0],), 0, args.num_train_timesteps)
                noised = scheduler.add_noise(batch, noise, t)
                (pred, code_loss), mut = model.apply(
                    {**p, **codebook}, batch, noised, t, train=True,
                    mutable=["codebook"], rngs={"rng": rng_q},
                )
                if args.prediction_type == "v_prediction":
                    target = scheduler.get_velocity(batch, noise, t)
                elif args.prediction_type == "epsilon":
                    target = noise
                else:
                    target = batch
                rec = compute_reconst_loss(pred.astype(jnp.float32), target, loss_fn_name)
            else:
                (pred, code_loss), mut = model.apply(
                    {**p, **codebook}, batch, train=True,
                    mutable=["codebook"], rngs={"rng": rng_q},
                )
                rec = compute_reconst_loss(pred.astype(jnp.float32),
                                           batch if args.n_labels is None else batch,
                                           loss_fn_name)
            total = rec + args.codebook_weight * code_loss
            if lpips_model is not None and (
                not is_divae or args.prediction_type == "sample"
            ):
                total = total + args.percept_loss_weight * jnp.mean(
                    lpips_model.apply(lpips_vars, pred.astype(jnp.float32),
                                      batch.astype(jnp.float32))
                )
            return total, (rec, code_loss, mut)

        (total, (rec, code_loss, mut)), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, {"codebook": mut["codebook"]}, opt_state, total, rec, code_loss

    jitted = jax.jit(train_step, donate_argnums=(0, 1, 2))
    jsonl = JSONLLogger(args.output_dir)
    rng = jax.random.key(args.seed + 2)
    t0 = time.time()
    for step in range(args.total_steps):
        batch = jnp.asarray(next(loader))
        rng, r = jax.random.split(rng)
        params, codebook, opt_state, total, rec, code_loss = jitted(
            params, codebook, opt_state, batch, r
        )
        if args.model_ema:
            d = args.model_ema_decay
            ema_params = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema_params, params)
        if step % args.print_freq == 0 or step == args.total_steps - 1:
            total_f = float(total)
            sps = args.batch_size * args.print_freq / max(time.time() - t0, 1e-6)
            t0 = time.time()
            print(f"step {step}/{args.total_steps} loss {total_f:.4f} rec {float(rec):.4f} "
                  f"code {float(code_loss):.4f} samples/s {sps:.1f}", flush=True)
            jsonl.write({"step": step, "loss": total_f, "rec": float(rec),
                         "code_loss": float(code_loss)})
        if (step + 1) % args.eval_freq == 0 and not is_divae:
            tokens = model.apply({**params, **codebook}, batch, method="tokenize")
            recimg = model.apply({**params, **codebook}, batch, method="autoencode")
            pred_np, tgt_np = np.asarray(recimg, np.float32), np.asarray(batch, np.float32)
            m = eval_metrics(pred_np, tgt_np, np.asarray(tokens), args.codebook_size)
            if args.n_labels is None and pred_np.shape[-1] == 3:
                from ..vq.percept_losses import (
                    frechet_distance,
                    inception_score,
                    ms_ssim,
                )

                m["ms_ssim"] = ms_ssim(pred_np, tgt_np)
                if lpips_model is not None:
                    m["lpips"] = float(np.mean(np.asarray(lpips_model.apply(
                        lpips_vars, jnp.asarray(pred_np), jnp.asarray(tgt_np)))))
                fid_ext = get_fid_extractor()
                if fid_ext is not None and pred_np.shape[0] > 1:
                    # reference-comparable FID/IS: InceptionV3 features/probs
                    # (run_training_vqvae.py:1427-1640); images -> [0, 1]
                    from ..vq.inception import inception_features_and_probs

                    fm_model, fm_vars = fid_ext
                    lo, hi = tgt_np.min(), tgt_np.max()
                    scale = (hi - lo) or 1.0
                    fp_, pp_ = inception_features_and_probs(
                        fm_model, fm_vars, (pred_np - lo) / scale)
                    ft_, _ = inception_features_and_probs(
                        fm_model, fm_vars, (tgt_np - lo) / scale)
                    m["fid"] = frechet_distance(ft_, fp_)
                    m["inception_score"] = inception_score(pp_, splits=1)[0]
                elif args.fid_extractor == "vgg" and lpips_model is not None \
                        and pred_np.shape[0] > 1:
                    # FID over VGG pool features (Frechet math identical; NOT
                    # comparable to published InceptionV3 FID numbers)
                    feats = lpips_model.apply(lpips_vars, jnp.asarray(pred_np),
                                              method=lambda mdl, x: mdl.net(x))
                    feats_t = lpips_model.apply(lpips_vars, jnp.asarray(tgt_np),
                                                method=lambda mdl, x: mdl.net(x))
                    fp_ = np.asarray(feats[-1].mean(axis=(1, 2)))
                    ft_ = np.asarray(feats_t[-1].mean(axis=(1, 2)))
                    m["vgg_fid"] = frechet_distance(ft_, fp_)
            print(f"[eval] {m}", flush=True)
            jsonl.write({"step": step, **{f"eval_{k}": v for k, v in m.items()}})
        if (step + 1) % args.save_ckpt_freq == 0 or step == args.total_steps - 1:
            state = {"params": params, "codebook": codebook, "opt_state": opt_state}
            if args.model_ema:
                state["ema_params"] = ema_params
            save_checkpoint(os.path.join(args.output_dir, "checkpoints"), state, step + 1)

    print("tokenizer training done")
    return params, codebook


if __name__ == "__main__":
    main()
