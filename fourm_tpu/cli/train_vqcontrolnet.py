"""VQControlNet detokenizer training CLI — TPU equivalent of the reference
run_training_vqcontrolnet.py (SD 1.5 backbone + trainable ControlNet branch,
PNDM schedule, VAE-latent targets).

Weights-optional: the base UNet / VAE are random-init flax stand-ins of the SD
architecture family; only the ControlNet branch receives gradients (reference
controlnet.py:223-228 freeze_params + vqvae.py:1045 _freeze_vae), enforced with
the same trainable-mask machinery as the 4M frozen warm-start phase.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("VQControlNet training")
    p.add_argument("--domain", default="rgb")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--n_channels", type=int, default=3)
    p.add_argument("--enc_type", default="vit_b_enc")
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--codebook_size", type=int, default=16384)
    p.add_argument("--latent_dim", type=int, default=32)
    p.add_argument("--freeze_enc", action="store_true", default=True,
                   help="freeze the pretrained VQ encoder (reference default)")
    # ControlNet / SD scale
    p.add_argument("--model_channels", type=int, default=320)
    p.add_argument("--num_res_blocks", type=int, default=2)
    p.add_argument("--channel_mult", type=int, nargs="+", default=[1, 2, 4, 4])
    p.add_argument("--attention_levels", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--context_len", type=int, default=77)
    p.add_argument("--context_dim", type=int, default=768)
    p.add_argument("--vae_base_channels", type=int, default=128)
    p.add_argument("--vae_ch_mult", type=int, nargs="+", default=[1, 2, 4, 4])
    p.add_argument("--init_controlnet_from_unet", action="store_true", default=True,
                   help="copy base-UNet encoder weights into the ControlNet branch "
                        "(diffusers ControlNetModel.from_unet)")
    # diffusion
    p.add_argument("--num_train_timesteps", type=int, default=1000)
    p.add_argument("--prediction_type", default="epsilon",
                   choices=["sample", "epsilon", "v_prediction"])
    p.add_argument("--cls_free_guidance_dropout", type=float, default=0.05)
    p.add_argument("--masked_cfg", action="store_true")
    # optimization
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--blr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--dtype", default="bfloat16")
    # data / misc
    p.add_argument("--data_path", default=None)
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--vq_ckpt", default=None,
                   help="pretrained VQ encoder weights (orbax dir), loaded frozen")
    p.add_argument("--output_dir", default="out/train_vqcontrolnet")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_freq", type=int, default=500)
    p.add_argument("--eval_timesteps", type=int, default=8)
    p.add_argument("--save_ckpt_freq", type=int, default=1000)
    p.add_argument("--print_freq", type=int, default=50)
    return p


def main(args=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..utils.checkpoint import save_checkpoint
    from ..utils.config import parse_args_with_config
    from ..utils.logger import JSONLLogger
    from ..utils.optim import cosine_schedule, create_optimizer
    from ..vq import (
        VQControlNet,
        controlnet_decode_quant,
        controlnet_params_from_unet,
        vqcontrolnet_trainable_mask,
    )

    args = parse_args_with_config(get_parser(), args)
    os.makedirs(args.output_dir, exist_ok=True)

    model = VQControlNet(
        image_size=args.input_size, n_channels=args.n_channels,
        enc_type=args.enc_type, patch_size=args.patch_size,
        codebook_size=args.codebook_size, latent_dim=args.latent_dim,
        freeze_enc=args.freeze_enc,
        model_channels=args.model_channels, num_res_blocks=args.num_res_blocks,
        channel_mult=tuple(args.channel_mult),
        attention_levels=tuple(args.attention_levels), num_heads=args.num_heads,
        context_len=args.context_len, context_dim=args.context_dim,
        vae_base_channels=args.vae_base_channels, vae_ch_mult=tuple(args.vae_ch_mult),
        num_train_timesteps=args.num_train_timesteps,
        prediction_type=args.prediction_type,
        cls_free_guidance_dropout=args.cls_free_guidance_dropout,
        masked_cfg=args.masked_cfg, dtype=args.dtype,
    )
    scheduler = model.noise_scheduler()

    rng_np = np.random.RandomState(args.seed)
    S, C = args.input_size, args.n_channels

    def synthetic_batches():
        while True:
            yield (rng_np.rand(args.batch_size, S, S, C).astype(np.float32) * 2 - 1)

    if args.synthetic_data or args.data_path is None:
        loader = synthetic_batches()
    else:
        from ..data.augmenters import RandomCropImageAugmenter
        from ..data.datasets import MultiModalDatasetFolder, repeat_dataset
        from ..data.transforms import UnifiedDataTransform, divae_modality_transforms

        transforms = divae_modality_transforms()
        aug = RandomCropImageAugmenter(target_size=args.input_size, main_domain=args.domain)
        unified = UnifiedDataTransform(transforms, aug)
        ds = MultiModalDatasetFolder(args.data_path, [args.domain], transforms, transform=unified)
        sample_iter = repeat_dataset(ds)

        def folder_batches():
            while True:
                yield np.stack([next(sample_iter)[args.domain]
                                for _ in range(args.batch_size)])

        loader = folder_batches()

    vae_down = 2 ** (len(args.vae_ch_mult) - 1)
    Sl = S // vae_down
    x0 = jnp.asarray(next(loader))
    rngs = {"params": jax.random.key(args.seed), "rng": jax.random.key(args.seed + 1)}
    variables = model.init(
        rngs, x0, jnp.zeros((x0.shape[0], Sl, Sl, model.latent_channels)),
        jnp.zeros((x0.shape[0],), jnp.int32), method="init_all",
    )
    if args.init_controlnet_from_unet:
        variables = controlnet_params_from_unet(variables)
    if args.vq_ckpt:
        from ..utils.checkpoint import latest_checkpoint_steps, load_checkpoint

        steps = latest_checkpoint_steps(args.vq_ckpt)
        loaded = load_checkpoint(args.vq_ckpt, steps[-1],
                                 {"params": variables["params"], "codebook": variables["codebook"]})
        for key in ("encoder", "quant_proj"):
            if key in loaded.get("params", {}):
                variables["params"][key] = loaded["params"][key]
        if "codebook" in loaded:
            variables["codebook"] = loaded["codebook"]
        print(f"[ckpt] loaded frozen VQ encoder from {args.vq_ckpt}")
    params = {"params": variables["params"]}
    codebook = {"codebook": variables["codebook"]}

    lr = args.blr * args.batch_size * len(jax.devices()) / 256.0
    sched = cosine_schedule(lr, args.total_steps, args.warmup_steps)
    tx = create_optimizer(params, sched, weight_decay=args.weight_decay,
                          clip_grad=args.clip_grad)
    opt_state = tx.init(params)
    trainable = vqcontrolnet_trainable_mask(params)

    def train_step(params, codebook, opt_state, batch, rng):
        rng_noise, rng_t, rng_q, rng_vae = jax.random.split(rng, 4)
        z = model.apply({**params, **codebook}, batch, rng_vae, method="vae_encode")
        noise = jax.random.normal(rng_noise, z.shape, jnp.float32)
        t = jax.random.randint(rng_t, (z.shape[0],), 0, args.num_train_timesteps)
        noised = scheduler.add_noise(z.astype(jnp.float32), noise, t)

        def loss(p):
            (pred, code_loss), mut = model.apply(
                {**p, **codebook}, batch, noised, t, train=True,
                mutable=["codebook"], rngs={"rng": rng_q},
            )
            if args.prediction_type == "v_prediction":
                target = scheduler.get_velocity(z.astype(jnp.float32), noise, t)
            elif args.prediction_type == "epsilon":
                target = noise
            else:
                target = z.astype(jnp.float32)
            rec = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))
            return rec, (code_loss, mut)

        (rec, (code_loss, mut)), grads = jax.value_and_grad(loss, has_aux=True)(params)
        grads = jax.tree.map(lambda g, m: g * m, grads, trainable)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, m: u * m, updates, trainable)
        params = optax.apply_updates(params, updates)
        return params, {"codebook": mut["codebook"]}, opt_state, rec, code_loss

    jitted = jax.jit(train_step, donate_argnums=(0, 1, 2))
    jsonl = JSONLLogger(args.output_dir)
    rng = jax.random.key(args.seed + 2)
    t0 = time.time()
    for step in range(args.total_steps):
        batch = jnp.asarray(next(loader))
        rng, r = jax.random.split(rng)
        params, codebook, opt_state, rec, code_loss = jitted(
            params, codebook, opt_state, batch, r
        )
        if step % args.print_freq == 0 or step == args.total_steps - 1:
            rec_f = float(rec)
            sps = args.batch_size * args.print_freq / max(time.time() - t0, 1e-6)
            t0 = time.time()
            print(f"step {step}/{args.total_steps} rec {rec_f:.4f} "
                  f"code {float(code_loss):.4f} samples/s {sps:.1f}", flush=True)
            jsonl.write({"step": step, "rec": rec_f, "code_loss": float(code_loss)})
        if (step + 1) % args.eval_freq == 0:
            variables = {**params, **codebook}
            quant, _, tokens = model.apply(variables, batch, method="encode")
            img = controlnet_decode_quant(model, variables, quant, jax.random.key(9),
                                          timesteps=args.eval_timesteps)
            mse = float(np.mean((np.asarray(img, np.float32) -
                                 np.asarray(batch, np.float32)) ** 2))
            usage = len(np.unique(np.asarray(tokens))) / args.codebook_size
            print(f"[eval] mse {mse:.4f} codebook_usage {usage:.4f}", flush=True)
            jsonl.write({"step": step, "eval_mse": mse, "eval_codebook_usage": usage})
        if (step + 1) % args.save_ckpt_freq == 0 or step == args.total_steps - 1:
            save_checkpoint(os.path.join(args.output_dir, "checkpoints"),
                            {"params": params, "codebook": codebook,
                             "opt_state": opt_state}, step + 1)

    print("vqcontrolnet training done")
    return params, codebook


if __name__ == "__main__":
    main()
