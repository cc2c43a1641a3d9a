"""Batch chained generation CLI (reference run_generation.py:69-866): run a
conditioning->targets schedule over a dataset (folder of images / text prompts /
empty) with optional 448px super-resolution chaining, sharded across processes.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("4M batch generation")
    p.add_argument("--fm_ckpt", required=True, help="safetensors or orbax dir of the FourM model")
    p.add_argument("--fm_sr_ckpt", default=None)
    p.add_argument("--text_tokenizer_path", default=None)
    p.add_argument("--cond_domains", default="rgb@224", help="hyphen-separated")
    p.add_argument("--target_domains", default="tok_rgb@224-caption")
    p.add_argument("--dataset", default="empty", choices=["folder", "prompts", "empty"])
    p.add_argument("--data_path", default=None)
    p.add_argument("--prompts_tsv", default=None, help="TSV of text prompts (Parti-style)")
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--num_variations", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--top_k", type=float, default=0.0)
    p.add_argument("--top_p", type=float, default=0.0)
    # per-target schedule overrides, hyphen-separated with single-value
    # broadcast (reference run_generation.py string_to_list / settings configs)
    p.add_argument("--tokens_per_target", default=None)
    p.add_argument("--autoregression_schemes", default=None,
                   help="e.g. roar-roar-autoregressive")
    p.add_argument("--decoding_steps", default=None)
    p.add_argument("--token_decoding_schedules", default=None)
    p.add_argument("--temps", default=None)
    p.add_argument("--temp_schedules", default=None)
    p.add_argument("--cfg_scales", default=None)
    p.add_argument("--cfg_schedules", default=None)
    p.add_argument("--cfg_grow_conditioning", type=bool, default=True)
    p.add_argument("--perform_sr", action="store_true")
    p.add_argument("--tokenizer", action="append", default=[],
                   metavar="MOD=PATH",
                   help="tokenizer checkpoint per modality key (e.g. "
                        "tok_rgb=ckpts/rgb_16k.safetensors); repeatable. When "
                        "given, generated tokens are decoded and saved as "
                        "images/text (reference run_generation.py:662+)")
    p.add_argument("--detokenizer_steps", type=int, default=50,
                   help="diffusion steps for DiVAE detokenization")
    p.add_argument("--save_tokens", action="store_true", default=True)
    p.add_argument("--output_dir", default="out/generation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard_id", type=int, default=0)
    return p


def _hyphen_list(value, n, cast):
    """'a-b-c' -> [a,b,c]; single value broadcasts to n (reference
    run_generation.py:309 string_to_list)."""
    parts = str(value).split("-")
    vals = [cast(v) for v in parts]
    if len(vals) == 1:
        vals = vals * n
    if len(vals) != n:
        raise SystemExit(f"expected 1 or {n} hyphen-separated values, got {value!r}")
    return vals


def schedule_overrides(args, sampler, cond_domains, targets):
    """Per-target schedule defaults: demo defaults with any provided
    settings-config fields overriding (reference settings_base/settings_sr
    configs feed these exact keys)."""
    fields = {
        "tokens_per_target": (args.tokens_per_target, int),
        "autoregression_scheme": (args.autoregression_schemes, str),
        "decoding_steps": (args.decoding_steps, int),
        "token_decoding_schedule": (args.token_decoding_schedules, str),
        "temp": (args.temps, float),
        "temp_schedule": (args.temp_schedules, str),
        "cfg_scale": (args.cfg_scales, float),
        "cfg_schedule": (args.cfg_schedules, str),
    }
    if all(v is None for v, _ in fields.values()):
        return None
    base = sampler.resolve_defaults(cond_domains)
    n = len(targets)
    cols = {k: (_hyphen_list(v, n, cast) if v is not None else None)
            for k, (v, cast) in fields.items()}
    out = {}
    for i, t in enumerate(targets):
        d = dict(base[t])
        for k, vals in cols.items():
            if vals is not None:
                d[k] = vals[i]
        out[t] = d
    return out


def load_fm(path: str):
    """Load a FourM checkpoint: released .safetensors (config in metadata), or
    a training output dir (config.json + orbax checkpoints/step_*)."""
    import jax
    import jax.numpy as jnp

    from ..models import FourM, FourMConfig
    from ..utils.checkpoint import (
        latest_checkpoint_steps,
        load_checkpoint,
        load_fourm_safetensors,
    )

    if path.endswith(".safetensors"):
        config, variables = load_fourm_safetensors(path)
        return FourM(config), variables
    if os.path.isdir(path):
        cfg_path = os.path.join(path, "config.json")
        if not os.path.exists(cfg_path):
            raise SystemExit(f"{path}: no config.json next to the orbax checkpoints "
                             "(written by train_4m)")
        with open(cfg_path) as f:
            cfg_dict = json.load(f)
        for k in ("encoder_modalities", "decoder_modalities"):
            cfg_dict[k] = tuple(cfg_dict[k])
        config = FourMConfig(**cfg_dict)
        model = FourM(config)
        ckpt_dir = os.path.join(path, "weights")
        steps = latest_checkpoint_steps(ckpt_dir)
        if not steps:
            raise SystemExit(f"no params export under {ckpt_dir} "
                             "(written by train_4m alongside checkpoints/)")
        from ..utils.synthetic import synthetic_mod_batch

        example = jax.tree.map(
            lambda x: jnp.asarray(x[:1]),
            synthetic_mod_batch(config.encoder_modalities, 1, 32, 32, seed=0),
        )
        abstract = jax.eval_shape(
            lambda r: model.init(r, example, 32, 32), jax.random.key(0)
        )
        variables = load_checkpoint(ckpt_dir, steps[-1], abstract)
        return model, variables
    raise SystemExit(f"unsupported checkpoint format: {path} "
                     "(expected .safetensors or an orbax output dir)")


def iter_samples(args, text_tokenizer):
    """Yield (sample_id, sample_dict) conditioning inputs
    (reference get_dataset, run_generation.py:408-470)."""
    from PIL import Image

    from ..data.transforms import RGBTransform

    if args.dataset == "folder":
        rgbt = RGBTransform(imagenet_default_mean_and_std=True)
        root = args.data_path
        files = sorted(os.listdir(root))[: args.num_samples]
        for i, f in enumerate(files):
            img = rgbt.preprocess(rgbt.load(os.path.join(root, f)))
            img = img.resize((224, 224))
            yield f, {"rgb@224": rgbt.postprocess(img)[None]}
    elif args.dataset == "prompts":
        with open(args.prompts_tsv) as fh:
            lines = [l.split("\t")[0] for l in fh.read().splitlines() if l][: args.num_samples]
        for i, prompt in enumerate(lines):
            yield f"prompt_{i:05d}", {"caption": prompt}
    else:  # empty / unconditional
        for i in range(args.num_samples):
            yield f"empty_{i:05d}", {}


def main(args=None):
    import jax

    from ..api import FourMSampler
    from ..utils.config import parse_args_with_config
    from ..utils.text_tokenizer import load_tokenizer

    args = parse_args_with_config(get_parser(), args)
    os.makedirs(args.output_dir, exist_ok=True)
    cond_domains = [d for d in args.cond_domains.split("-") if d] if args.cond_domains else []
    target_domains = args.target_domains.split("-")

    model, variables = load_fm(args.fm_ckpt)
    fm_sr = load_fm(args.fm_sr_ckpt) if args.fm_sr_ckpt else None
    text_tokenizer = load_tokenizer(args.text_tokenizer_path) if args.text_tokenizer_path else None

    tokenizers = {}
    if args.tokenizer:
        from ..utils.decoding import TokenizerBundle
        from ..vq import get_image_tokenizer

        for spec in args.tokenizer:
            mod, tok_path = spec.split("=", 1)
            tok_model, tok_vars = get_image_tokenizer(tok_path)
            tokenizers[mod] = TokenizerBundle(model=tok_model, variables=tok_vars)

    sampler = FourMSampler(
        fm=(model, variables), fm_sr=fm_sr, text_tokenizer=text_tokenizer,
        tokenizers=tokenizers, top_k=args.top_k, top_p=args.top_p,
    )

    count = 0
    for idx, (sample_id, sample) in enumerate(iter_samples(args, text_tokenizer)):
        if idx % args.num_shards != args.shard_id:
            continue
        for var in range(args.num_variations):
            seed = args.seed + idx * 1000 + var
            mod_dict = sampler.prepare_sample(sample, cond_domains, target_domains,
                                              args.batch_size)
            schedule = sampler.build_schedule(
                cond_domains, target_domains,
                defaults=schedule_overrides(args, sampler, cond_domains,
                                            target_domains),
                cfg_grow_conditioning=args.cfg_grow_conditioning,
            )
            out = sampler.generate(mod_dict, schedule, seed=seed)
            if args.perform_sr and sampler.sampler_sr is not None:
                out = sampler.super_resolve(out, seed=seed)
            # raw token outputs per modality
            if args.save_tokens:
                save = {}
                for mod in target_domains:
                    if mod in out:
                        save[mod] = np.asarray(out[mod]["tensor"])
                path = os.path.join(args.output_dir, f"{sample_id}_v{var}.npz")
                np.savez(path, **save)
                print(f"[{count}] saved {path}")
            # decode to images / text with the loaded tokenizers
            # (reference run_generation.py:662-760 saves decoded outputs)
            if tokenizers or text_tokenizer is not None:
                decoded = sampler.decode(out, decoding_steps=args.detokenizer_steps,
                                         seed=seed)
                for mod, val in decoded.items():
                    base = os.path.join(args.output_dir,
                                        f"{sample_id}_v{var}_{mod.replace('@', '_')}")
                    if isinstance(val, str) or (
                        isinstance(val, list) and val and isinstance(val[0], str)
                    ):
                        with open(base + ".txt", "w") as fh:
                            fh.write("\n".join(val) if isinstance(val, list) else val)
                    elif isinstance(val, np.ndarray) and val.ndim >= 2:
                        from PIL import Image

                        arr = val[0] if val.ndim == 4 else val
                        if arr.ndim == 2:
                            arr = np.stack([arr] * 3, -1)
                        if arr.dtype != np.uint8:
                            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                        Image.fromarray(arr).save(base + ".png")
            count += 1
    print(f"generated {count} outputs")


if __name__ == "__main__":
    main()
