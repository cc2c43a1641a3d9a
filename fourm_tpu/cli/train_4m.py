"""4M pre-training CLI — the TPU equivalent of the reference's DDP *and* FSDP
scripts (run_training_4m.py / run_training_4m_fsdp.py): one SPMD path where the
mesh shape decides between pure data parallelism and parameter sharding.

Features carried over: token-budget epoch math (:431-470), LR x bs/256 scaling
(:498), frozen-trunk warm-start phase (:522-529), fixed-budget eval (:166-174,
:798-832), NaN tripwire with batch dump (:729-732), tokens-seen accounting,
auto-resume, JSONL logging.

Usage:
  python -m fourm_tpu.cli.train_4m --config cfgs/4m/tiny_debug.yaml
  python -m fourm_tpu.cli.train_4m --synthetic_data ...   # smoke-test without data
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from typing import Dict, Optional

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("4M pre-training", add_help=True)
    # model
    p.add_argument("--model", default="fm_base_12e_12d_swiglu_qknorm_nobias")
    p.add_argument("--in_domains", default="tok_rgb@224-caption")
    p.add_argument("--out_domains", default="tok_rgb@224-caption")
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--encoder_depth", type=int, default=None)
    p.add_argument("--decoder_depth", type=int, default=None)
    p.add_argument("--num_heads", type=int, default=None)
    p.add_argument("--num_register_tokens", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true", help="activation checkpointing")
    # token budgets (reference :76-79)
    p.add_argument("--num_input_tokens", type=int, default=128)
    p.add_argument("--num_target_tokens", type=int, default=128)
    p.add_argument("--min_input_tokens", type=int, default=None)
    p.add_argument("--min_target_tokens", type=int, default=None)
    p.add_argument("--loss_type", default="mod", choices=["mod", "token"])
    # schedule (token-based epoch math, reference :431-470)
    p.add_argument("--total_tokens", type=float, default=1.0, help="total training tokens, in billions")
    p.add_argument("--warmup_tokens", type=float, default=0.1, help="warmup tokens, in billions")
    p.add_argument("--cooldown_tokens", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=8, help="per-chip batch size")
    p.add_argument("--grad_accum_steps", type=int, default=1)
    p.add_argument("--blr", type=float, default=1e-4, help="base LR, scaled by global bs/256")
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--scheduler", default="cosine", choices=["cosine", "inverse_sqrt", "constant"])
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--skip_grad", type=float, default=None)
    p.add_argument("--opt_betas", type=float, nargs=2, default=(0.9, 0.95))
    p.add_argument("--frozen_model_epochs", type=int, default=0,
                   help="initial epochs where only embeddings train (reference :522-529)")
    p.add_argument("--layer_decay", type=float, default=None,
                   help="per-layer LR decay factor (reference optim_factory.py:62-150)")
    p.add_argument("--finetune", default=None,
                   help="warm-start weights (.safetensors or orbax step dir), "
                        "loaded minus pos-embs (reference :475-487)")
    # data
    p.add_argument("--data_config", default=None, help="YAML with train datasets + weights")
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--text_tokenizer_path", default=None)
    p.add_argument("--epoch_size", type=int, default=10_000, help="samples per 'epoch' (ckpt cadence)")
    p.add_argument("--num_workers", type=int, default=0,
                   help="data-loading worker processes (0 = inline)")
    # mesh
    p.add_argument("--fsdp", type=int, default=1, help="fsdp mesh axis size")
    p.add_argument("--tensor", type=int, default=1)
    # misc
    p.add_argument("--output_dir", default="out/train_4m")
    p.add_argument("--run_name", default="auto")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_freq", type=int, default=1, help="eval every N epochs")
    p.add_argument("--fixed_eval", action="store_true", default=True,
                   help="eval with pinned 128/128 token budgets (reference :166-174)")
    p.add_argument("--fixed_eval_input_tokens", type=int, default=128)
    p.add_argument("--fixed_eval_target_tokens", type=int, default=128)
    p.add_argument("--eval_size", type=int, default=256, help="samples per eval")
    p.add_argument("--save_ckpt_freq", type=int, default=1)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--log_wandb", action="store_true")
    p.add_argument("--wandb_project", default=None)
    p.add_argument("--print_freq", type=int, default=50)
    p.add_argument("--max_steps", type=int, default=None, help="hard step cap (debug)")
    return p


def make_synthetic_loader(domains, batch_size, num_input_tokens, num_target_tokens, seed=0):
    from ..utils.synthetic import synthetic_mod_batch

    def gen():
        i = seed
        while True:
            yield synthetic_mod_batch(domains, batch_size, num_input_tokens,
                                      num_target_tokens, seed=i)
            i += 1

    return gen()


def merge_loaded_params(init_vars, loaded_vars):
    """Overlay loaded leaves onto the initialized tree, keeping initialized
    values where the load has no entry (e.g. dropped pos-embs)."""
    if not isinstance(init_vars, dict):
        return loaded_vars if loaded_vars is not None else init_vars
    out = {}
    for k, v in init_vars.items():
        lv = loaded_vars.get(k) if isinstance(loaded_vars, dict) else None
        out[k] = merge_loaded_params(v, lv) if lv is not None else v
    return out


def load_finetune_weights(path: str, config, init_variables):
    """--finetune warm start: load released/exported weights MINUS positional
    embeddings (reference run_training_4m.py:475-487 drops '.pos_emb' keys)."""
    import jax
    import jax.numpy as jnp

    from ..utils.checkpoint import (
        import_fourm_state_dict,
        latest_checkpoint_steps,
        load_checkpoint,
        load_safetensors,
    )

    if path.endswith(".safetensors"):
        tensors, _meta = load_safetensors(path)
        tensors = {k: v for k, v in tensors.items() if ".pos_emb" not in k}
        loaded = import_fourm_state_dict(tensors, config)
    else:
        steps = latest_checkpoint_steps(path)
        if not steps:
            raise FileNotFoundError(f"no orbax checkpoints under {path}")
        restored = load_checkpoint(path, steps[-1], init_variables)
        loaded = jax.tree.map(jnp.asarray, restored)

        def drop_pos_emb(tree):
            if not isinstance(tree, dict):
                return tree
            return {k: drop_pos_emb(v) for k, v in tree.items() if k != "pos_emb"}

        loaded = drop_pos_emb(loaded)
    return merge_loaded_params(init_variables, loaded)


_EVAL_FN_CACHE = {}


def evaluate(model, params, val_loader, num_input_tokens, num_target_tokens,
             loss_type, max_samples, global_bs):
    """Held-out eval with (optionally pinned) token budgets so val loss is
    comparable across runs (reference run_training_4m.py:798-832). The jitted
    eval step is cached across calls (keyed on model identity + budgets +
    loss type) so periodic eval cycles don't pay a recompile each time."""
    import jax
    import jax.numpy as jnp

    key = (id(model), num_input_tokens, num_target_tokens, loss_type)
    eval_fn = _EVAL_FN_CACHE.get(key)
    if eval_fn is None:
        eval_fn = jax.jit(
            lambda p, b: model.apply(p, b, num_input_tokens, num_target_tokens,
                                     loss_type=loss_type),
        )
        _EVAL_FN_CACHE[key] = eval_fn
    losses, mod_losses = [], {}
    seen = 0
    for batch in val_loader:
        batch = jax.tree.map(jnp.asarray, batch)
        loss, (mod_loss, _cnt) = eval_fn(params, batch)
        losses.append(float(loss))
        for m, v in mod_loss.items():
            mod_losses.setdefault(m, []).append(float(v))
        seen += global_bs
        if seen >= max_samples:
            break
    out = {"loss": float(np.mean(losses))}
    out.update({f"loss_{m}": float(np.mean(v)) for m, v in mod_losses.items()})
    return out


def main(args=None):
    import jax
    import jax.numpy as jnp

    from ..models import FourM, create_fourm_config
    from ..parallel import build_train_step, init_train_state, make_mesh
    from ..utils.checkpoint import auto_resume, save_checkpoint
    from ..utils.config import expand_run_name, load_yaml, parse_args_with_config
    from ..utils.logger import JSONLLogger, MetricLogger, WandbLogger, tokens_seen
    from ..utils.optim import create_optimizer, make_schedule
    from ..utils.text_tokenizer import load_tokenizer

    args = parse_args_with_config(get_parser(), args)
    run_name = expand_run_name(args.run_name, args.config)
    output_dir = os.path.join(args.output_dir, run_name) if run_name != "auto" else args.output_dir
    os.makedirs(output_dir, exist_ok=True)

    in_domains = sorted(args.in_domains.split("-"))
    out_domains = sorted(args.out_domains.split("-"))
    all_domains = sorted(set(in_domains) | set(out_domains))

    n_dev = len(jax.devices())
    mesh = make_mesh(data=-1, fsdp=args.fsdp, tensor=args.tensor)
    global_bs = args.batch_size * n_dev * args.grad_accum_steps

    # token-budget step math (reference run_training_4m.py:431-470)
    tokens_per_step = global_bs * (args.num_input_tokens + args.num_target_tokens)
    total_steps = int(args.total_tokens * 1e9 / tokens_per_step)
    warmup_steps = int(args.warmup_tokens * 1e9 / tokens_per_step)
    cooldown_steps = int(args.cooldown_tokens * 1e9 / tokens_per_step)
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)
    steps_per_epoch = max(args.epoch_size // global_bs, 1)
    lr = args.blr * global_bs / 256.0  # reference :498

    print(f"devices={n_dev} mesh={dict(mesh.shape)} global_bs={global_bs} "
          f"total_steps={total_steps} warmup={warmup_steps} lr={lr:.2e}")

    # model
    overrides = {k: getattr(args, k) for k in ("dim", "encoder_depth", "decoder_depth", "num_heads")
                 if getattr(args, k) is not None}
    config = create_fourm_config(
        args.model, tuple(in_domains), tuple(out_domains), dtype=args.dtype,
        num_register_tokens=args.num_register_tokens, remat=args.remat, **overrides,
    )
    model = FourM(config)
    # persist the model config so generation/eval can rebuild the model from
    # the orbax checkpoint dir alone (reference embeds it in safetensors metadata)
    import dataclasses as _dc
    import json as _json

    with open(os.path.join(output_dir, "config.json"), "w") as f:
        _json.dump(_dc.asdict(config), f, indent=1)

    # data
    eval_in = args.fixed_eval_input_tokens if args.fixed_eval else args.num_input_tokens
    eval_tgt = args.fixed_eval_target_tokens if args.fixed_eval else args.num_target_tokens
    if args.synthetic_data or args.data_config is None:
        print("[data] synthetic batches")
        loader = make_synthetic_loader(
            all_domains, global_bs, args.num_input_tokens, args.num_target_tokens, args.seed
        )

        def val_loader_fn():
            from ..utils.synthetic import synthetic_mod_batch

            n_batches = max(args.eval_size // global_bs, 1)
            # held-out seeds, deterministic across evals (fixed_eval semantics)
            return iter([
                synthetic_mod_batch(all_domains, global_bs, eval_in, eval_tgt,
                                    seed=10_000_000 + i)
                for i in range(n_batches)
            ])
    else:
        data_cfg = load_yaml(args.data_config)
        text_tokenizer = load_tokenizer(args.text_tokenizer_path) if args.text_tokenizer_path else None
        train_cfgs = data_cfg["train"]["datasets"]
        from ..data.datasets import batched_loader, prefetch_iterator
        from ..data.pretrain_utils import build_parallel_train_loader, get_val_dataset

        loader = prefetch_iterator(
            build_parallel_train_loader(
                train_cfgs, all_domains, global_bs, 224,
                args.num_input_tokens, args.num_target_tokens,
                args.min_input_tokens, args.min_target_tokens,
                text_tokenizer_path=args.text_tokenizer_path, seed=args.seed,
                num_workers=args.num_workers,
            ),
            prefetch=4,
        )
        val_cfgs = (data_cfg.get("val") or {}).get("datasets", {})
        if val_cfgs:
            val_datasets = {
                name: get_val_dataset(
                    dcfg, text_tokenizer, 224, args.num_input_tokens,
                    args.num_target_tokens, args.min_input_tokens,
                    args.min_target_tokens, fixed_eval=args.fixed_eval,
                    fixed_eval_input_tokens=args.fixed_eval_input_tokens,
                    fixed_eval_target_tokens=args.fixed_eval_target_tokens,
                    seed=args.seed,
                )
                for name, dcfg in val_cfgs.items()
            }

            def val_loader_fn():
                import itertools

                return itertools.chain.from_iterable(
                    batched_loader(iter(ds), global_bs) for ds in val_datasets.values()
                )
        else:
            val_loader_fn = None

    # init
    example = jax.tree.map(lambda x: jnp.asarray(x[:1]), next(iter([next(loader)])))
    sched = make_schedule(args.scheduler, lr, total_steps, warmup_steps,
                          min_lr=args.min_lr, cooldown_steps=cooldown_steps)
    params_shape = jax.eval_shape(
        lambda r: model.init(r, example, args.num_input_tokens, args.num_target_tokens),
        jax.random.key(args.seed),
    )
    tx = create_optimizer(
        params_shape, sched, weight_decay=args.weight_decay, betas=tuple(args.opt_betas),
        clip_grad=args.clip_grad, skip_grad=args.skip_grad,
        layer_decay=args.layer_decay,
        encoder_depth=config.encoder_depth, decoder_depth=config.decoder_depth,
    )
    state, shardings = init_train_state(
        model, tx, example, args.num_input_tokens, args.num_target_tokens,
        jax.random.key(args.seed), mesh=mesh,
    )
    if args.finetune:
        state = state.replace(
            params=load_finetune_weights(args.finetune, config, state.params)
        )
        print(f"[ckpt] warm-started from {args.finetune} (pos-embs re-initialized)")
    start_step = 0
    if args.auto_resume:
        try:
            restored, start_step = auto_resume(os.path.join(output_dir, "checkpoints"), state)
            if restored is not None:
                state = restored
                print(f"[ckpt] resumed from step {start_step}")
        except Exception as e:
            print(f"[ckpt] resume failed ({e}); starting fresh")

    step_fn = build_train_step(
        model, tx, args.num_input_tokens, args.num_target_tokens, loss_type=args.loss_type,
        grad_accum_steps=args.grad_accum_steps, mesh=mesh, state_shardings=shardings,
    )
    # frozen-trunk warm-start phase (reference :522-529, fm.py:762): a second
    # step function whose grads/updates are masked to embeddings only
    frozen_steps = args.frozen_model_epochs * steps_per_epoch
    frozen_step_fn = None
    if frozen_steps > 0:
        from ..parallel import frozen_trunk_mask

        frozen_step_fn = build_train_step(
            model, tx, args.num_input_tokens, args.num_target_tokens,
            loss_type=args.loss_type, grad_accum_steps=args.grad_accum_steps,
            mesh=mesh, state_shardings=shardings,
            trainable_mask=frozen_trunk_mask(state.params),
        )
        print(f"[train] frozen-trunk phase for the first {frozen_steps} steps")

    metric_logger = MetricLogger()
    jsonl = JSONLLogger(output_dir)
    wandb_logger = WandbLogger(project=args.wandb_project if args.log_wandb else None,
                               name=run_name, config=vars(args))

    rng = jax.random.key(args.seed + 1)
    t0 = time.time()
    for step in range(start_step, total_steps):
        batch = jax.tree.map(jnp.asarray, next(loader))
        if args.grad_accum_steps > 1:
            batch = jax.tree.map(
                lambda x: x.reshape((args.grad_accum_steps, -1) + x.shape[1:]), batch
            )
        rng, rng_step = jax.random.split(rng)
        fn = frozen_step_fn if (frozen_step_fn is not None and step < frozen_steps) else step_fn
        state, metrics = fn(state, batch, rng_step)

        if step % args.print_freq == 0 or step == total_steps - 1:
            loss = float(metrics["loss"])  # host fetch = fence
            if not math.isfinite(loss):
                # NaN tripwire: dump batch and abort (reference :729-732)
                dump = os.path.join(output_dir, f"nan_batch_step{step}.npz")
                np.savez(dump, **{f"{m}_{k}": np.asarray(v) for m, d in
                                  jax.tree.map(np.asarray, batch).items() if isinstance(d, dict)
                                  for k, v in d.items()})
                print(f"FATAL: non-finite loss {loss} at step {step}; batch dumped to {dump}")
                sys.exit(1)
            sps = global_bs * args.print_freq / max(time.time() - t0, 1e-6)
            t0 = time.time()
            metric_logger.update(loss=loss, grad_norm=float(metrics["grad_norm"]))
            tokens_b = tokens_seen(step + 1, global_bs, args.num_input_tokens, args.num_target_tokens)
            print(f"step {step}/{total_steps} loss {loss:.4f} "
                  f"gnorm {float(metrics['grad_norm']):.2f} samples/s {sps:.1f} "
                  f"tokens {tokens_b:.3f}B", flush=True)
            stats = {"step": step, "loss": loss, "samples_per_sec": sps, "tokens_B": tokens_b}
            jsonl.write(stats)
            wandb_logger.log(stats, step=step)

        if (step + 1) % (steps_per_epoch * args.save_ckpt_freq) == 0 or step == total_steps - 1:
            save_checkpoint(os.path.join(output_dir, "checkpoints"), state, step + 1)
            # params-only export for generation/eval (loaded by generate.load_fm)
            save_checkpoint(os.path.join(output_dir, "weights"), state.params, step + 1)
            print(f"[ckpt] saved step {step + 1}")

        if val_loader_fn is not None and (
            (step + 1) % (steps_per_epoch * args.eval_freq) == 0 or step == total_steps - 1
        ):
            stats = evaluate(
                model, state.params, val_loader_fn(), eval_in, eval_tgt,
                args.loss_type, max_samples=args.eval_size, global_bs=global_bs,
            )
            print(f"[eval] step {step + 1}: {stats}", flush=True)
            jsonl.write({"step": step + 1, **{f"eval_{k}": v for k, v in stats.items()}})
            wandb_logger.log({f"eval_{k}": v for k, v in stats.items()}, step=step + 1)

    wandb_logger.finish()
    print("training done")
    return state


if __name__ == "__main__":
    main()
