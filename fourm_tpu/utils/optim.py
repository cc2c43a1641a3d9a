"""Optimizer factory and LR/WD schedules.

Replaces reference fourm/utils/optim_factory.py:62-245 and scheduler.py:22-83 with
optax transforms:
  * AdamW with the reference's no-weight-decay rules (biases, norm weights,
    modality/positional/mask-token embeddings);
  * cosine / inverse-sqrt / constant schedules with linear warmup and optional
    cooldown, defined per *step* (the reference precomputes per-step arrays);
  * optional per-layer LR decay for transfer fine-tuning.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_PATTERNS = (
    r".*bias$",
    r".*norm\d?/(weight|bias)$",
    r".*_norm/(weight|bias)$",
    r".*mod_emb.*",
    r".*pos_emb.*",
    r".*mask_token.*",
    r".*register_tokens.*",
    r".*token_emb/embedding$",
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def weight_decay_mask(params) -> Any:
    """True = apply weight decay. Mirrors reference optim_factory.py:62-101
    (no decay for 1-D params, norms, biases, embeddings)."""
    def decide(path, p):
        name = _path_str(path)
        if p.ndim <= 1:
            return False
        return not any(re.match(pat, name) for pat in NO_DECAY_PATTERNS)

    return jax.tree_util.tree_map_with_path(decide, params)


def cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 0.0,
    cooldown_steps: int = 0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Linear warmup -> cosine decay -> optional constant-min cooldown
    (reference scheduler.py:22-53)."""
    decay_steps = max(total_steps - warmup_steps - cooldown_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def inverse_sqrt_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    cooldown_steps: int = 0,
    timescale: float = 10_000.0,
    min_lr: float = 0.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Warmup -> inverse-sqrt -> linear cooldown to min_lr (scheduler.py:56-83)."""
    def isqrt(step):
        return base_lr / jnp.sqrt(jnp.maximum(step + timescale, timescale) / timescale)

    cooldown_start = total_steps - cooldown_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        mid = isqrt(step - warmup_steps)
        end_val = isqrt(cooldown_start - warmup_steps)
        frac = jnp.clip((step - cooldown_start) / jnp.maximum(cooldown_steps, 1), 0.0, 1.0)
        cool = end_val + (min_lr - end_val) * frac
        out = jnp.where(step < warmup_steps, warm, mid)
        if cooldown_steps > 0:
            out = jnp.where(step >= cooldown_start, cool, out)
        return out

    return schedule


def constant_schedule(base_lr: float, warmup_steps: int = 0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, base_lr)

    return schedule


def make_schedule(name: str, base_lr: float, total_steps: int, warmup_steps: int,
                  min_lr: float = 0.0, cooldown_steps: int = 0):
    if name == "cosine":
        return cosine_schedule(base_lr, total_steps, warmup_steps, min_lr, cooldown_steps)
    if name in ("inverse_sqrt", "isqrt"):
        return inverse_sqrt_schedule(base_lr, total_steps, warmup_steps, cooldown_steps, min_lr=min_lr)
    if name == "constant":
        return constant_schedule(base_lr, warmup_steps)
    raise ValueError(f"unknown schedule {name}")


def create_optimizer(
    params,
    schedule: Callable,
    weight_decay: float = 0.05,
    betas=(0.9, 0.95),
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
    skip_grad: Optional[float] = None,
    frozen_mask=None,
    layer_decay: Optional[float] = None,
    encoder_depth: int = 0,
    decoder_depth: int = 0,
) -> optax.GradientTransformation:
    """AdamW with the 4M parameter-group rules (reference optim_factory.py:171-245).

    skip_grad: skip the update entirely when the global grad norm exceeds this
    threshold (reference native_scaler.py:34-39 `skip_grad`).
    frozen_mask: optional pytree of bools, True = parameter is frozen (zero update),
    covering the reference's frozen-trunk warm-start phase (run_training_4m.py:522-529).
    """
    chain = []
    if clip_grad is not None:
        chain.append(optax.clip_by_global_norm(clip_grad))
    if layer_decay is not None and layer_decay < 1.0:
        chain.append(scale_by_tree(layerwise_lr_scales(
            params, layer_decay, encoder_depth, decoder_depth)))
    chain.append(
        optax.adamw(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay, mask=weight_decay_mask(params),
        )
    )
    tx = optax.chain(*chain)
    if skip_grad is not None:
        tx = skip_large_grads(tx, skip_grad)
    if frozen_mask is not None:
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx


def fourm_layer_id(path_str: str, encoder_depth: int, decoder_depth: int) -> int:
    """Layer id for per-layer LR decay (reference optim_factory.py:104-168):
    embeddings/mod-embs/mask-token -> 0, encoder block i -> i+1, decoder block j ->
    encoder_depth+1+j (+norms at the following boundary), heads -> max."""
    import re as _re

    top = path_str.split("/")[0]
    m = _re.fullmatch(r"encoder_(\d+)", top)
    if m:
        return int(m.group(1)) + 1
    if top == "encoder_norm":
        return encoder_depth + 1
    m = _re.fullmatch(r"decoder_(\d+)", top)
    if m:
        return encoder_depth + 1 + int(m.group(1)) + 1
    if top in ("decoder_norm", "decoder_proj_context") or top.startswith("decoder_embeddings"):
        return encoder_depth + decoder_depth + 2
    if top == "head":
        return encoder_depth + decoder_depth + 2
    return 0  # embeddings, mod_emb, mask_token, register tokens


def layerwise_lr_scales(params, decay: float, encoder_depth: int, decoder_depth: int = 0):
    """Pytree of per-parameter LR multipliers decay^(max_id - layer_id)."""
    max_id = encoder_depth + decoder_depth + 2

    def scale(path, p):
        lid = fourm_layer_id(_path_str(path), encoder_depth, decoder_depth)
        return decay ** (max_id - lid)

    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_tree(scales) -> optax.GradientTransformation:
    """Multiply each update leaf by its precomputed scalar (per-layer LR decay)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None, **extra):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def skip_large_grads(tx: optax.GradientTransformation, threshold: float):
    """Wrap a transformation to no-op when ||grad|| > threshold (NaN-safe)."""

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None, **extra):
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm) & (gnorm <= threshold)
        updates, new_state = tx.update(grads, state, params, **extra)
        updates = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        new_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "shape") and n.shape == getattr(o, "shape", None) else n,
            new_state, state,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)
