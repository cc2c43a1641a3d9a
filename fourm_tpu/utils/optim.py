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


class FusedAdamW:
    """optax.adamw-compatible transformation with a fused single-pass apply.

    init()/update() delegate to the wrapped optax.adamw chain (identical
    state tree -> checkpoints interchange freely). `fused_apply(grads,
    opt_state, params)` runs the whole update (moments + bias correction +
    decoupled decay + schedule + parameter application) as one Pallas kernel
    pass per leaf with in-place aliasing (kernels/fused_adamw.py).
    build_train_step uses fused_apply when available (single-chip, no frozen
    mask).

    MEASURED (v5e, 4M-B 361M-param tree, B=32 step): the optax chain, the
    per-leaf Pallas kernel, and hand-fused XLA math all run the update at the
    same speed (~22 ms — the practical floor; realized HBM bandwidth for the
    7-stream read/write pattern is ~56% of spec, and XLA already fuses the
    whole optax elementwise chain under jit). Running one pallas_call per
    leaf is ~17 ms SLOWER end to end (256 serialized kernel launches). So
    create_optimizer(fused=...) defaults to False; the kernel and this
    wrapper remain as a parity-proven option and for future toolchains
    where the tradeoff may differ."""

    def __init__(self, schedule, betas, eps, weight_decay, wd_mask):
        self._tx = optax.adamw(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay, mask=wd_mask,
        )
        self.schedule = schedule
        self.b1, self.b2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        self.wd_mask = wd_mask
        self.interpret = False  # tests flip this to run the kernel on CPU
        self.init = self._tx.init
        self.update = self._tx.update

    def _walk_states(self, s, replace_adam, found):
        if isinstance(s, optax.ScaleByAdamState):
            found.append(s)
            return replace_adam(s)
        if hasattr(s, "_fields"):  # other NamedTuple states
            if "inner_state" in s._fields:
                return s._replace(
                    inner_state=self._walk_states(s.inner_state, replace_adam, found))
            if "count" in s._fields:
                return s._replace(count=s.count + 1)
            return s
        if isinstance(s, (tuple, list)):
            return type(s)(self._walk_states(x, replace_adam, found) for x in s)
        return s

    def fused_apply(self, grads, opt_state, params):
        from ..kernels.fused_adamw import adamw_scalars, fused_adamw_leaf

        adams = [s for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
            if isinstance(s, optax.ScaleByAdamState)]
        assert len(adams) == 1, f"expected one adam state, got {len(adams)}"
        adam = adams[0]
        scalars = adamw_scalars(adam.count, self.schedule, self.b1, self.b2)

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(adam.mu)
        flat_v = treedef.flatten_up_to(adam.nu)
        flat_mask = treedef.flatten_up_to(self.wd_mask)
        new_p, new_m, new_v = [], [], []
        for g, p, m, v, dk in zip(flat_g, flat_p, flat_m, flat_v, flat_mask):
            p2, m2, v2 = fused_adamw_leaf(
                g, p, m, v, scalars, b1=self.b1, b2=self.b2, eps=self.eps,
                wd=self.weight_decay, decay=bool(dk), interpret=self.interpret)
            new_p.append(p2)
            new_m.append(m2)
            new_v.append(v2)
        params2 = jax.tree_util.tree_unflatten(treedef, new_p)
        mu2 = jax.tree_util.tree_unflatten(treedef, new_m)
        nu2 = jax.tree_util.tree_unflatten(treedef, new_v)

        def replace_adam(s):
            return s._replace(count=s.count + 1, mu=mu2, nu=nu2)

        found = []
        opt_state2 = self._walk_states(opt_state, replace_adam, found)
        return params2, opt_state2


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
    fused: bool = False,
) -> optax.GradientTransformation:
    """AdamW with the 4M parameter-group rules (reference optim_factory.py:171-245).

    skip_grad: skip the update entirely when the global grad norm exceeds this
    threshold (reference native_scaler.py:34-39 `skip_grad`).
    frozen_mask: optional pytree of bools, True = parameter is frozen (zero update),
    covering the reference's frozen-trunk warm-start phase (run_training_4m.py:522-529).
    fused: when the chain is pure AdamW (no clip/layer-decay/skip/frozen),
    return a FusedAdamW whose `fused_apply` runs the update as one in-place
    Pallas pass per leaf (bit-matching optax; parity-tested). State trees and
    update() behavior are identical either way. Default False: measured on
    v5e the optax chain already runs at the practical bandwidth floor and
    per-leaf kernel launches are net-slower (see FusedAdamW docstring).
    """
    pure_adamw = (clip_grad is None and skip_grad is None and frozen_mask is None
                  and (layer_decay is None or layer_decay >= 1.0))
    if fused and pure_adamw:
        return FusedAdamW(schedule, betas, eps, weight_decay,
                          weight_decay_mask(params))
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
