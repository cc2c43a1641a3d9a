"""LoRA: low-rank adaptation over flax parameter pytrees.

Functional equivalent of reference fourm/models/lora_utils.py:44-177. In JAX,
parameters are data: LoRA is a separate low-rank pytree trained alongside frozen
base params and fused by `fuse_lora` — `apply_lora(params, lora)` returns the
effective params for the forward pass (equivalent to the wrapper's
W x + scale * up(down(x)) since (W + s*up@down) x distributes).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# attention-containing kernels, matching reference ATTENTION_MODULES targeting
DEFAULT_TARGETS = r".*(attn|self_attn|cross_attn)/(qkv|kv|q|proj)/kernel$"


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _num_packed(path_str: str) -> int:
    name = path_str.split("/")[-2]
    return {"qkv": 3, "kv": 2, "qk": 2, "qv": 2}.get(name, 1)


def init_lora_params(
    rng: jax.Array, params: Dict, rank: int = 4, targets: str = DEFAULT_TARGETS,
) -> Dict:
    """Create a LoRA pytree: for each targeted (in, out) kernel, down (in, k*rank)
    ~ N(0, 1/rank) and up (k*rank, out) zeros (reference lora_utils.py:62-69)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    lora = {}
    for path, leaf in flat:
        ps = _path_str(path)
        if not re.match(targets, ps) or leaf.ndim != 2:
            continue
        k = _num_packed(ps) * rank
        if k > min(leaf.shape):
            continue
        rng, r = jax.random.split(rng)
        lora[ps] = {
            "down": jax.random.normal(r, (leaf.shape[0], k), jnp.float32) / rank,
            "up": jnp.zeros((k, leaf.shape[1]), jnp.float32),
        }
    return lora


def _map_kernels(params: Dict, fn) -> Dict:
    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            out[k] = walk(v, p) if isinstance(v, dict) else fn(p, v)
        return out

    return walk(params, "")


def fuse_lora(params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """kernel += scale * down @ up (reference fuse_LoRA_into_linear,
    lora_utils.py:71-77). Returns a new params tree."""

    def fn(path, leaf):
        if path in lora:
            return leaf + scale * jnp.dot(lora[path]["down"], lora[path]["up"])
        return leaf

    return _map_kernels(params, fn)


# apply_lora == fuse_lora: with pytree params the fused kernel IS the LoRA forward
apply_lora = fuse_lora


def lora_param_count(lora: Dict) -> int:
    return sum(int(v["down"].size + v["up"].size) for v in lora.values())
