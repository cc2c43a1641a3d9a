"""Token sampling: temperature / top-k / top-p, fully jittable.

Semantics follow the reference sampler (fourm/models/generate.py:332-404) but with
static shapes: top-k/top-p filtering is expressed with sort + where instead of
boolean indexing, temperature==0 argmax is handled with lax.cond-free jnp.where so
one compiled function serves all schedule steps.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def top_k_top_p_filtering(
    logits: jnp.ndarray, top_k: Union[int, float] = 0.0, top_p: float = 0.0
) -> jnp.ndarray:
    """Mask logits outside the top-k / nucleus top-p set to -inf.

    `top_k` may be an int (absolute count) or float fraction of the vocab, like the
    reference (generate.py:332-357). Static python values — they select the compiled
    program, not traced branches.
    """
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    if top_k and top_k > 0.0:
        k = min(int(top_k * V) if isinstance(top_k, float) and top_k < 1.0 else int(top_k), V)
        k = max(k, 1)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p and top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # Shift right so the first token crossing the threshold is kept.
        exceeded = cum_probs > top_p
        exceeded = jnp.concatenate(
            [jnp.zeros_like(exceeded[..., :1]), exceeded[..., :-1]], axis=-1
        )
        # Smallest kept logit value: the last sorted position not exceeded.
        min_kept = jnp.min(jnp.where(exceeded, jnp.inf, sorted_logits), axis=-1, keepdims=True)
        logits = jnp.where(logits < min_kept, NEG_INF, logits)
    return logits


def top_k_top_p_filtering_dynamic(
    logits: jnp.ndarray, top_k: jnp.ndarray, top_p: jnp.ndarray
) -> jnp.ndarray:
    """Jit-traced variant: top_k/top_p are runtime scalars (0 = off), so one
    compiled program serves every setting (the reference treats them per call,
    generate.py:332-357; round-1 baked them into the jit cache)."""
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    # top-k threshold: value at rank k-1 (float top_k < 1 means vocab fraction)
    kf = jnp.where(top_k <= 0, V, jnp.where(top_k < 1.0, top_k * V, top_k))
    k = jnp.clip(kf.astype(jnp.int32), 1, V)
    idx = jnp.broadcast_to(k - 1, logits.shape[:-1])[..., None]
    kth = jnp.take_along_axis(sorted_logits, idx, axis=-1)
    kth = jnp.where(top_k > 0, kth, NEG_INF)
    logits = jnp.where(logits < kth, NEG_INF, logits)
    # top-p over the top-k-FILTERED distribution (sequential, matching the
    # static path / reference generate.py:332-357). Mask the sorted tail the
    # same way instead of re-sorting.
    ranks = jnp.arange(V)
    sorted_k = jnp.where(ranks < k[..., None] if k.ndim else ranks < k,
                         sorted_logits, NEG_INF)
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_k, axis=-1), axis=-1)
    exceeded = cum_probs > top_p
    exceeded = jnp.concatenate(
        [jnp.zeros_like(exceeded[..., :1]), exceeded[..., :-1]], axis=-1
    )
    min_kept = jnp.min(jnp.where(exceeded, jnp.inf, sorted_k), axis=-1, keepdims=True)
    min_kept = jnp.where(top_p > 0, min_kept, NEG_INF)
    return jnp.where(logits < min_kept, NEG_INF, logits)


def sample_tokens(
    rng: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: Union[int, float] = 0.0,
    top_p: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample token ids and their probabilities from (..., V) logits.

    Returns (samples (...,), sampled_probs (...,)). temperature ~ 0 means argmax
    with probability 1, matching reference generate.py:360-370.
    """
    if abs(float(temperature)) < 1e-10:
        samples = jnp.argmax(logits, axis=-1)
        return samples, jnp.ones(samples.shape, dtype=jnp.float32)
    filtered = top_k_top_p_filtering(logits, top_k, top_p)
    scaled = filtered / temperature
    samples = jax.random.categorical(rng, scaled, axis=-1)
    probs = jax.nn.softmax(scaled, axis=-1)
    sampled_probs = jnp.take_along_axis(probs, samples[..., None], axis=-1)[..., 0]
    return samples, sampled_probs
