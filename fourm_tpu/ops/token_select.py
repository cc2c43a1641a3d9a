"""Fixed-shape token-subset selection and decoder attention-mask construction.

This is the TPU-native core of 4M's "sequence scaling by masked token-subset
selection" (reference fm.py:338-475): of the O tokens concatenated across all
modalities, only K enter the encoder / decoder, selected as [all unmasked tokens in
original order, then masked tokens as padding].

The reference implements the selection as `argsort(mask + arange * 1e-6)`
(fm.py:363-366) — a float argsort whose tie-breaking trick limits O to < 1e6 and
wastes a full sort. Here the selection key is an exact integer (mask * O + position)
and we take the K smallest keys via `lax.top_k` on the negated key: deterministic,
exact at any O, and O(N log K) on the VPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax


def select_tokens(mask: jnp.ndarray, num_keep: int) -> jnp.ndarray:
    """Return indices of the `num_keep` selected tokens per batch row.

    Args:
      mask: (B, O) boolean, True = masked out / padding.
      num_keep: static number of tokens to keep.

    Returns:
      (B, num_keep) int32 indices into the O axis: all unmasked tokens in original
      order first, then (if fewer than num_keep are unmasked) masked tokens in
      original order. Matches reference fm.py:363-366 ordering exactly.
    """
    O = mask.shape[-1]
    # reference slices argsort output (fm.py:366): a budget larger than the
    # stream silently clamps — match that instead of raising in top_k
    num_keep = min(num_keep, O)
    positions = jnp.arange(O, dtype=jnp.int32)
    key = mask.astype(jnp.int32) * O + positions  # unmasked sort before masked
    # top_k of the negated key returns the num_keep smallest keys in ascending order.
    _, idx = lax.top_k(-key, num_keep)
    return idx.astype(jnp.int32)


def select_tokens_partition(mask: jnp.ndarray, num_keep: int) -> jnp.ndarray:
    """select_tokens via a cumsum + scatter stable partition instead of a
    sort. The selection order (valid tokens in original order, then masked
    ones) is a two-way stable partition, so the full O(N log N) sort behind
    lax.top_k is unnecessary: two cumsums compute each position's destination
    slot and one scatter inverts the permutation. Bit-identical output to
    select_tokens (tests/test_ops.py). Kept alongside the top_k form so the
    faster one on the current toolchain can be measured and chosen."""
    O = mask.shape[-1]
    num_keep = min(num_keep, O)
    valid = ~mask
    inc = jnp.cumsum(valid.astype(jnp.int32), axis=-1)  # inclusive
    r_valid = inc - valid.astype(jnp.int32)  # exclusive rank among valid
    total = inc[..., -1:]
    r_masked = (jnp.cumsum(mask.astype(jnp.int32), axis=-1)
                - mask.astype(jnp.int32) + total)
    dest = jnp.where(valid, r_valid, r_masked)  # (B, O) permutation
    B = mask.shape[0]
    pos = jnp.broadcast_to(jnp.arange(O, dtype=jnp.int32)[None, :], (B, O))
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, O))
    idx_full = jnp.zeros((B, O), jnp.int32).at[b_idx, dest].set(
        pos, mode="drop", unique_indices=True)
    return idx_full[:, :num_keep]


def gather_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along axis 1 with batched indices. x: (B, O, ...), idx: (B, K)."""
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def compact_position_ids(mask: jnp.ndarray, max_length: Optional[int] = None) -> jnp.ndarray:
    """Positions counted over *unmasked* tokens only, 0 for masked ones.

    Reference encoder_embeddings.py:112-115 / decoder_embeddings.py:127-131:
    pos_id = cumsum(~mask) - 1 with masked positions zeroed, optionally clamping
    positions beyond max_length to 0 (decoder behavior).
    """
    pos = jnp.cumsum((~mask).astype(jnp.int32), axis=-1) - 1
    pos = jnp.where(mask, 0, pos)
    if max_length is not None:
        pos = jnp.where(pos >= max_length, 0, pos)
    return jnp.maximum(pos, 0)


def adapt_decoder_attention_mask(
    compressed: jnp.ndarray,
    mod_mask: Optional[jnp.ndarray],
    causal: bool = False,
    sep_mask: bool = True,
) -> jnp.ndarray:
    """Expand the compressed per-token attention mask to a full (B, M, M) bool mask.

    True = attention NOT allowed. Semantics identical to reference fm.py:440-475:
    cumsum of the compressed mask gives, for each query token, the count of tokens
    it may attend to ([4,0,0,0] -> full attention among 4 tokens; [1,1,1,1] ->
    strictly causal). With `sep_mask`, attention is additionally restricted to
    within-modality (mod ids differ -> masked).
    """
    B, M = compressed.shape
    if causal:
        att = jnp.triu(jnp.ones((M, M), dtype=bool), k=1)
        att = jnp.broadcast_to(att, (B, M, M))
    else:
        arange = jnp.arange(M, dtype=jnp.int32)
        cums = jnp.cumsum(compressed.astype(jnp.int32), axis=-1)  # (B, M)
        att = arange[None, None, :] >= cums[:, :, None]
    if sep_mask and mod_mask is not None:
        att = att | (mod_mask[:, :, None] != mod_mask[:, None, :])
    return att
