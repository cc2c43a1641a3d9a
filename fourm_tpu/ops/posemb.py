"""Sin-cos positional embeddings (MoCo-v3 style).

Numerically identical to the reference builders (fourm/models/fm_utils.py:32-63) so
that released 4M checkpoints, whose buffers were produced by those builders, decode
correctly. Computed in fp32, returned as (N, D) — callers broadcast over batch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_1d_sincos_posemb(max_len: int, embed_dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """1D sin-cos positional embedding, shape (max_len, embed_dim).

    Layout is [sin(out) | cos(out)] over the feature dim (reference fm_utils.py:32-44).
    """
    if embed_dim % 2 != 0:
        raise ValueError("embed_dim must be divisible by 2 for 1D sin-cos posemb")
    pos_dim = embed_dim // 2
    arange = np.arange(max_len, dtype=np.float32)
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out = np.einsum("n,d->nd", arange, omega)
    pos_emb = np.concatenate([np.sin(out), np.cos(out)], axis=1)
    return jnp.asarray(pos_emb, dtype=jnp.float32)


def build_2d_sincos_posemb(h: int, w: int, embed_dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """2D sin-cos positional embedding, shape (h*w, embed_dim).

    Feature layout [sin_w | cos_w | sin_h | cos_h]; the (w, h) meshgrid uses 'ij'
    indexing with the *w* grid varying slowest, matching reference fm_utils.py:46-63
    exactly (released checkpoints depend on this ordering).
    """
    if embed_dim % 4 != 0:
        raise ValueError("embed_dim must be divisible by 4 for 2D sin-cos posemb")
    pos_dim = embed_dim // 4
    grid_w, grid_h = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij"
    )
    omega = np.arange(pos_dim, dtype=np.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out_w = np.einsum("n,d->nd", grid_w.reshape(-1), omega)
    out_h = np.einsum("n,d->nd", grid_h.reshape(-1), omega)
    pos_emb = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )
    return jnp.asarray(pos_emb, dtype=jnp.float32)
