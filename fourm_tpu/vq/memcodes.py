"""Memcodes: attention-based Gumbel quantizer (reference
fourm/vq/quantizers/quantize_memcodes.py:25-120, from lucidrains' NWT).

Channel-last (B, N, dim) like VectorQuantize; hard straight-through Gumbel-softmax
attention onto per-head learned code keys/values.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


class Memcodes(nn.Module):
    dim: int
    codebook_size: int
    heads: int = 1
    temperature: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.dim % self.heads != 0:
            raise ValueError("dim must be divisible by heads")
        cdim = self.dim // self.heads
        self.codes = self.param(
            "codes", nn.initializers.normal(1.0), (self.heads, self.codebook_size, cdim),
            jnp.float32,
        )
        # per-head mixing weights (reference Mix layers)
        self.w_k = self.param("to_k", nn.initializers.lecun_normal(), (self.heads, cdim, cdim), jnp.float32)
        self.w_v = self.param("to_v", nn.initializers.lecun_normal(), (self.heads, cdim, cdim), jnp.float32)

    def _kv(self):
        k = jnp.einsum("hnd,hdc->hnc", self.codes, self.w_k)
        v = jnp.einsum("hnd,hdc->hnc", self.codes, self.w_v)
        return k, v

    def indices_to_embedding(self, indices: jnp.ndarray) -> jnp.ndarray:
        """(B, N) or (B, N, heads) -> (B, N, dim)."""
        _, v = self._kv()
        if self.heads == 1:
            out = jnp.take(v[0], indices, axis=0)
            return out.reshape(indices.shape + (self.dim,))
        # (B, N, H) -> gather per head
        gathered = jnp.stack(
            [jnp.take(v[h], indices[..., h], axis=0) for h in range(self.heads)], axis=-2
        )  # (B, N, H, cdim)
        return gathered.reshape(indices.shape[:-1] + (self.dim,))

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, N, C = x.shape
        cdim = C // self.heads
        q = x.reshape(B, N, self.heads, cdim).transpose(0, 2, 1, 3) * cdim**-0.5
        k, v = self._kv()
        logits = jnp.einsum("bhid,hjd->bhij", q.astype(jnp.float32), k)

        if train:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(self.make_rng("rng"), logits.shape, minval=1e-20, maxval=1.0)
            ))
            soft = jax.nn.softmax((logits + g) / self.temperature, axis=-1)
            ind = jnp.argmax(soft, axis=-1)
            hard = jax.nn.one_hot(ind, self.codebook_size, dtype=soft.dtype)
            attn = hard + soft - jax.lax.stop_gradient(soft)  # straight-through
        else:
            ind = jnp.argmax(logits, axis=-1)
            attn = jax.nn.one_hot(ind, self.codebook_size, dtype=jnp.float32)

        out = jnp.einsum("bhij,hjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(x.dtype)
        ind = ind[:, 0] if self.heads == 1 else ind.transpose(0, 2, 1)
        return out, ind, jnp.zeros((), jnp.float32)
