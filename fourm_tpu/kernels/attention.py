"""Pallas TPU kernel: fused masked attention.

4M's attention shapes are short-sequence (128-784 tokens) but heavily masked and
executed thousands of times per generation (SURVEY.md §3 hot loop #1). The XLA
path materializes the (B, H, N, M) logits in HBM between matmul/softmax/matmul;
this kernel keeps the whole per-(batch, head) attention in VMEM: one grid cell
computes q@k^T + bias -> softmax -> @v without touching HBM for intermediates.

At N=784 (448px SR): q/k/v tiles are 784x64 fp32 (~200 KB each) and the logits
tile 784x784 fp32 (~2.4 MB) — comfortably within the ~16 MB VMEM budget, so the
simple one-shot formulation beats a streaming flash kernel at these sizes (no
online-softmax recomputation, full MXU utilization).

`pallas_attention(q, k, v, bias)` matches ops.transformer.dot_product_attention
semantics (fp32 softmax, additive fp32 bias, optional softmax1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(scale: float, allow_zero_attn: bool, has_bias: bool):
    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            b_ref = None
        q = q_ref[0, 0].astype(jnp.float32)  # (N, Dh)
        k = k_ref[0, 0].astype(jnp.float32)  # (M, Dh)
        v = v_ref[0, 0]  # (M, Dh)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (N, M)
        if b_ref is not None:
            logits = logits + b_ref[0, 0]
        if allow_zero_attn:
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), 0.0)
            e = jnp.exp(logits - m)
            probs = e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(-m))
        else:
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jnp.dot(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, 0] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("allow_zero_attn", "interpret"))
def pallas_attention(
    q: jnp.ndarray,  # (B, H, N, Dh)
    k: jnp.ndarray,  # (B, H, M, Dh)
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # fp32 (B, 1|H, N|1, M) additive
    allow_zero_attn: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, N, Dh = q.shape
    M = k.shape[2]
    scale = Dh**-0.5

    in_specs = [
        pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, M, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, M, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    has_bias = bias is not None
    if has_bias:
        if bias.shape[2] == 1:  # broadcast query axis up front (cheap, fp32 N*M)
            bias = jnp.broadcast_to(bias, (B, bias.shape[1], N, M))
        bh = bias.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, 1, N, M),
                (lambda b, h: (b, h, 0, 0)) if bh > 1 else (lambda b, h: (b, 0, 0, 0)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias.astype(jnp.float32))

    out = pl.pallas_call(
        _make_kernel(scale, allow_zero_attn, has_bias),
        out_shape=jax.ShapeDtypeStruct((B, H, N, Dh), q.dtype),
        grid=(B, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, N, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * M * Dh,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize
            + (bias.size * 4 if has_bias else 0),
            transcendentals=B * H * N * M,
        ),
    )(*args)
    return out
