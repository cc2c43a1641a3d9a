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
        # native-dtype MXU dot with fp32 accumulation (bf16 products are exact
        # in fp32) — a single MXU pass; fp32-cast operands would lower to the
        # ~6x slower multi-pass fp32 matmul
        q = q_ref[0, 0]  # (N, Dh)
        k = k_ref[0, 0]  # (M, Dh)
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


def _flash_kernel(scale: float, allow_zero_attn: bool, bias_mode: str,
                  n_kblocks: int, block_k: int, valid_m: int):
    """Blocked flash attention with online softmax (for long streams where the
    one-shot kernel exceeds VMEM; e.g. the 4M-21 full encoder stream, 3024 tokens).

    bias_mode: "none" | "key" ((B, 1, M) additive key bias, the pad/visibility
    mask case — streamed as (1, 1, bk) blocks, NOT broadcast to (N, M); the
    broadcast form was ~1 MB of bias DMA per grid cell, ~6 ms/layer at 4M's
    B=16/N=2304 prefill) | "full" ((B, H|1, N, M) blocks). Keys beyond
    `valid_m` (block padding) are masked in-kernel by iota — no bias tensor is
    materialized just to express padding."""

    def kernel(*refs):
        if bias_mode != "none":
            q_ref, k_ref, v_ref, b_ref, o_ref, m_scr, l_scr, acc_scr = refs
        else:
            q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
            b_ref = None
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        # native-dtype MXU dots with fp32 accumulation (see _make_kernel)
        q = q_ref[0, 0]  # (Bq, Dh)
        k = k_ref[0, 0]  # (Bk, Dh)
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk)
        if bias_mode == "key":
            s = s + b_ref[0, 0][None, :]
        elif bias_mode == "full":
            s = s + b_ref[0, 0]
        if valid_m % block_k:  # mask padded key positions in the last block
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
            # finite fill (not -inf): keeps s - m_new free of inf-inf NaNs
            s = jnp.where(kidx < valid_m, s, jnp.finfo(jnp.float32).min)

        m_prev = m_scr[:, 0:1]  # (Bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        )
        m_scr[:, 0:1] = m_new
        l_scr[:, 0:1] = l_new

        @pl.when(ki == n_kblocks - 1)
        def _():
            denom = l_scr[:, 0:1]
            if allow_zero_attn:  # softmax1: virtual zero logit in the denominator
                denom = denom + jnp.exp(-m_scr[:, 0:1])
            o_ref[0, 0] = (acc_scr[:] / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "allow_zero_attn", "interpret", "block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,  # (B, H, N, Dh)
    k: jnp.ndarray,  # (B, H, M, Dh)
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    allow_zero_attn: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    # Default blocks are 1024: at the 4M-21 prefill shapes (B=16, H=12,
    # N=M=2304-3072) the kernel is per-cell-overhead-bound, not VMEM-bound —
    # 512-blocks run 6912 grid cells at N=3072 (12.8 ms/layer) vs 1728 with
    # 1024-blocks; the fp32 logits tile at 1024x1024 is 4 MB, well in budget.
    B, H, N, Dh = q.shape
    M = k.shape[2]
    scale = Dh**-0.5
    # prefer block sizes that divide the sequence exactly (no pad DMA waste);
    # e.g. the 4M-21 prefill stream N=M=2304 tiles cleanly at 768, not 512
    def _pick(n, pref):
        for c in (1024, 768, 512, 384, 256, 128):
            if c <= pref and n % c == 0:
                return c
        return min(pref, n)

    block_q = _pick(N, block_q)
    block_k = _pick(M, block_k)
    pad_q = (-N) % block_q
    pad_k = (-M) % block_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    Np, Mp = q.shape[2], k.shape[2]
    nq, nk = Np // block_q, Mp // block_k

    # bias handling: key-only (B, 1, 1, M) biases stream as (1, 1, bk) blocks;
    # padding is masked in-kernel via iota (no bias materialization)
    if bias is None:
        bias_mode = "none"
    elif bias.shape[1] == 1 and bias.shape[2] == 1:
        bias_mode = "key"
        bias = bias.astype(jnp.float32).reshape(B, 1, M)
        if pad_k:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad_k)))
    else:
        bias_mode = "full"
        if bias.shape[2] == 1:
            bias = jnp.broadcast_to(bias, (B, bias.shape[1], N, M))
        bias = jnp.pad(bias.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, pad_q), (0, pad_k)))

    in_specs = [
        pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, qi, ki: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, qi, ki: (b, h, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, qi, ki: (b, h, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias_mode == "key":
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, h, qi, ki: (b, 0, ki),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    elif bias_mode == "full":
        bh = bias.shape[1]
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q, block_k),
            (lambda b, h, qi, ki: (b, h, qi, ki)) if bh > 1
            else (lambda b, h, qi, ki: (b, 0, qi, ki)),
            memory_space=pltpu.VMEM,
        ))
        args.append(bias)

    out = pl.pallas_call(
        _flash_kernel(scale, allow_zero_attn, bias_mode, nk, block_k, M),
        out_shape=jax.ShapeDtypeStruct((B, H, Np, Dh), q.dtype),
        grid=(B, H, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, Dh), lambda b, h, qi, ki: (b, h, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom
            pltpu.VMEM((block_q, Dh), jnp.float32),  # running accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Np * Mp * Dh,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=B * H * Np * Mp,
        ),
    )(*args)
    return out[:, :, :N] if pad_q else out


def _mha_short_kernel(scale: float, allow_zero_attn: bool, has_bias: bool,
                      num_heads: int, head_dim: int):
    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            b_ref = None
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            # native-dtype MXU dot, fp32 accumulate (see _make_kernel)
            q = q_ref[0, :, sl]  # (N, Dh)
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # (N, N)
            if b_ref is not None:
                logits = logits + b_ref[0]
            if allow_zero_attn:
                m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), 0.0)
                e = jnp.exp(logits - m)
                probs = e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(-m))
            else:
                probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.dot(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
            o_ref[0, :, sl] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "allow_zero_attn", "interpret"))
def pallas_mha_short(
    qkv: jnp.ndarray,  # (B, N, 3*H*Dh) — the fused QKV projection output
    num_heads: int,
    bias: Optional[jnp.ndarray] = None,  # fp32 (B, N) additive KEY bias
    allow_zero_attn: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head self-attention for SHORT sequences (N <= ~1024), one grid
    cell per batch row, all heads processed in-kernel via lane slices.

    Motivation (profiled on v5e, ViT-B @ 196 tokens, B=64): the per-(batch,
    head) one-shot kernel ran 768 tiny grid cells (attention 6.3 ms/batch,
    ~5x over compute) and its (B, H, N, Dh) input layout forced 3.5 ms of
    qkv slice/transpose fusions plus layout copies. A 5-D (B, N, 3, H, Dh)
    input was no better: XLA relayouts the matmul output into the custom
    call's default layout (~0.38 ms/layer of pure copies). This version
    takes three (B, N, C) lane-slices of the fused QKV matmul output — the
    slices fuse into the matmul epilogue (or are sliced in-VMEM when the
    producer is the pallas_ln_matmul custom call), each grid cell covers one
    batch row's N-token block, heads are sliced on the lane dimension
    in-VMEM, and the (B, N, C) output feeds the output projection with no
    transposes or reshapes anywhere. Keeping every custom-call edge at the
    same rank matters: XLA materializes reshape copies between consecutive
    custom calls (~0.09 ms/layer each at ViT-B/196 B=64).

    Returns (B, N, H*Dh) in qkv.dtype.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    head_dim = C // num_heads
    scale = head_dim**-0.5
    q, k, v = qkv[:, :, :C], qkv[:, :, C : 2 * C], qkv[:, :, 2 * C :]

    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec]
    args = [q, k, v]
    if bias is not None:
        # (B, 1, N) layout: see pallas_attn_block — a (1, N) block over (B, N)
        # violates Mosaic's sublane divisibility for B > 1
        in_specs.append(pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32)[:, None, :])

    return pl.pallas_call(
        _mha_short_kernel(scale, allow_zero_attn, bias is not None,
                          num_heads, head_dim),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * N * head_dim,
            bytes_accessed=(qkv.size + qkv.size // 3) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
    )(*args)


# one-shot kernel VMEM budget: logits + bias + q/k/v tiles must fit ~16 MB
_ONESHOT_MAX_NM = 1024 * 1024


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
    if N * M > _ONESHOT_MAX_NM:
        return flash_attention(q, k, v, bias, allow_zero_attn=allow_zero_attn,
                               interpret=interpret)

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


def _attn_block_kernel(scale: float, eps: float, allow_zero_attn: bool,
                       has_bias: bool, has_bq: bool, has_bp: bool,
                       num_heads: int, head_dim: int):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        gamma = next(it)[...]
        beta_ref = next(it)[...]  # norm bias always passed (zeros when absent)
        wq = next(it)[...]
        bq = next(it)[...] if has_bq else None
        wp = next(it)[...]
        bp = next(it)[...] if has_bp else None
        b_ref = next(it) if has_bias else None
        o_ref = next(it)

        xb = x_ref[0]
        x32 = xb.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        h = ((x32 - mean) * jax.lax.rsqrt(var + eps) * gamma + beta_ref).astype(wq.dtype)
        qkv = jnp.dot(h, wq, preferred_element_type=jnp.float32)
        if bq is not None:
            qkv = qkv + bq
        qkv = qkv.astype(wq.dtype)  # (N, 3C)
        C = num_heads * head_dim
        outs = []
        for hh in range(num_heads):
            sl = slice(hh * head_dim, (hh + 1) * head_dim)
            # native-dtype MXU dot, fp32 accumulate (see _make_kernel)
            q = qkv[:, sl]
            k = qkv[:, C + hh * head_dim : C + (hh + 1) * head_dim]
            v = qkv[:, 2 * C + hh * head_dim : 2 * C + (hh + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if b_ref is not None:
                logits = logits + b_ref[0]
            if allow_zero_attn:
                m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), 0.0)
                e = jnp.exp(logits - m)
                probs = e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(-m))
            else:
                probs = jax.nn.softmax(logits, axis=-1)
            outs.append(jnp.dot(probs.astype(v.dtype), v,
                                preferred_element_type=jnp.float32).astype(wq.dtype))
        attn = jnp.concatenate(outs, axis=-1)  # (N, C)
        out = jnp.dot(attn, wp, preferred_element_type=jnp.float32)
        if bp is not None:
            out = out + bp
        o_ref[0] = xb + out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "eps", "allow_zero_attn",
                                             "interpret"))
def pallas_attn_block(
    x: jnp.ndarray,  # (B, N, C)
    gamma: jnp.ndarray,  # fp32 (C,) LN scale
    beta,  # fp32 (C,) LN bias or None
    w_qkv: jnp.ndarray,  # (C, 3C) compute dtype
    b_qkv,  # fp32 (3C,) or None
    w_proj: jnp.ndarray,  # (C, C)
    b_proj,  # fp32 (C,) or None
    num_heads: int,
    bias=None,  # fp32 (B, N) additive key bias
    eps: float = 1e-6,
    allow_zero_attn: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """The complete pre-norm attention half of a transformer block as ONE
    kernel: x + proj(MHA(qkv(LN(x)))). One grid cell per image; the QKV
    projection output never leaves VMEM (the 3-kernel chain round-trips a
    (B, N, 3C) tensor through HBM twice — at ViT-B/196 B=64 that is 58 MB
    each way; measured 1.81 vs 2.10 ms per block-half isolated on v5e).
    Weights use constant index maps and stay VMEM-resident across cells.
    Inference-only, short sequences (caller checks the VMEM working set)."""
    B, N, C = x.shape
    head_dim = C // num_heads
    scale = head_dim**-0.5
    has_bq = b_qkv is not None
    has_bp = b_proj is not None
    cast = lambda a: a.astype(jnp.float32)
    beta_arr = cast(beta) if beta is not None else jnp.zeros((C,), jnp.float32)

    spec3 = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b: (0,) * nd), memory_space=pltpu.VMEM)

    in_specs = [spec3, const_spec(gamma.shape), const_spec(beta_arr.shape),
                const_spec(w_qkv.shape)]
    args = [x, cast(gamma), beta_arr, w_qkv]
    if has_bq:
        in_specs.append(const_spec(b_qkv.shape))
        args.append(cast(b_qkv))
    in_specs.append(const_spec(w_proj.shape))
    args.append(w_proj)
    if has_bp:
        in_specs.append(const_spec(b_proj.shape))
        args.append(cast(b_proj))
    if bias is not None:
        # (B, 1, N) with (1, 1, N) blocks: a plain (B, N) array would need an
        # (1, N) block whose sublane dim (1) is neither 8-divisible nor equal
        # to B — Mosaic rejects it for any B > 1
        in_specs.append(pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32)[:, None, :])

    return pl.pallas_call(
        _attn_block_kernel(scale, eps, allow_zero_attn, bias is not None,
                           has_bq, has_bp, num_heads, head_dim),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=spec3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * C * 4 * C + 4 * B * num_heads * N * N * head_dim,
            bytes_accessed=(2 * x.size + w_qkv.size + w_proj.size) * x.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
    )(*args)


def _flash_mha_kernel(scale, eps, allow_zero_attn, qk_norm, qn_bias, kn_bias,
                      bias_mode, heads_per_group, head_dim, compute_dtype):
    """One-shot head-group MHA: each grid cell holds the FULL key length for a
    group of heads, so every head finishes its softmax in one pass — no
    online-softmax running max/denominator/accumulator-rescale at all. At 4M
    prefill shapes (B=16, H=12, N=M=2304) the rescale bookkeeping of the old
    (q-block, k-block) flash form cost ~3 ms/layer on top of ~4 ms of MXU
    work (measured sweep, round 5); this form runs the same shapes in
    ~4.5 ms. K/V group blocks are revisited across consecutive q-block cells
    (grid order (B, G, nq)), so Mosaic keeps them resident. Per-head QK-norm
    runs in-kernel; the normed K block is computed once per (batch, group)
    cell visit and cached in scratch across that group's q blocks."""

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)  # (1, bq, Cg)
        k_ref = next(it)  # (1, Mp, Cg)
        v_ref = next(it)
        qn_g = next(it)[...] if qk_norm else None
        qn_b = next(it)[...] if qn_bias else None
        kn_g = next(it)[...] if qk_norm else None
        kn_b = next(it)[...] if kn_bias else None
        b_ref = next(it) if bias_mode == "key" else None  # (1, 1, Mp)
        o_ref = next(it)  # (1, bq, Cg)
        kn_scr = next(it) if qk_norm else None  # (Mp, Cg) normed K cache

        def _ln(x32, g, b):
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            y = (x32 - mean) * jax.lax.rsqrt(var + eps) * g
            return y + b if b is not None else y

        qi = pl.program_id(2)
        if qk_norm:
            # normed K is shared by every q block of this (batch, group) run
            @pl.when(qi == 0)
            def _():
                for hh in range(heads_per_group):
                    sl = slice(hh * head_dim, (hh + 1) * head_dim)
                    kn_scr[:, sl] = _ln(
                        k_ref[0, :, sl].astype(jnp.float32), kn_g, kn_b
                    ).astype(compute_dtype)

        qb = q_ref[0]  # (bq, Cg)
        vb = v_ref[0]  # (Mp, Cg)
        bias = b_ref[0, 0][None, :] if b_ref is not None else None  # (1, Mp)

        for hh in range(heads_per_group):
            sl = slice(hh * head_dim, (hh + 1) * head_dim)
            q_h = qb[:, sl]
            if qk_norm:
                # match Attention._split_qkv: LN in fp32, cast to compute
                q_h = _ln(q_h.astype(jnp.float32), qn_g, qn_b).astype(compute_dtype)
                k_h = kn_scr[:, sl]
            else:
                k_h = k_ref[0, :, sl]
            # compute-dtype MXU dots with fp32 accumulation — operand values
            # are bf16-representable either way (post-LN cast / native qkv
            # dtype); a single MXU pass instead of the multi-pass fp32 form
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (bq, Mp)
            if bias is not None:
                s = s + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            if allow_zero_attn:
                m = jnp.maximum(m, 0.0)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            if allow_zero_attn:
                denom = denom + jnp.exp(-m)
            # p cast to compute dtype exactly as the XLA path casts probs
            o = jax.lax.dot_general(
                p.astype(compute_dtype), vb[:, sl],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "eps", "allow_zero_attn", "interpret"))
def pallas_flash_mha(
    q: jnp.ndarray,  # (B, N, C) lane-concat heads (e.g. a QKV output slice)
    k: jnp.ndarray,  # (B, M, C)
    v: jnp.ndarray,
    num_heads: int,
    bias=None,  # fp32 (B, M) additive KEY bias, or None
    qn_gamma=None,  # fp32 (Dh,) per-head q-norm scale, or None
    qn_beta=None,
    kn_gamma=None,
    kn_beta=None,
    eps: float = 1e-6,
    allow_zero_attn: bool = False,
    interpret: bool = False,
):
    """Long-sequence multi-head attention, one-shot per head over the FULL
    key length (no online softmax), grid over (batch, head-group, q-block)
    with optional in-kernel per-head QK-norm. Input/output layout is
    (B, N, C) lane-concatenated heads — zero transposes against the fused
    LN+QKV producer and the out-projection consumer. Returns (B, N, C).
    Returns None when no lane-aligned blocking fits VMEM (caller falls back
    to the per-head paths)."""
    B, N, C = q.shape
    M = k.shape[1]
    Dh = C // num_heads
    scale = Dh**-0.5
    itemsize = jnp.dtype(q.dtype).itemsize
    qk_norm = qn_gamma is not None

    if M % 128:
        return None

    # Group/blocking search, calibrated against a 30-point on-chip sweep of
    # (G, bq) x {M=768 B=32, M=1792 B=32, M=2304 B=16} scoped-vmem outcomes
    # (2026-08-19; /tmp/flash_oom_sweep.py pattern). Mosaic keeps roughly one
    # (bq, M) fp32 s/p tile pair LIVE PER UNROLLED HEAD, so the working-set
    # model adds Hg*bq*M*4 on top of the stream/scratch terms; head groups
    # with Hg > 6 blow the budget at every measured geometry (the round-4
    # first-fit started at G=1/Hg=12 and OOM'd the B=32 CFG chain shapes).
    # Among passing configs the LARGEST bq is fastest (MXU efficiency), with
    # smallest G as the tie-break — this reproduces the measured-fastest
    # config at all three sweep geometries (2.82/6.81/5.48 ms per call).
    # 21 MB bound: the sweep's slowest accepted config modeled 20.3 MB and
    # ran; its cheapest rejected config modeled 22.2 MB and OOM'd (16 MB
    # scoped limit — the model intentionally overcounts streams).
    candidates = []
    for G in range(1, num_heads + 1):
        # G=1 blocks carry the FULL channel dim (always Mosaic-legal);
        # head-group slices (G>1) must be 128-divisible on lanes
        if num_heads % G or (G > 1 and (C // G) % 128):
            continue
        Hg_c = num_heads // G
        if Hg_c > 6:
            continue
        Cg = C // G
        for bq in (512, 384, 256, 128):
            if bq > N or N % bq:
                continue
            vmem = (2 * 2 * M * Cg * itemsize       # k + v, double-buffered
                    + 2 * 2 * bq * Cg * itemsize    # q + out, double-buffered
                    + 2 * bq * M * 4                # s + p fp32 stack tiles
                    + bq * Cg * 4                   # o fp32 accumulator
                    + (M * Cg * itemsize if qk_norm else 0)
                    + Hg_c * bq * M * 4)            # per-unrolled-head live tiles
            if vmem <= 21 * 2**20:
                candidates.append((bq, -G))
    if not candidates:
        return None
    bq, negG = max(candidates)
    G = -negG
    Hg = num_heads // G
    nq = N // bq

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda b, g, qi: (0,) * nd),
                            memory_space=pltpu.VMEM)

    cast = lambda a: a.astype(jnp.float32)
    Cg = C // G
    in_specs = [
        pl.BlockSpec((1, bq, Cg), lambda b, g, qi: (b, qi, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, Cg), lambda b, g, qi: (b, 0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, Cg), lambda b, g, qi: (b, 0, g),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if qk_norm:
        for a in (qn_gamma, qn_beta, kn_gamma, kn_beta):
            if a is not None:
                in_specs.append(const_spec(a.shape))
                args.append(cast(a))
    bias_mode = "none"
    if bias is not None:
        bias_mode = "key"
        in_specs.append(pl.BlockSpec((1, 1, M), lambda b, g, qi: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32)[:, None, :])

    return pl.pallas_call(
        _flash_mha_kernel(scale, eps, allow_zero_attn, qk_norm,
                          qn_beta is not None, kn_beta is not None, bias_mode,
                          Hg, Dh, q.dtype),
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        grid=(B, G, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, Cg), lambda b, g, qi: (b, qi, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((M, Cg), q.dtype)] if qk_norm else []),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * N * M * Dh,
            bytes_accessed=(q.size + k.size + v.size + q.size) * itemsize,
            transcendentals=B * num_heads * N * M,
        ),
    )(*args)
