"""Differentiable fused attention for the TRAINING path (custom-vjp pair).

The training step runs fwd+bwd at short 4M sequence lengths (128-512 tokens,
reference cfgs/default/4m/models/main/4m-b_mod7_500b.yaml:9-10: 128 input +
128 target tokens). At these shapes XLA's attention materializes the fp32
(B, H, N, M) logits/probs in HBM between the matmuls — per layer per
direction ~100 MB of round trips at B=32 — while the whole per-batch-row
problem fits VMEM.

Both kernels use ONE grid cell per batch row with an in-kernel loop over
heads (a per-(batch, head) grid is launch-overhead-bound at these sizes:
384 cells of ~30 us of work each measured SLOWER than XLA on v5e; 32 cells
of 12-head loops amortize the per-cell pipeline).

Backward RECOMPUTES the logits from the saved q/k (one extra (N, M) matmul
beats spilling softmax stats to HBM) and produces dq, dk, dv:

    s  = q k^T * scale (+ bias)          p = softmax(s)   [or softmax1]
    dv = p^T do
    dp = do v^T
    D  = rowsum(do * o)                  ds = p * (dp - D)
    dq = ds k * scale                    dk = ds^T q * scale

softmax1 (allow_zero_attn) needs no special casing in the backward: it is
softmax over the keys plus one virtual key with logit 0 and value 0 — the
virtual key receives no value gradient and contributes nothing to D, so the
formulas above hold with p computed by the softmax1 normalizer.

The attention bias here is always a MASK (constant, non-differentiable) —
the vjp returns a zero bias cotangent.

No reference counterpart: the reference trains with plain torch
scaled_dot_product_attention (fourm/models/fm_utils.py:147-180).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-cell VMEM budget: 5 (H, N|M, Dh) fp32 tensors + 4 transient (N, M) fp32
_TRAIN_MAX_NM = 512 * 512
_TRAIN_MAX_ROWS = 64 * 1024  # H * max(N, M) fp32 rows kept resident


def _softmax_p(s, allow_zero_attn):
    if allow_zero_attn:
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), 0.0)
        e = jnp.exp(s - m)
        return e / (jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(-m))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _bias_term(b_ref, bias_mode):
    if bias_mode == "none":
        return None
    return b_ref[0, 0]  # (N, M) full, or (1, M) key (broadcasts over rows)


def _train_fwd_kernel(scale: float, allow_zero_attn: bool, bias_mode: str,
                      num_heads: int):
    def kernel(*refs):
        if bias_mode != "none":
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            b_ref = None
        bias = _bias_term(b_ref, bias_mode)
        for h in range(num_heads):
            # native-dtype MXU dots, fp32 accumulation (bf16 products are
            # exact in fp32; fp32-cast operands lower to the ~6x slower
            # multi-pass fp32 matmul). Matches the XLA reference path, which
            # also feeds bf16 operands to the MXU.
            q = q_ref[0, h]  # (N, Dh)
            k = k_ref[0, h]  # (M, Dh)
            v = v_ref[0, h]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if bias is not None:
                s = s + bias
            p = _softmax_p(s, allow_zero_attn)
            o_ref[0, h] = jnp.dot(p.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32
                                  ).astype(o_ref.dtype)

    return kernel


def _train_bwd_kernel(scale: float, allow_zero_attn: bool, bias_mode: str,
                      num_heads: int):
    def kernel(*refs):
        if bias_mode != "none":
            q_ref, k_ref, v_ref, b_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
            b_ref = None
        bias = _bias_term(b_ref, bias_mode)
        for h in range(num_heads):
            # native-dtype MXU operands, fp32 accumulation (see fwd kernel);
            # fp32 intermediates (p, ds) are cast to the compute dtype for
            # their dots — the same cast XLA's autodiff of the bf16 attention
            # einsums performs.
            q = q_ref[0, h]
            k = k_ref[0, h]
            v = v_ref[0, h]
            dt = q.dtype
            o = o_ref[0, h].astype(jnp.float32)
            do = do_ref[0, h]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if bias is not None:
                s = s + bias
            p = _softmax_p(s, allow_zero_attn)

            dv = jax.lax.dot_general(  # p^T do: (M, Dh)
                p.astype(dt), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(  # do v^T: (N, M)
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            D = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)  # (N, 1)
            ds = (p * (dp - D)).astype(dt)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(  # ds^T q: (M, Dh)
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale

            dq_ref[0, h] = dq.astype(dq_ref.dtype)
            dk_ref[0, h] = dk.astype(dk_ref.dtype)
            dv_ref[0, h] = dv.astype(dv_ref.dtype)

    return kernel


def _bias_mode_and_spec(bias, N, M):
    """Classify the additive mask bias: None, key-only (B, 1, 1, M) (kept
    unbroadcast, block (1, 1, 1, M)), or full (B, 1, N, M)."""
    if bias is None:
        return "none", None, None
    if bias.shape[1] != 1:
        return "unsupported", None, None
    if bias.shape[2] == 1:
        spec = pl.BlockSpec((1, 1, 1, M), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        return "key", spec, bias.astype(jnp.float32)
    spec = pl.BlockSpec((1, 1, N, M), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return "full", spec, bias.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("allow_zero_attn", "interpret"))
def _train_fwd_call(q, k, v, bias, allow_zero_attn=False, interpret=False):
    B, H, N, Dh = q.shape
    M = k.shape[2]
    scale = Dh**-0.5
    bias_mode, bspec, barr = _bias_mode_and_spec(bias, N, M)

    def spec(n):
        return pl.BlockSpec((1, H, n, Dh), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(N), spec(M), spec(M)]
    args = [q, k, v]
    if bias_mode != "none":
        in_specs.append(bspec)
        args.append(barr)

    return pl.pallas_call(
        _train_fwd_kernel(scale, allow_zero_attn, bias_mode, H),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=spec(N),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * M * Dh,
            bytes_accessed=(2 * q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=B * H * N * M,
        ),
    )(*args)


@functools.partial(jax.jit, static_argnames=("allow_zero_attn", "interpret"))
def _train_bwd_call(q, k, v, bias, o, do, allow_zero_attn=False,
                    interpret=False):
    B, H, N, Dh = q.shape
    M = k.shape[2]
    scale = Dh**-0.5
    bias_mode, bspec, barr = _bias_mode_and_spec(bias, N, M)

    def spec(n):
        return pl.BlockSpec((1, H, n, Dh), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(N), spec(M), spec(M)]
    args = [q, k, v]
    if bias_mode != "none":
        in_specs.append(bspec)
        args.append(barr)
    in_specs += [spec(N), spec(N)]
    args += [o, do]

    dq, dk, dv = pl.pallas_call(
        _train_bwd_kernel(scale, allow_zero_attn, bias_mode, H),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        grid=(B,),
        in_specs=in_specs,
        out_specs=[spec(N), spec(M), spec(M)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * N * M * Dh,
            bytes_accessed=3 * (q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=B * H * N * M,
        ),
    )(*args)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_train(q, k, v, has_bias_placeholder=False,
                          allow_zero_attn=False, interpret=False):
    # bias-free variant (separate function so bias=None never traces a None)
    return _train_fwd_call(q, k, v, None, allow_zero_attn=allow_zero_attn,
                           interpret=interpret)


def _fat_fwd(q, k, v, _p, allow_zero_attn, interpret):
    o = _train_fwd_call(q, k, v, None, allow_zero_attn=allow_zero_attn,
                        interpret=interpret)
    return o, (q, k, v, o)


def _fat_bwd(_p, allow_zero_attn, interpret, res, do):
    q, k, v, o = res
    dq, dk, dv = _train_bwd_call(q, k, v, None, o, do,
                                 allow_zero_attn=allow_zero_attn,
                                 interpret=interpret)
    return dq, dk, dv


fused_attention_train.defvjp(_fat_fwd, _fat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_train_bias(q, k, v, bias, allow_zero_attn=False,
                               interpret=False):
    return _train_fwd_call(q, k, v, bias, allow_zero_attn=allow_zero_attn,
                           interpret=interpret)


def _fatb_fwd(q, k, v, bias, allow_zero_attn, interpret):
    o = _train_fwd_call(q, k, v, bias, allow_zero_attn=allow_zero_attn,
                        interpret=interpret)
    return o, (q, k, v, bias, o)


def _fatb_bwd(allow_zero_attn, interpret, res, do):
    q, k, v, bias, o = res
    dq, dk, dv = _train_bwd_call(q, k, v, bias, o, do,
                                 allow_zero_attn=allow_zero_attn,
                                 interpret=interpret)
    # the bias is a mask: constant, non-differentiable
    return dq, dk, dv, jnp.zeros_like(bias)


fused_attention_train_bias.defvjp(_fatb_fwd, _fatb_bwd)


def fused_train_attention_eligible(q, k, bias: Optional[jnp.ndarray]) -> bool:
    """Shape gate for the differentiable fused path: the per-batch-row
    problem (all heads + 4 transient fp32 (N, M) buffers) must fit VMEM."""
    B, H, N, Dh = q.shape
    M = k.shape[2]
    if N * M > _TRAIN_MAX_NM or N < 8 or M < 8:
        return False
    if H * max(N, M) > _TRAIN_MAX_ROWS:
        return False
    # 5 resident (H, N|M, Dh) fp32 tensors + transients, ~11 MB budget
    resident = 5 * H * max(N, M) * Dh * 4 + 4 * N * M * 4
    if resident > 11 * 2**20:
        return False
    if bias is not None and (bias.ndim != 4 or bias.shape[1] != 1):
        return False
    return True


def attention_train(q, k, v, bias=None, allow_zero_attn: bool = False,
                    interpret: bool = False):
    """Differentiable fused attention; caller has checked eligibility."""
    if bias is None:
        return fused_attention_train(q, k, v, False, allow_zero_attn, interpret)
    return fused_attention_train_bias(q, k, v, bias, allow_zero_attn, interpret)
