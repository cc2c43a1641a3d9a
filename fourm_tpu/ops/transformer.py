"""Transformer primitives for 4M-TPU.

Functionally equivalent to the reference primitives (fourm/models/fm_utils.py:93-388):
pre-LN blocks, bias-optional LayerNorm, SwiGLU gated MLP, attention with boolean
pad/attention masks (True = masked out), optional QK-norm, optional softmax-off-by-one,
stochastic depth. Redesigned for TPU/XLA:

  * boolean masks are converted once to an fp32 additive bias and broadcast across
    heads — no per-head masked_fill;
  * softmax runs in fp32 regardless of compute dtype (bf16-safe);
  * all module parameters live in fp32 (`param_dtype`), activations in `dtype`;
  * attention is a single einsum pipeline XLA can fuse / tile onto the MXU;
  * Attention/CrossAttention/DecoderBlock expose incremental `step`/`kv` methods for
    KV-cache autoregressive decoding (the reference re-runs the full decoder per
    generated token, generate.py:888-918 — the cache is the TPU fix).

Parameter/submodule names intentionally mirror the reference module tree
(qkv/proj/fc1/fc2/fc3/norm1/norm2/self_attn/cross_attn/...) so that the safetensors
checkpoint importer is a mechanical rename.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gelu_exact(x):
    """Exact (erf) GELU, matching torch nn.GELU (reference fm_utils act_layer)."""
    return nn.gelu(x, approximate=False)

Dtype = jnp.dtype

# --------------------------------------------------------- activation sharding
# Tensor-parallel activation sharding hook. parallel.train installs a sharder
# (parallel/mesh.py activation_sharder) while tracing a mesh'd step so that
# attention heads and MLP hidden activations stay sharded over the 'tensor'
# axis between the column- and row-parallel matmuls. No-op without a mesh.
import contextvars as _contextvars

_ACTIVATION_SHARDER = _contextvars.ContextVar("fourm_activation_sharder", default=None)


def set_activation_sharder(sharder):
    """Install (or clear with None) the activation sharder; returns a token
    for reset()."""
    return _ACTIVATION_SHARDER.set(sharder)


def reset_activation_sharder(token):
    _ACTIVATION_SHARDER.reset(token)


def shard_activation(x, kind: str):
    sharder = _ACTIVATION_SHARDER.get()
    return sharder(x, kind) if sharder is not None else x

# Large negative fill for masked logits; matches reference masked_fill(-finfo.max)
# (fm_utils.py:168) while staying finite so fully-masked rows don't produce NaNs.
MASK_FILL_VALUE = jnp.finfo(jnp.float32).min


def softmax1(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax with an implicit extra zero logit ("attention is off by one").

    Equivalent to reference fm_utils.py:28-30 (pad with a 0 logit, softmax, drop it),
    computed stably without padding.
    """
    m = jnp.maximum(jnp.max(logits, axis=axis, keepdims=True), 0.0)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=axis, keepdims=True) + jnp.exp(-m)
    return e / denom


def mask_to_bias(mask: Optional[jnp.ndarray], num_query: int) -> Optional[jnp.ndarray]:
    """Convert a boolean mask (True = masked out) to an fp32 additive bias of shape
    (B, 1, Q, K), broadcastable over heads.

    Accepts (B, K), (B, 1, K) or (B, Q, K) masks — the same shapes the reference
    feeds to masked_fill (fm.py:485, fm.py:515).
    """
    if mask is None:
        return None
    if mask.ndim == 2:
        mask = mask[:, None, :]
    if mask.ndim != 3:
        raise ValueError(f"mask must be 2D or 3D, got shape {mask.shape}")
    bias = jnp.where(mask, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
    return bias[:, None, :, :]  # (B, 1, Q or 1, K)


# Global attention implementation switch: "xla" (differentiable, default),
# "pallas" (fused VMEM-resident kernel, inference-only — pallas_call has no
# vjp), or "pallas_train" (custom-vjp fused pair, kernels/attention_bwd.py —
# differentiable; used by build_train_step on single-chip TPU).
# GenerationSampler and the VQ tokenize path enable pallas via use_pallas_attention().
#
# Both switches are TRACE-TIME ContextVars (re-entrant and thread/async-safe):
# they are read while jit traces a function, and they are NOT part of jax's
# jit cache key. A function jitted under one setting silently reuses that
# trace on later calls — always jit a FRESH closure inside the context
# (bench.py make_loop is the pattern).
_ATTN_IMPL = _contextvars.ContextVar("fourm_attn_impl", default="xla")

# Fused Pallas decode-step switch (DecoderBlock._fused_step). Three modes:
#   "off"    — pure XLA step (the default)
#   "on"     — all three fused kernels (self-decode, cross-decode, MLP)
#   "hybrid" — fused kernels for self-attention + MLP, XLA decode_attention
#              for the cross-attention KV stream. Motivation (round-5
#              ablation, scripts/profile_decode_ablate.py): the XLA cross
#              read runs within 4% of the achievable HBM floor (576 GB/s on
#              the 1.3 GiB/token stream), so only the self/MLP slack
#              (~0.9 ms of 3.46 ms/token) is recoverable by kernels — the
#              all-fused mode loses exactly because its cross kernel is
#              slower than XLA's.
# On the 2026-08-18 toolchain (jax 0.9.0 / libtpu 0.0.34) the XLA decode path
# measures FASTER than the all-fused kernels at 4M-B chain shapes (bench.py
# ar_decode_ms_per_token 3.56 xla vs 3.91 fused — the pre-outage round-4
# toolchain measured the opposite, 185 vs 284 us/layer-step). All kernels
# stay parity-tested; bench.py races every mode each run and auto-selects.
# Flip manually with FOURM_FUSED_DECODE=1|hybrid (read lazily, so post-import
# exports take effect) or use_fused_decode(). int8 cross-KV always routes
# through the fused cross kernel (the XLA fallback dequantizes — oracle only).
import os as _os

_FUSED_DECODE = _contextvars.ContextVar("fourm_fused_decode", default=None)


def _fused_decode_mode() -> str:
    val = _FUSED_DECODE.get()
    if val is None:  # unset: fall back to the env var, read lazily
        val = _os.environ.get("FOURM_FUSED_DECODE", "0")
    if val in (True, 1, "1", "on"):
        return "on"
    if val == "hybrid":
        return "hybrid"
    return "off"


class use_fused_decode:
    """Context manager: select the fused Pallas decode-step mode
    (True/"on", "hybrid", or False/"off" — see _FUSED_DECODE).

    TRACE-TIME switch, not a jit-cache key: any function jitted outside (or
    under a different setting) keeps its old trace — jit a fresh closure
    inside the context. Re-entrant and thread-safe (ContextVar-backed)."""

    def __init__(self, enable=True):
        self.val = enable
        self._tokens = []  # stack: one instance may be nested re-entrantly

    def __enter__(self):
        self._tokens.append(_FUSED_DECODE.set(self.val))

    def __exit__(self, *exc):
        _FUSED_DECODE.reset(self._tokens.pop())


# Decode-attention implementation switch: "xla" (fused convert+multiply+
# sublane-reduce on the VPU, the default) vs "mxu" (kernels/decode_step.py
# pallas_decode_attention — streams the KV blocks through the MXU as native
# bf16 operands). On the 2026-08-19 toolchain (jax 0.9.0/libtpu 0.0.34) the
# MXU form LOSES in the production decode loop (5.24 vs 4.06 ms/token at
# 4M-B chain shapes — single-row MXU dots are launch/latency-bound, not
# bandwidth-bound); it stays parity-tested and bench.py races every path
# each run and auto-selects the winner (headline_decode_path records it).
# Same trace-time ContextVar semantics as the switches above.
_DECODE_ATTN = _contextvars.ContextVar("fourm_decode_attn", default=None)


def _decode_attn_impl() -> str:
    val = _DECODE_ATTN.get()
    if val is None:  # unset: fall back to the env var, read lazily
        return _os.environ.get("FOURM_DECODE_ATTN", "xla")
    return val


class use_decode_attn:
    """Context manager: select the decode-attention implementation ("mxu" or
    "xla"). TRACE-TIME switch, not a jit-cache key — jit a fresh closure
    inside the context (see use_fused_decode). Re-entrant and thread-safe."""

    def __init__(self, impl: str = "mxu"):
        assert impl in ("xla", "mxu")
        self.val = impl
        self._tokens = []  # stack: one instance may be nested re-entrantly

    def __enter__(self):
        self._tokens.append(_DECODE_ATTN.set(self.val))

    def __exit__(self, *exc):
        _DECODE_ATTN.reset(self._tokens.pop())


def set_attention_impl(impl: str):
    assert impl in ("xla", "pallas", "pallas_train")
    _ATTN_IMPL.set(impl)


class _attn_impl_ctx:
    """Shared ContextVar-backed context manager for the attention switch
    (re-entrant, thread-safe; same trace-time caveat as use_fused_decode)."""

    impl = "xla"

    def __init__(self, enable: bool = True):
        self._impl = self.impl if enable else "xla"
        self._tokens = []  # stack: one instance may be nested re-entrantly

    def __enter__(self):
        self._tokens.append(_ATTN_IMPL.set(self._impl))

    def __exit__(self, *exc):
        _ATTN_IMPL.reset(self._tokens.pop())


class use_pallas_attention(_attn_impl_ctx):
    """Context manager: route dot_product_attention through the Pallas kernel
    (trace-time switch; use around inference jit boundaries only)."""

    impl = "pallas"


class use_fused_train_attention(_attn_impl_ctx):
    """Context manager: route dot_product_attention through the DIFFERENTIABLE
    fused Pallas pair (kernels/attention_bwd.py) — trace-time switch for the
    training step. Falls back to XLA per-call when shapes don't fit the
    one-shot VMEM budget, on non-TPU backends, or under TP activation
    sharding."""

    impl = "pallas_train"


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    allow_zero_attn: bool = False,
) -> jnp.ndarray:
    """Attention core. q,k,v: (B, H, N|M, Dh). bias: fp32 (B, 1|H, N, M) additive.

    Logits/softmax in fp32 for bf16 stability; output cast back to q.dtype.
    Tiny-query shapes (KV-cached AR decode, N<=2) always take the XLA path:
    per-call Pallas launch overhead (~24 kernels/decode-step across the
    decoder) measured +1.2 ms/token on v5e vs fused XLA ops.
    """
    if (_ATTN_IMPL.get() == "pallas" and jax.default_backend() == "tpu"
            and q.shape[2] > 2):
        from ..kernels.attention import pallas_attention

        return pallas_attention(q, k, v, bias, allow_zero_attn=allow_zero_attn)
    if (_ATTN_IMPL.get() == "pallas_train" and jax.default_backend() == "tpu"
            and _ACTIVATION_SHARDER.get() is None):
        from ..kernels.attention_bwd import (
            attention_train,
            fused_train_attention_eligible,
        )

        if fused_train_attention_eligible(q, k, bias):
            return attention_train(q, k, v, bias, allow_zero_attn)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = softmax1(logits) if allow_zero_attn else jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(v.dtype), v)
    return out


def decode_attention(
    q: jnp.ndarray,  # (B, H, 1, Dh)
    k_dm: jnp.ndarray,  # (B, H, Dh, M) — decode layout (lanes = M, dense tiles)
    v_dm: jnp.ndarray,  # (B, H, Dh, M)
    bias: Optional[jnp.ndarray] = None,  # fp32 (B|1, 1|H, M) additive
    allow_zero_attn: bool = False,
) -> jnp.ndarray:
    """Single-query attention against (B, H, Dh, M)-layout K/V.

    KV-cached decoding is bandwidth-bound on reading K/V every token. TPU
    memory tiles are (8 sublanes x 128 lanes) over the last two dims; with the
    standard (B, H, M, Dh=64) layout every tile is half-empty and each read
    moves 2x the logical bytes (measured 134 us vs the 61 us speed-of-light
    for a 50 MB cross-KV read on v5e). This formulation keeps M on lanes:
    q*k reduces over Dh (sublanes), p*v reduces over M (lanes), both reading
    dense tiles. Math identical to dot_product_attention (fp32 accumulation,
    fp32 softmax; bf16 products are exact in fp32).

    Returns (B, H, 1, Dh).
    """
    if _decode_attn_impl() == "mxu" and jax.default_backend() == "tpu":
        from ..kernels.decode_step import pallas_decode_attention

        out = pallas_decode_attention(q, k_dm, v_dm, bias, allow_zero_attn)
        if out is not None:
            return out
    scale = q.shape[-1] ** -0.5
    q_d = jnp.swapaxes(q, 2, 3).astype(jnp.float32)  # (B, H, Dh, 1)
    logits = jnp.sum(q_d * k_dm.astype(jnp.float32), axis=2)  # (B, H, M)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = softmax1(logits) if allow_zero_attn else jax.nn.softmax(logits, axis=-1)
    probs = probs.astype(v_dm.dtype)  # (B, H, M)
    out = jnp.sum(probs[:, :, None, :] * v_dm, axis=3)  # (B, H, Dh)
    return out[:, :, None, :].astype(q.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with an optional bias term (reference fm_utils.py:93-112).

    `__call__(x, return_params=True)` declares the same parameters but returns
    the raw (weight, bias) arrays instead of normalizing — used by the fused
    Pallas block fast paths to hand LN params straight into a kernel.
    """

    eps: float = 1e-6
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
                if self.use_bias else None)
        if return_params:
            return weight, bias
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * weight
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


class _Lin(nn.Module):
    """Parameter holder matching nn.Dense's param tree ({kernel, bias}) so the
    owning module can route the same weights through either an XLA matmul or a
    fused Pallas kernel without touching checkpoint names."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


def _dense(x, kernel, bias, dtype):
    # numerically identical to nn.Dense(dtype=dtype): cast everything to the
    # compute dtype, matmul (f32 MXU accumulation), add bias in compute dtype
    y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class Mlp(nn.Module):
    """Standard 2-layer MLP (reference fm_utils.py:114-126)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = gelu_exact
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        out_dim = self.out_dim or x.shape[-1]
        w1, b1 = _Lin(self.hidden_dim, self.use_bias, name="fc1")(x.shape[-1])
        w2, b2 = _Lin(out_dim, self.use_bias, name="fc2")(self.hidden_dim)
        if return_params:
            return w1, b1, w2, b2
        x = _dense(x, w1, b1, self.dtype)
        x = shard_activation(self.act(x), "mlp_hidden")
        return _dense(x, w2, b2, self.dtype)


class GatedMlp(nn.Module):
    """SwiGLU-style gated MLP (reference fm_utils.py:128-144).

    `hidden_dim` is the *ungated* hidden size; the actual width is 2/3 of it,
    matching the reference's parameter-count compensation.
    """

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = nn.silu
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        out_dim = self.out_dim or x.shape[-1]
        hidden = int(2 * self.hidden_dim / 3)
        w1, b1 = _Lin(hidden, self.use_bias, name="fc1")(x.shape[-1])
        w3, b3 = _Lin(hidden, self.use_bias, name="fc3")(x.shape[-1])
        w2, b2 = _Lin(out_dim, self.use_bias, name="fc2")(hidden)
        if return_params:
            return w1, b1, w2, b2, w3, b3
        g = _dense(x, w1, b1, self.dtype)
        u = _dense(x, w3, b3, self.dtype)
        h = shard_activation(self.act(g) * u, "mlp_hidden")
        return _dense(h, w2, b2, self.dtype)


class Attention(nn.Module):
    """Multi-head self-attention with optional QK-norm.

    Covers reference Attention (fm_utils.py:147-180) and NormAttention
    (fm_utils.py:223-262) in one module; `mask` is boolean with True = masked out.
    `step` performs one KV-cached incremental decode step.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    allow_zero_attn: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self._qkv = _Lin(3 * self.dim, self.qkv_bias, name="qkv")
        self._proj = _Lin(self.dim, self.proj_bias, name="proj")
        if self.qk_norm:
            self.q_norm = LayerNorm(dtype=self.dtype, name="q_norm")
            self.k_norm = LayerNorm(dtype=self.dtype, name="k_norm")

    def qkv(self, x):
        w, b = self._qkv(x.shape[-1])
        return _dense(x, w, b, self.dtype)

    def proj(self, x):
        w, b = self._proj(self.dim)
        return _dense(x, w, b, self.dtype)

    def fused_prenorm(self, x: jnp.ndarray, norm, mask=None):
        """Fully-kernelized pre-norm attention half: LN -> QKV (one fused
        Pallas LN+matmul, no fp32 stats round-trip) -> attention -> proj.
        Short unnormed sequences run as ONE merged kernel (LN+QKV+MHA+proj+
        residual, nothing leaves VMEM); long or QK-normed ones split heads
        after the fused LN+QKV and go through the flash/one-shot dispatcher
        (the LN+QKV fusion alone is worth ~4.5 ms/layer at the B=16/N=3072
        prefill — XLA lowers the standalone fp32 LN to a convert+cross-lane-
        reduce that runs ~50x off bandwidth). Returns x + attention branch
        (residual INCLUDED), or None when the generic path must run."""
        B, N, C = x.shape
        if (not _fused_eligible(None, False, B * N)
                or 3 * C * C * jnp.dtype(self.dtype).itemsize > 12 * 2**20
                or not (mask is None or mask.ndim == 2
                        or (mask.ndim == 3 and mask.shape[1] == 1))):
            return None
        from ..kernels.fused_mlp import pallas_ln_matmul

        gamma, beta = norm(x, return_params=True)
        w, b = self._qkv(C)
        if not self.qk_norm and N <= 1024:
            bias = None
            if mask is not None:
                m2 = mask if mask.ndim == 2 else mask[:, 0]
                bias = jnp.where(m2, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
            # VMEM working set of the single-kernel block half: resident
            # qkv+proj weights, the per-cell qkv activation, one head's fp32
            # logits, x/out blocks
            itemsize = jnp.dtype(self.dtype).itemsize
            vmem = (4 * C * C * itemsize            # w_qkv + w_proj
                    + N * 3 * C * itemsize          # qkv activation
                    + N * N * 4                     # one head's logits
                    + 4 * N * C * itemsize)         # x + out, double-buffered
            if vmem <= 11 * 2**20:
                from ..kernels.attention import pallas_attn_block

                wp, bp = self._proj(C)
                return pallas_attn_block(
                    x, gamma, beta, w.astype(self.dtype), b,
                    wp.astype(self.dtype), bp, self.num_heads, bias,
                    eps=norm.eps, allow_zero_attn=self.allow_zero_attn,
                )
            # pallas_mha_short's own working set (no resident weights):
            # q/k/v/out blocks + one head's fp32 logits; oversize shapes
            # (large-C models near N=1024) fall through to the flash path
            if 8 * N * C * itemsize + N * N * 4 <= 11 * 2**20:
                from ..kernels.attention import pallas_mha_short

                qkv = pallas_ln_matmul(x, gamma, beta, w.astype(self.dtype), b,
                                       eps=norm.eps)
                out = pallas_mha_short(qkv, self.num_heads, bias,
                                       self.allow_zero_attn)
                return x + self.proj(out)
        qkv = pallas_ln_matmul(x, gamma, beta, w.astype(self.dtype), b,
                               eps=norm.eps)
        head_dim = C // self.num_heads
        # heads-in-kernel flash with in-kernel QK-norm: fewer, fatter grid
        # cells (144 vs 1728 per layer at 4M prefill shapes) and no
        # (B, H, N, Dh) materialization of the normed q/k through HBM
        from ..kernels.attention import pallas_flash_mha

        bias2 = None
        if mask is not None:
            m2 = mask if mask.ndim == 2 else mask[:, 0]
            bias2 = jnp.where(m2, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
        if self.qk_norm:
            dh_probe = x[:, 0, :head_dim]
            qng, qnb = self.q_norm(dh_probe, return_params=True)
            kng, knb = self.k_norm(dh_probe, return_params=True)
        else:
            qng = qnb = kng = knb = None
        out3 = pallas_flash_mha(
            qkv[:, :, :C], qkv[:, :, C : 2 * C], qkv[:, :, 2 * C :],
            self.num_heads, bias2, qng, qnb, kng, knb, eps=norm.eps,
            allow_zero_attn=self.allow_zero_attn)
        if out3 is not None:
            return x + self.proj(out3)
        qkv5 = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = [shard_activation(jnp.moveaxis(qkv5[:, :, i], 1, 2), "heads")
                   for i in range(3)]
        if self.qk_norm:
            q = self.q_norm(q)
            k = self.k_norm(k)
        out = dot_product_attention(q, k, v, mask_to_bias(mask, N), self.allow_zero_attn)
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return x + self.proj(out)

    def _split_qkv(self, x):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = [shard_activation(jnp.moveaxis(qkv[:, :, i], 1, 2), "heads")
                   for i in range(3)]  # (B, H, N, Dh)
        if self.qk_norm:
            q = self.q_norm(q)
            k = self.k_norm(k)
        return q, k, v

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, N, C = x.shape
        # short-sequence fast path: consume the fused QKV output directly in a
        # per-batch-cell Pallas kernel — no (B,H,N,Dh) transposes (profiled
        # ~2.5x on the ViT-B/196 VQ-tokenize encoder). Key-only masks (B, N)
        # or (B, 1, N) are supported as an additive bias; qk_norm and query-
        # dependent masks fall back to the generic path.
        itemsize = jnp.dtype(self.dtype).itemsize
        # per-cell VMEM working set of pallas_mha_short: q/k/v/out blocks
        # (double-buffered) + one head's fp32 logits — must fit alongside
        # compiler headroom or Mosaic rejects the kernel at large C (e.g.
        # C=2048, N~1024)
        mha_vmem = 8 * N * C * itemsize + N * N * 4
        if (_ATTN_IMPL.get() == "pallas" and jax.default_backend() == "tpu"
                and not self.qk_norm and N <= 1024 and B * N >= 64
                and mha_vmem <= 11 * 2**20
                and _ACTIVATION_SHARDER.get() is None
                and (mask is None or mask.ndim == 2
                     or (mask.ndim == 3 and mask.shape[1] == 1))):
            from ..kernels.attention import pallas_mha_short

            bias = None
            if mask is not None:
                m2 = mask if mask.ndim == 2 else mask[:, 0]
                bias = jnp.where(m2, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
            out = pallas_mha_short(self.qkv(x), self.num_heads, bias,
                                   self.allow_zero_attn)
            return self.proj(out)
        q, k, v = self._split_qkv(x)
        out = dot_product_attention(q, k, v, mask_to_bias(mask, N), self.allow_zero_attn)
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return self.proj(out)

    def step(
        self,
        x_t: jnp.ndarray,  # (B, 1, C)
        cache_k: jnp.ndarray,  # (B, H, Dh, L) — decode ("DM") layout, see below
        cache_v: jnp.ndarray,
        step_idx: jnp.ndarray,  # scalar int
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One causal decode step: append K/V at step_idx, attend over cache[:idx].

        The cache uses the (B, H, Dh, L) decode layout: TPU tiles the last two
        dims (8 sublanes x 128 lanes), so a (.., L, Dh=64) cache fills only
        half of every 128-lane tile and each read moves 2x the bytes. With L
        on lanes and Dh=64 on sublanes the tiles are dense — measured ~2x
        decode-attention bandwidth on v5e (the dominant per-token cost)."""
        B, _, C = x_t.shape
        q, k, v = self._split_qkv(x_t)  # (B, H, 1, Dh)
        k_d = jnp.swapaxes(k, 2, 3).astype(cache_k.dtype)  # (B, H, Dh, 1)
        v_d = jnp.swapaxes(v, 2, 3).astype(cache_v.dtype)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_d, step_idx, axis=3)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_d, step_idx, axis=3)
        L = cache_k.shape[3]
        pos = jnp.arange(L)
        bias = jnp.where(pos[None, None, :] <= step_idx, 0.0, MASK_FILL_VALUE
                         ).astype(jnp.float32)  # (1, 1, L)
        out = decode_attention(q, cache_k, cache_v, bias, self.allow_zero_attn)
        out = jnp.moveaxis(out, 1, 2).reshape(B, 1, C)
        return self.proj(out), cache_k, cache_v


class CrossAttention(nn.Module):
    """Multi-head cross-attention with optional QK-norm.

    Covers reference CrossAttention (fm_utils.py:182-221) and NormCrossAttention
    (fm_utils.py:264-307). `kv` precomputes the context projection once for
    autoregressive decoding; `attend` runs attention against precomputed K/V.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    allow_zero_attn: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        # _Lin holders (same {kernel, bias} param tree as nn.Dense) so the
        # fused decode-step kernels can route the raw weights (see
        # kernels/decode_step.py); q/kv/proj wrappers keep nn.Dense semantics
        self._q = _Lin(self.dim, self.qkv_bias, name="q")
        self._kv = _Lin(2 * self.dim, self.qkv_bias, name="kv")
        self._proj = _Lin(self.dim, self.proj_bias, name="proj")
        if self.qk_norm:
            self.q_norm = LayerNorm(dtype=self.dtype, name="q_norm")
            self.k_norm = LayerNorm(dtype=self.dtype, name="k_norm")

    def q(self, x):
        w, b = self._q(x.shape[-1])
        return _dense(x, w, b, self.dtype)

    def kv(self, x):
        w, b = self._kv(x.shape[-1])
        return _dense(x, w, b, self.dtype)

    def proj(self, x):
        w, b = self._proj(self.dim)
        return _dense(x, w, b, self.dtype)

    def project_kv(self, context: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, M, _ = context.shape
        head_dim = self.dim // self.num_heads
        kv = self.kv(context).reshape(B, M, 2, self.num_heads, head_dim)
        k, v = [shard_activation(jnp.moveaxis(kv[:, :, i], 1, 2), "heads")
                for i in range(2)]
        if self.qk_norm:
            k = self.k_norm(k)
        return k, v

    def project_q(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        head_dim = C // self.num_heads
        q = shard_activation(
            jnp.moveaxis(self.q(x).reshape(B, N, self.num_heads, head_dim), 1, 2), "heads")
        if self.qk_norm:
            q = self.q_norm(q)
        return q

    def attend(self, x, k, v, mask=None):
        B, N, C = x.shape
        q = self.project_q(x)
        out = dot_product_attention(q, k, v, mask_to_bias(mask, N), self.allow_zero_attn)
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return self.proj(out)

    def project_kv_decode(self, context: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """K/V in the (B, H, Dh, M) decode layout (see decode_attention)."""
        k, v = self.project_kv(context)
        return jnp.swapaxes(k, 2, 3), jnp.swapaxes(v, 2, 3)

    def attend_decode(self, x_t, k_dm, v_dm, mask=None):
        """Single-token cross-attention against decode-layout K/V.
        mask: bool (B, M) or (B, 1, M), True = masked out."""
        B, N, C = x_t.shape
        q = self.project_q(x_t)  # (B, H, 1, Dh)
        bias = None
        if mask is not None:
            if mask.ndim == 3:
                mask = mask[:, 0]
            bias = jnp.where(mask, MASK_FILL_VALUE, 0.0).astype(jnp.float32)[:, None, :]
        out = decode_attention(q, k_dm, v_dm, bias, self.allow_zero_attn)
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return self.proj(out)

    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        k, v = self.project_kv(context)
        return self.attend(x, k, v, mask)


def drop_path(
    x: jnp.ndarray, rng: jax.Array, drop_prob: float, deterministic: bool
) -> jnp.ndarray:
    """Stochastic depth per sample (reference fm_utils.py:66-90)."""
    if drop_prob == 0.0 or deterministic:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, keep_prob, shape)
    return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)


class DropPath(nn.Module):
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.drop_prob == 0.0 or deterministic:
            return x
        return drop_path(x, self.make_rng("dropout"), self.drop_prob, deterministic)


def _make_mlp(gated_mlp, dim, mlp_ratio, mlp_bias, act, dtype, name="mlp"):
    hidden = int(dim * mlp_ratio)
    if gated_mlp:
        return GatedMlp(hidden_dim=hidden, act=act, use_bias=mlp_bias, dtype=dtype, name=name)
    return Mlp(hidden_dim=hidden, act=act, use_bias=mlp_bias, dtype=dtype, name=name)


def _fused_eligible(mlp, gated: bool, n_rows: int, dim: int = 0,
                    min_rows: int = 64) -> bool:
    """Shared gate for the fused Pallas block fast paths: pallas inference
    mode on a TPU backend, no TP activation sharder, enough rows to amortize
    the kernel launch, a kernel-supported activation, and weights small
    enough to stay VMEM-resident (XL-size MLPs fall back to XLA).
    min_rows: the default 64 gates STANDALONE kernels (a lone tiny-row launch
    loses to XLA); the fused decode-step path passes 8 — there the kernel
    replaces a whole chain of small ops, so the launch amortizes at B=16."""
    if _ATTN_IMPL.get() != "pallas" or jax.default_backend() != "tpu":
        return False
    if _ACTIVATION_SHARDER.get() is not None:
        return False
    if n_rows < min_rows:
        return False
    if mlp is None:
        return True
    if not (mlp.act is nn.silu if gated else mlp.act is gelu_exact):
        return False
    hidden = int(2 * mlp.hidden_dim / 3) if gated else mlp.hidden_dim
    n_w = 3 if gated else 2
    w_bytes = n_w * dim * hidden * jnp.dtype(mlp.dtype).itemsize
    return w_bytes <= 11 * 2**20


def _fused_ln_mlp(norm, mlp, x2, gated: bool):
    """Fused Pallas LN+MLP+residual (kernels/fused_mlp.py) over 2-D token
    rows; caller has checked _fused_eligible. Profiled on v5e (ViT-B/196,
    B=64): XLA's matmul+LN-convert fusions run ~25% MXU; the fused kernel
    keeps LN stats and the fp32 hidden activation in VMEM."""
    from ..kernels.fused_mlp import pallas_ln_mlp

    gamma, beta = norm(x2, return_params=True)
    if gated:
        w1, b1, w2, b2, w3, b3 = mlp(x2, return_params=True)
    else:
        w1, b1, w2, b2 = mlp(x2, return_params=True)
        w3 = b3 = None
    dt = mlp.dtype
    return pallas_ln_mlp(
        x2, gamma, beta,
        w1.astype(dt), b1, w2.astype(dt), b2,
        None if w3 is None else w3.astype(dt), b3,
        eps=norm.eps, gated=gated,
    )


class Block(nn.Module):
    """Pre-LN encoder block (reference fm_utils.py:310-334)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    drop_path_rate: float = 0.0
    act: Callable = gelu_exact
    gated_mlp: bool = False
    qk_norm: bool = False
    allow_zero_attn: bool = False
    norm_bias: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias, qk_norm=self.qk_norm,
            allow_zero_attn=self.allow_zero_attn, dtype=self.dtype,
        )
        self.attn = Attention(**common, name="attn")
        self.norm1 = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="norm1")
        self.norm2 = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="norm2")
        self.mlp = _make_mlp(self.gated_mlp, self.dim, self.mlp_ratio, self.mlp_bias, self.act, self.dtype)
        self.dp = DropPath(self.drop_path_rate, name="drop_path")

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, N, C = x.shape
        no_dp = self.drop_path_rate == 0.0 or deterministic
        mlp_ok = no_dp and _fused_eligible(self.mlp, self.gated_mlp, B * N, C)
        fused_attn = self.attn.fused_prenorm(x, self.norm1, mask) if no_dp else None
        if fused_attn is not None:
            x = fused_attn  # residual included
        else:
            x = x + self.dp(self.attn(self.norm1(x), mask), deterministic)
        if mlp_ok:
            return _fused_ln_mlp(self.norm2, self.mlp, x, self.gated_mlp)
        x = x + self.dp(self.mlp(self.norm2(x)), deterministic)
        return x


class DecoderBlock(nn.Module):
    """Pre-LN decoder block: self-attn + cross-attn + MLP (reference fm_utils.py:337-366).

    `cross_kv` precomputes this block's cross-attention K/V from the encoder context;
    `step` runs one KV-cached autoregressive decode step.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    drop_path_rate: float = 0.0
    act: Callable = gelu_exact
    gated_mlp: bool = False
    qk_norm: bool = False
    allow_zero_attn: bool = False
    norm_bias: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias, qk_norm=self.qk_norm,
            allow_zero_attn=self.allow_zero_attn, dtype=self.dtype,
        )
        self.self_attn = Attention(**common, name="self_attn")
        self.cross_attn = CrossAttention(**common, name="cross_attn")
        self.norm1 = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="norm1")
        self.query_norm = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="query_norm")
        self.context_norm = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="context_norm")
        self.norm2 = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="norm2")
        self.mlp = _make_mlp(self.gated_mlp, self.dim, self.mlp_ratio, self.mlp_bias, self.act, self.dtype)
        self.dp = DropPath(self.drop_path_rate, name="drop_path")

    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        sa_mask: Optional[jnp.ndarray] = None,
        xa_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, N, C = x.shape
        no_dp = self.drop_path_rate == 0.0 or deterministic
        fused_sa = self.self_attn.fused_prenorm(x, self.norm1, sa_mask) if no_dp else None
        if fused_sa is not None:
            x = fused_sa  # residual included
        else:
            x = x + self.dp(self.self_attn(self.norm1(x), sa_mask), deterministic)
        x = x + self.dp(
            self.cross_attn(self.query_norm(x), self.context_norm(context), xa_mask),
            deterministic,
        )
        if no_dp and _fused_eligible(self.mlp, self.gated_mlp, B * N, C):
            return _fused_ln_mlp(self.norm2, self.mlp, x, self.gated_mlp)
        x = x + self.dp(self.mlp(self.norm2(x)), deterministic)
        return x

    def cross_kv(self, context: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cross K/V for decoding, in the (B, H, Dh, M) decode layout
        (dense memory tiles — see decode_attention)."""
        return self.cross_attn.project_kv_decode(self.context_norm(context))

    def step(
        self,
        x_t: jnp.ndarray,  # (B, 1, C)
        cache_k: jnp.ndarray,  # (B, H, Dh, L) decode layout
        cache_v: jnp.ndarray,
        cross_k: jnp.ndarray,  # (B, H, Dh, M) decode layout
        cross_v: jnp.ndarray,
        xa_mask: Optional[jnp.ndarray],  # bool (B, M) / (B, 1, M)
        step_idx: jnp.ndarray,
    ):
        fused = self._fused_step(x_t, cache_k, cache_v, cross_k, cross_v,
                                 xa_mask, step_idx)
        if fused is not None:
            return fused
        # int8-quantized cross-KV ((i8, scale) tuples, see
        # kernels.decode_step.quantize_kv_decode): the XLA fallback
        # dequantizes — it is the tested oracle for the fused int8 kernel
        if isinstance(cross_k, tuple):
            cross_k = (cross_k[0].astype(jnp.float32)
                       * cross_k[1][..., None]).astype(self.dtype)
            cross_v = (cross_v[0].astype(jnp.float32)
                       * cross_v[1][..., None]).astype(self.dtype)
        sa_out, cache_k, cache_v = self.self_attn.step(self.norm1(x_t), cache_k, cache_v, step_idx)
        x_t = x_t + sa_out
        x_t = x_t + self.cross_attn.attend_decode(self.query_norm(x_t), cross_k, cross_v, xa_mask)
        x_t = x_t + self.mlp(self.norm2(x_t))
        return x_t, cache_k, cache_v

    def _fused_step(self, x_t, cache_k, cache_v, cross_k, cross_v, xa_mask,
                    step_idx):
        """Pallas fused decode step: three kernels + one XLA out-proj + two
        in-place cache updates instead of ~16 XLA ops (see
        kernels/decode_step.py — measured 3.68 ms/token against a 2.12 ms HBM
        floor at 4M-B chain shapes). Returns None (caller falls back) off-TPU,
        under TP sharding, when a kernel working set exceeds VMEM, or when
        the fused-decode switch is off (the default — see _FUSED_DECODE;
        int8 cross-KV tuples always take the kernel, it is their only
        production path)."""
        mode = _fused_decode_mode()
        if mode == "off" and not isinstance(cross_k, tuple):
            return None
        if not _fused_eligible(None, False, 64, min_rows=0):
            return None
        from ..kernels.decode_step import (pallas_cross_decode_attn,
                                           pallas_residual_mlp,
                                           pallas_self_decode)

        B, _, C = x_t.shape
        H = self.num_heads
        Dh = C // H
        dt = self.dtype
        x2 = x_t[:, 0]
        g1, b1 = self.norm1(x2, return_params=True)
        wq, bq = self.self_attn._qkv(C)
        if self.qk_norm:
            # param shape is (Dh,): pass a head-wide slice so return_params
            # declares the right dim
            qng, qnb = self.self_attn.q_norm(x2[:, :Dh], return_params=True)
            kng, knb = self.self_attn.k_norm(x2[:, :Dh], return_params=True)
        else:
            qng = qnb = kng = knb = None
        res = pallas_self_decode(
            x2, g1, b1, wq.astype(dt), bq, qng, qnb, kng, knb, cache_k,
            cache_v, step_idx, H, eps=self.norm1.eps,
            allow_zero_attn=self.allow_zero_attn)
        if res is None:
            return None
        attn, cache_k, cache_v = res  # caches updated in-kernel (aliased)
        wp, bp = self.self_attn._proj(C)
        x2 = x2 + _dense(attn, wp, bp, dt)

        wpx, bpx = self.cross_attn._proj(C)
        bias = None
        if xa_mask is not None:
            m2 = xa_mask[:, 0] if xa_mask.ndim == 3 else xa_mask
            bias = jnp.where(m2, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
        if mode == "hybrid" and not isinstance(cross_k, tuple):
            # XLA cross-attention (measured within 4% of the pure-read HBM
            # floor on the dominant cross-KV stream — see _FUSED_DECODE);
            # raw head outputs feed pallas_residual_mlp, which owns the
            # out-proj + residual
            q = self.cross_attn.project_q(self.query_norm(x2[:, None, :]))
            raw = decode_attention(q, cross_k, cross_v,
                                   None if bias is None else bias[:, None, :],
                                   self.allow_zero_attn)
            attn_x = jnp.moveaxis(raw, 1, 2).reshape(B, C).astype(dt)
        else:
            qn_g, qn_b = self.query_norm(x2, return_params=True)
            wqx, bqx = self.cross_attn._q(C)
            if self.qk_norm:
                cqg, cqb = self.cross_attn.q_norm(x2[:, :Dh], return_params=True)
            else:
                cqg = cqb = None
            k_scale = v_scale = None
            if isinstance(cross_k, tuple):  # int8 KV: (i8, per-channel scale)
                (cross_k, k_scale), (cross_v, v_scale) = cross_k, cross_v
            attn_x = pallas_cross_decode_attn(
                x2, qn_g, qn_b, wqx.astype(dt), bqx, cqg, cqb, cross_k, cross_v,
                bias, H, eps=self.query_norm.eps,
                allow_zero_attn=self.allow_zero_attn,
                k_scale=k_scale, v_scale=v_scale)
            if attn_x is None:
                return None

        out = None
        if self.mlp.act is nn.silu or self.mlp.act is gelu_exact:
            g2, b2n = self.norm2(x2, return_params=True)
            if self.gated_mlp:
                w1, b1m, w2, b2m, w3, b3m = self.mlp(x2, return_params=True)
            else:
                w1, b1m, w2, b2m = self.mlp(x2, return_params=True)
                w3 = b3m = None
            out = pallas_residual_mlp(
                x2, attn_x, wpx.astype(dt), bpx, g2, b2n, w1.astype(dt), b1m,
                w2.astype(dt), b2m, None if w3 is None else w3.astype(dt),
                b3m, eps=self.norm2.eps, gated=self.gated_mlp,
                act_silu=self.mlp.act is nn.silu)
        if out is None:  # unsupported act or XL-size MLP: XLA tail
            x2 = x2 + _dense(attn_x, wpx, bpx, dt)
            out = x2 + self.mlp(self.norm2(x2))
        return out[:, None, :], cache_k, cache_v


class CrossAttentionBlock(nn.Module):
    """Cross-attention + MLP block (reference fm_utils.py:369-388)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_path_rate: float = 0.0
    act: Callable = gelu_exact
    gated_mlp: bool = False
    allow_zero_attn: bool = False
    norm_bias: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.cross_attn = CrossAttention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            allow_zero_attn=self.allow_zero_attn, dtype=self.dtype, name="cross_attn",
        )
        self.query_norm = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="query_norm")
        self.context_norm = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="context_norm")
        self.norm2 = LayerNorm(use_bias=self.norm_bias, dtype=self.dtype, name="norm2")
        self.mlp = _make_mlp(self.gated_mlp, self.dim, self.mlp_ratio, True, self.act, self.dtype)
        self.dp = DropPath(self.drop_path_rate, name="drop_path")

    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        xa_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = x + self.dp(
            self.cross_attn(self.query_norm(x), self.context_norm(context), xa_mask),
            deterministic,
        )
        B, N, C = x.shape
        if ((self.drop_path_rate == 0.0 or deterministic)
                and _fused_eligible(self.mlp, self.gated_mlp, B * N, C)):
            return _fused_ln_mlp(self.norm2, self.mlp, x, self.gated_mlp)
        x = x + self.dp(self.mlp(self.norm2(x)), deterministic)
        return x
