"""Pallas TPU kernels: fused KV-cached decoder step (single-token AR decode).

The AR decode hot loop (reference generate.py:888-918; ours
models/fourm.py:456-464) runs 12 DecoderBlock.step calls per token. Each step
is ~16 tiny XLA ops on (B, 1, C) activations; at 4M-B chain shapes (B=16,
C=768, L=256, M=2304) the measured in-jit cost was 3.68 ms/token against a
2.12 ms HBM floor — >40% pure small-op dispatch. These kernels collapse each
layer step to 3 Pallas kernels + one XLA self-attention out-proj:

  1. `pallas_self_decode`   — LN1 + QKV + per-head QK-norm + full-softmax
     attention over the KV cache, ONE kernel with a head-blocked grid (the
     cache block carries full L, so each head finishes in one cell — no
     online softmax). Returns raw per-head attention (B, C); the out-proj +
     residual stay in XLA (DecoderBlock._fused_step). The new K/V columns
     are written into the caches IN-KERNEL at `step_idx` via aliased
     input/output blocks — no external dynamic-update-slice, no cache copy.
  2. `pallas_cross_decode_attn` — query-norm + per-head-group Q-proj +
     per-head Q-norm + flash attention streaming the (B, H, Dh, M) cross-KV
     (the dominant per-token HBM read: 113 MB/layer at M=2304). The Q-proj
     weight streams as per-head-group column blocks so nothing large stays
     resident next to the KV stream. Emits raw per-head attention (B, C).
  3. `pallas_residual_mlp`  — attn out-proj + residual + LN2 + MLP + residual,
     ONE kernel (MLP weights VMEM-resident).

Attention math matches ops.transformer.decode_attention: fp32 logits
(sum over Dh of fp32 products), scale applied post-sum, fp32 softmax, fp32
p@V accumulation. Per-head QK-norm matches Attention._split_qkv: LN over Dh
in fp32, cast to the compute dtype before attention.

Q/K/V head layout is lane-concatenated (B, C) — the same layout trick as
pallas_mha_short (attention.py:255): heads are lane slices in VMEM, no
(B, H, N, Dh) transposes anywhere.

Mosaic constraint honored throughout: a block's last dim is either
128-divisible or the full array dim (cache blocks use full L; cross-KV
streams in 128-multiples of M).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _gelu_exact

_NEG_BIG = float(jnp.finfo(jnp.float32).min)
_VMEM_BUDGET = 12 * 2**20

import os as _os


def _debug_blocks(kernel: str, **kw):
    """FOURM_KERNEL_DEBUG=1: print each kernel's chosen block sizes at trace
    time, so a future scoped-vmem OOM can be tied back to the hand-fit VMEM
    models above each selection loop (they are calibrated to measured
    failures, not derived from the kernel body)."""
    if _os.environ.get("FOURM_KERNEL_DEBUG") == "1":
        print(f"# [decode_step] {kernel}: "
              + " ".join(f"{k}={v}" for k, v in kw.items()))


def _ln32(x32, gamma, beta, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma
    if beta is not None:
        y = y + beta
    return y


def _divisors_desc(n):
    return [d for d in range(n, 0, -1) if n % d == 0]


def _self_decode_kernel(scale, eps, allow_zero_attn, qk_norm, has_bq,
                        norm_bias, qn_bias, kn_bias, head_dim, h_blk,
                        cache_len, compute_dtype):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        g1 = next(it)[...]
        b1 = next(it)[...] if norm_bias else None
        wr_ref = next(it)  # (C, h_blk*3Dh) head-major QKV column block
        br_ref = next(it) if has_bq else None
        qn_g = next(it)[...] if qk_norm else None
        qn_b = next(it)[...] if qn_bias else None
        kn_g = next(it)[...] if qk_norm else None
        kn_b = next(it)[...] if kn_bias else None
        ck_ref = next(it)  # (B, h_blk, Dh, L) cache block (aliased in/out)
        cv_ref = next(it)
        idx_ref = next(it)  # SMEM (1,) int32 step index
        attn_ref = next(it)  # (B, h_blk*Dh) out block
        cko_ref = next(it)  # aliased cache outputs: updated in-kernel
        cvo_ref = next(it)

        step_idx = idx_ref[0]
        # the LN + per-group QKV matmul recompute per cell is trivial
        # (~56 MFLOP at B=16) next to the cache DMA it overlaps
        xb = x_ref[...]
        h = _ln32(xb.astype(jnp.float32), g1, b1, eps).astype(compute_dtype)
        qkv = jnp.dot(h, wr_ref[...], preferred_element_type=jnp.float32)
        if br_ref is not None:
            qkv = qkv + br_ref[...]

        # cache positions < step_idx are previous tokens; the NEW token's
        # K/V (position step_idx, not yet in the cache) is appended inline
        # and spliced into the aliased cache output with a lane select —
        # updating the cache in-kernel keeps the decode loop free of the
        # reshape->dynamic-update-slice chain that serialized iterations
        # (measured +137 us/step over the kernel's own 17 us)
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, cache_len), 1)
        valid = pos < step_idx  # (1, L)
        here3 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, cache_len), 2)
                 == step_idx)  # (1, 1, L)

        for lh in range(h_blk):
            base = lh * 3 * head_dim
            q_h = qkv[:, base : base + head_dim]
            k_h = qkv[:, base + head_dim : base + 2 * head_dim]
            v_h = qkv[:, base + 2 * head_dim : base + 3 * head_dim]
            if qk_norm:
                q_h = _ln32(q_h, qn_g, qn_b, eps)
                k_h = _ln32(k_h, kn_g, kn_b, eps)
            sl = slice(lh * head_dim, (lh + 1) * head_dim)
            q32 = q_h.astype(compute_dtype).astype(jnp.float32)
            k_n = k_h.astype(compute_dtype).astype(jnp.float32)
            v_n = v_h.astype(compute_dtype).astype(jnp.float32)
            k_blk = ck_ref[:, lh].astype(jnp.float32)  # (B, Dh, L)
            v_blk = cv_ref[:, lh].astype(jnp.float32)
            cko_ref[:, lh] = jnp.where(
                here3, k_n[:, :, None], k_blk).astype(cko_ref.dtype)
            cvo_ref[:, lh] = jnp.where(
                here3, v_n[:, :, None], v_blk).astype(cvo_ref.dtype)
            # batched matvec via VPU multiply+sublane-reduce: Mosaic cannot
            # lower a batched dot_general (TPU_DotDimensionNumbersAttr parse
            # failure on batch dims — see scripts/repro_pallas_500.py)
            s = jnp.sum(q32[:, :, None] * k_blk, axis=1) * scale  # (B, L)
            s = jnp.where(valid, s, _NEG_BIG)
            s_n = jnp.sum(q32 * k_n, axis=-1, keepdims=True) * scale  # (B, 1)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_n)
            # select (not exp of masked): at step_idx==0 every cache position
            # is masked; a fully masked row with m == _NEG_BIG would turn the
            # masked logits into exp(0) junk without the where
            p = jnp.where(valid, jnp.exp(s - m), 0.0)  # (B, L)
            p_n = jnp.exp(s_n - m)  # (B, 1)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_n
            if allow_zero_attn:  # softmax1: virtual zero logit
                denom = denom + jnp.exp(-m)
            pv = jnp.sum(p[:, None, :] * v_blk, axis=2)  # (B, Dh)
            out_h = (pv + p_n * v_n) / denom
            attn_ref[:, sl] = out_h.astype(attn_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "eps", "allow_zero_attn", "interpret"))
def pallas_self_decode(
    x: jnp.ndarray,  # (B, C) current token hidden (compute dtype)
    gamma1: jnp.ndarray,  # fp32 (C,) pre-attn LN scale
    beta1,  # fp32 (C,) or None
    w_qkv: jnp.ndarray,  # (C, 3C) compute dtype
    b_qkv,  # fp32 (3C,) or None
    qn_gamma,  # fp32 (Dh,) per-head q-norm scale, or None (no qk_norm)
    qn_beta,
    kn_gamma,
    kn_beta,
    cache_k: jnp.ndarray,  # (B, H, Dh, L) decode layout
    cache_v: jnp.ndarray,
    step_idx: jnp.ndarray,  # scalar int32
    num_heads: int,
    eps: float = 1e-6,
    allow_zero_attn: bool = False,
    interpret: bool = False,
):
    """Fused self-attention core of a decoder step: LN1 + QKV + per-head
    QK-norm + full-softmax attention over the cache plus this token, with the
    cache update DONE IN-KERNEL (caches are aliased in/out; the new token's
    post-QK-norm K/V is lane-selected into position step_idx). Returns
    (attn (B, C), cache_k, cache_v) — attn is raw lane-concatenated head
    outputs (the out-proj + residual is one XLA matmul outside; its weight
    doesn't fit next to the cache stream).

    The QKV weight is reordered head-major ((C, 3C) -> (C, H, 3Dh)) so it can
    stream as per-head-group column blocks — the reorder is loop-invariant
    and XLA hoists it out of the decode while-loop. Grid cells cover head
    groups with FULL cache length per block (no online softmax); h_blk is the
    largest divisor of H with lane-aligned blocks that fits VMEM. Returns
    None when none fits (fall back to XLA)."""
    B, C = x.shape
    H = num_heads
    Dh = C // H
    L = cache_k.shape[3]
    scale = Dh**-0.5
    itemsize = jnp.dtype(x.dtype).itemsize

    # VMEM sizing must use the TILE-PADDED cache length: a block's last dim
    # lives in (8/16, 128) tiles, so L pads up to the next 128-multiple in
    # VMEM. Measured: at L=23 the unpadded model picked h_blk=12 (11.3 MB
    # modeled) and the compiler allocated 20.65 MB -> scoped-vmem OOM
    # (AOT "vmem stack" error, 2026-08-18).
    L_pad = -(-L // 128) * 128
    h_blk = 0
    for cand in _divisors_desc(H):
        # Mosaic: block last dims must be 128-divisible or the full dim
        if cand != H and (cand * Dh) % 128 != 0:
            continue
        stream = (2 * 2 * 2 * B * cand * Dh * L_pad  # k+v cache in+out, 2-buf
                  + 2 * C * cand * 3 * Dh) * itemsize  # QKV column block
        # per-head fp32 k/v copies inside the kernel + activation blocks
        resident = 8 * B * C * itemsize + 2 * B * Dh * L_pad * 4
        if stream + resident <= _VMEM_BUDGET:
            h_blk = cand
            break
    if h_blk == 0:
        return None
    n_hblocks = H // h_blk
    _debug_blocks("self_decode", B=B, C=C, H=H, L=L, h_blk=h_blk)

    # head-major QKV layout: columns for head g become [q_g | k_g | v_g]
    wr = w_qkv.reshape(C, 3, H, Dh).transpose(0, 2, 1, 3).reshape(C, H * 3 * Dh)
    br = None
    if b_qkv is not None:
        br = b_qkv.reshape(3, H, Dh).transpose(1, 0, 2).reshape(H * 3 * Dh)

    cast = lambda a: a.astype(jnp.float32)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((B, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [xspec, const_spec(gamma1.shape)]
    args = [x, cast(gamma1)]
    if beta1 is not None:
        in_specs.append(const_spec(beta1.shape))
        args.append(cast(beta1))
    in_specs.append(pl.BlockSpec((C, h_blk * 3 * Dh), lambda i: (0, i),
                                 memory_space=pltpu.VMEM))
    args.append(wr)
    if br is not None:
        in_specs.append(pl.BlockSpec((h_blk * 3 * Dh,), lambda i: (i,),
                                     memory_space=pltpu.VMEM))
        args.append(cast(br))
    qk_norm = qn_gamma is not None
    if qk_norm:
        for a in (qn_gamma, qn_beta, kn_gamma, kn_beta):
            if a is not None:
                in_specs.append(const_spec(a.shape))
                args.append(cast(a))
    cache_arg_idx = len(args)
    cspec = pl.BlockSpec((B, h_blk, Dh, L), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
    for c in (cache_k, cache_v):
        in_specs.append(cspec)
        args.append(c)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    args.append(jnp.asarray(step_idx, jnp.int32).reshape(1))

    ospec = pl.BlockSpec((B, h_blk * Dh), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _self_decode_kernel(scale, eps, allow_zero_attn, qk_norm,
                            br is not None, beta1 is not None,
                            qn_beta is not None, kn_beta is not None, Dh,
                            h_blk, L, x.dtype),
        out_shape=[
            jax.ShapeDtypeStruct((B, C), x.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        grid=(n_hblocks,),
        in_specs=in_specs,
        out_specs=[ospec, cspec, cspec],
        input_output_aliases={cache_arg_idx: 1, cache_arg_idx + 1: 2},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * 3 * C + 4 * B * H * L * Dh,
            bytes_accessed=2 * (cache_k.size + cache_v.size) * itemsize
            + w_qkv.size * itemsize,
            transcendentals=B * H * L,
        ),
    )(*args)
    return out


def _cross_attn_kernel(scale, eps, allow_zero_attn, qk_norm, has_bq,
                       norm_bias, cqn_bias, has_bias, quant, num_heads,
                       head_dim, h_blk, n_mblocks, block_m, compute_dtype):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        g_qn = next(it)[...]  # query_norm over C
        b_qn = next(it)[...] if norm_bias else None
        wq_ref = next(it)  # (C, h_blk*Dh) column block of the Q projection
        bq_ref = next(it) if has_bq else None
        cq_g = next(it)[...] if qk_norm else None
        cq_b = next(it)[...] if cqn_bias else None
        k_ref = next(it)  # (B, h_blk, Dh, bm) — int8 when quant
        v_ref = next(it)
        ks_ref = next(it) if quant else None  # (B, h_blk*Dh) fp32 scales
        vs_ref = next(it) if quant else None
        b_ref = next(it) if has_bias else None  # (B, bm) fp32 additive
        o_ref = next(it)  # (B, h_blk*Dh) per-head attention out block
        q_scr = next(it)  # (B, h_blk*Dh)
        m_scr = next(it)  # (B, 128) fp32
        l_scr = next(it)
        acc_scr = next(it)  # (B, h_blk*Dh) fp32

        mi = pl.program_id(1)

        @pl.when(mi == 0)
        def _():
            xb = x_ref[...]
            h = _ln32(xb.astype(jnp.float32), g_qn, b_qn, eps).astype(compute_dtype)
            q = jnp.dot(h, wq_ref[...], preferred_element_type=jnp.float32)
            if bq_ref is not None:
                q = q + bq_ref[...]
            for lh in range(h_blk):
                sl = slice(lh * head_dim, (lh + 1) * head_dim)
                q_h = q[:, sl]
                if qk_norm:
                    q_h = _ln32(q_h, cq_g, cq_b, eps)
                q_scr[:, sl] = q_h.astype(compute_dtype)
            m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        bias = b_ref[...] if b_ref is not None else None  # (B, bm)
        for lh in range(h_blk):
            sl = slice(lh * head_dim, (lh + 1) * head_dim)
            q_h = q_scr[:, sl].astype(jnp.float32)
            if quant:
                # int8 KV: fold the per-(B, Dh) K scale into q BEFORE the
                # reduction and the V scale into acc AFTER it — no dequantized
                # tensor is ever materialized; HBM traffic halves
                q_h = q_h * ks_ref[:, sl]
            k_blk = k_ref[:, lh].astype(jnp.float32)  # (B, Dh, bm)
            v_blk = v_ref[:, lh].astype(jnp.float32)
            # VPU multiply+sublane-reduce (see _self_decode_kernel note on
            # Mosaic's batched-dot_general limitation)
            s = jnp.sum(q_h[:, :, None] * k_blk, axis=1) * scale  # (B, bm)
            if bias is not None:
                s = s + bias
            m_prev = m_scr[:, lh : lh + 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:, lh : lh + 1] = l_scr[:, lh : lh + 1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True)
            acc_scr[:, sl] = acc_scr[:, sl] * alpha + jnp.sum(
                p[:, None, :] * v_blk, axis=2)
            m_scr[:, lh : lh + 1] = m_new

        @pl.when(mi == n_mblocks - 1)
        def _():
            for lh in range(h_blk):
                sl = slice(lh * head_dim, (lh + 1) * head_dim)
                l_fin = l_scr[:, lh : lh + 1]
                if allow_zero_attn:
                    l_fin = l_fin + jnp.exp(-m_scr[:, lh : lh + 1])
                out_h = acc_scr[:, sl]
                if quant:
                    out_h = out_h * vs_ref[:, sl]
                o_ref[:, sl] = (out_h / l_fin).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "eps", "allow_zero_attn", "interpret"))
def pallas_cross_decode_attn(
    x: jnp.ndarray,  # (B, C) post-self-attention hidden
    qn_gamma: jnp.ndarray,  # fp32 (C,) query_norm scale
    qn_beta,  # fp32 (C,) or None
    w_q: jnp.ndarray,  # (C, C) compute dtype
    b_q,  # fp32 (C,) or None
    cqn_gamma,  # fp32 (Dh,) cross per-head q-norm, or None
    cqn_beta,
    k_dm: jnp.ndarray,  # (B, H, Dh, M) decode-layout cross K (post k-norm)
    v_dm: jnp.ndarray,
    bias,  # fp32 (B, M) additive key bias, or None
    num_heads: int,
    eps: float = 1e-6,
    allow_zero_attn: bool = False,
    k_scale=None,  # fp32 (B, H, Dh) per-channel scales when k_dm is int8
    v_scale=None,
    interpret: bool = False,
):
    """Cross-attention core of a decoder step: per-head
    attend(cq_norm(qproj(query_norm(x))), k_dm, v_dm) with the cross-KV
    streamed in (head-group, M-block) grid cells — this read (113 MB/layer
    at 4M-B chain shapes) IS the decode loop's bandwidth floor. Returns raw
    lane-concatenated head outputs (B, C); the out-projection + residual run
    in pallas_residual_mlp. Returns None when no blocking fits VMEM.

    int8 KV mode (k_scale/v_scale given, k_dm/v_dm int8): halves the KV
    stream; the K scale folds into q before the logits reduction and the V
    scale into the accumulator after it — no per-element dequantization."""
    B, C = x.shape
    H = num_heads
    Dh = C // H
    M = k_dm.shape[3]
    scale = Dh**-0.5
    itemsize = jnp.dtype(x.dtype).itemsize
    quant = k_scale is not None
    kv_itemsize = jnp.dtype(k_dm.dtype).itemsize

    # pick (h_blk, bm): fewest grid cells whose double-buffered KV stream +
    # per-group Q-projection column block fit the budget; bm must be a
    # 128-multiple divisor of M (Mosaic last-dim rule)
    best = None
    for h_blk in _divisors_desc(H):
        # Mosaic: block last dims must be 128-divisible or the full dim
        if h_blk != H and (h_blk * Dh) % 128 != 0:
            continue
        for bm in (M, 4096, 3072, 2304, 2048, 1536, 1152, 1024, 768, 512,
                   384, 256, 128):
            if bm > M or M % bm or (bm != M and bm % 128):
                continue
            bm_pad = -(-bm // 128) * 128  # VMEM tile padding (bm == M case)
            stream = 2 * 2 * B * h_blk * Dh * bm_pad * kv_itemsize
            resident = ((C * h_blk * Dh + 6 * B * C) * itemsize
                        + 2 * B * C * 4 + 2 * B * Dh * bm_pad * 4)
            if stream + resident <= _VMEM_BUDGET:
                cells = (H // h_blk) * (M // bm)
                if best is None or cells < best[0]:
                    best = (cells, h_blk, bm)
                break
    if best is None:
        return None
    _, h_blk, bm = best
    n_h, n_m = H // h_blk, M // bm
    _debug_blocks("cross_decode_attn", B=B, C=C, H=H, M=M, h_blk=h_blk, bm=bm,
                  quant=quant)

    cast = lambda a: a.astype(jnp.float32)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda hi, mi: (0,) * nd),
                            memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((B, C), lambda hi, mi: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [xspec, const_spec(qn_gamma.shape)]
    args = [x, cast(qn_gamma)]
    if qn_beta is not None:
        in_specs.append(const_spec(qn_beta.shape))
        args.append(cast(qn_beta))
    in_specs.append(pl.BlockSpec((C, h_blk * Dh), lambda hi, mi: (0, hi),
                                 memory_space=pltpu.VMEM))
    args.append(w_q)
    if b_q is not None:
        in_specs.append(pl.BlockSpec((h_blk * Dh,), lambda hi, mi: (hi,),
                                     memory_space=pltpu.VMEM))
        args.append(cast(b_q))
    qk_norm = cqn_gamma is not None
    if qk_norm:
        for a in (cqn_gamma, cqn_beta):
            if a is not None:
                in_specs.append(const_spec(a.shape))
                args.append(cast(a))
    for c in (k_dm, v_dm):
        in_specs.append(pl.BlockSpec((B, h_blk, Dh, bm),
                                     lambda hi, mi: (0, hi, 0, mi),
                                     memory_space=pltpu.VMEM))
        args.append(c)
    if quant:
        sspec = pl.BlockSpec((B, h_blk * Dh), lambda hi, mi: (0, hi),
                             memory_space=pltpu.VMEM)
        for s in (k_scale, v_scale):
            in_specs.append(sspec)
            args.append(s.reshape(B, H * Dh).astype(jnp.float32))
    if bias is not None:
        in_specs.append(pl.BlockSpec((B, bm), lambda hi, mi: (0, mi),
                                     memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))

    out = pl.pallas_call(
        _cross_attn_kernel(scale, eps, allow_zero_attn, qk_norm,
                           b_q is not None, qn_beta is not None,
                           cqn_beta is not None, bias is not None, quant, H,
                           Dh, h_blk, n_m, bm, x.dtype),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        grid=(n_h, n_m),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, h_blk * Dh), lambda hi, mi: (0, hi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, h_blk * Dh), x.dtype),  # q
            pltpu.VMEM((B, 128), jnp.float32),  # running max per local head
            pltpu.VMEM((B, 128), jnp.float32),  # running denom
            pltpu.VMEM((B, h_blk * Dh), jnp.float32),  # acc
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * C + 4 * B * H * M * Dh,
            bytes_accessed=(k_dm.size + v_dm.size) * kv_itemsize
            + w_q.size * itemsize,
            transcendentals=B * H * M,
        ),
    )(*args)
    return out


@jax.jit
def quantize_kv_decode(k_dm: jnp.ndarray, v_dm: jnp.ndarray):
    """Per-(B, H, Dh)-channel symmetric int8 quantization of decode-layout
    cross-KV: returns (k_i8, k_scale, v_i8, v_scale) for the int8 mode of
    pallas_cross_decode_attn. Scales are absmax/127 over the M axis — the
    channel axis matches how the kernel folds them (K into q, V into acc)."""
    def q(a):
        absmax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=3)  # (B, H, Dh)
        s = jnp.maximum(absmax, 1e-12) / 127.0
        i8 = jnp.clip(jnp.round(a.astype(jnp.float32) / s[..., None]),
                      -127, 127).astype(jnp.int8)
        return i8, s

    k_i8, ks = q(k_dm)
    v_i8, vs = q(v_dm)
    return k_i8, ks, v_i8, vs


def _decode_attn_kernel(scale, allow_zero_attn, has_bias, bias_per_head,
                        head_dim, h_blk, n_mblocks):
    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)  # (1, 1, h_blk*Dh) compute dtype
        k_ref = next(it)  # (1, h_blk, Dh, bm) compute dtype
        v_ref = next(it)
        b_ref = next(it) if has_bias else None  # (1, 1|h_blk, bm) fp32
        o_ref = next(it)  # (1, 1, h_blk*Dh)
        m_scr = next(it)  # (1, 128) fp32 running max per local head
        l_scr = next(it)  # (1, 128) fp32 running denom
        acc_scr = next(it)  # (1, h_blk*Dh) fp32

        mi = pl.program_id(2)

        @pl.when(mi == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        for lh in range(h_blk):
            sl = slice(lh * head_dim, (lh + 1) * head_dim)
            q_h = q_ref[0, :, sl]  # (1, Dh) compute dtype
            k_h = k_ref[0, lh]  # (Dh, bm) compute dtype — native MXU operand
            v_h = v_ref[0, lh]
            # MXU dot with fp32 accumulation: bf16 products are exact in
            # fp32, matching ops.transformer.decode_attention's fp32 VPU
            # reduce — but streamed through the MXU with NO fp32 conversion
            # pass over the KV block (the VPU form in pallas_cross_decode_attn
            # materializes fp32 copies of every block; that conversion is
            # why it loses to XLA on the 2026-08-18 toolchain)
            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (1, bm) fp32
            if b_ref is not None:
                s = s + b_ref[0, lh if bias_per_head else 0]
            m_prev = m_scr[:, lh : lh + 1]  # (1, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)  # (1, bm) fp32
            alpha = jnp.exp(m_prev - m_new)  # (1, 1)
            l_scr[:, lh : lh + 1] = l_scr[:, lh : lh + 1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True)
            # p @ v over the bm lanes: contract p's lane dim with v's lane
            # dim -> (1, Dh); probs cast to the compute dtype exactly as the
            # XLA path casts (probs.astype(v.dtype))
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, Dh)
            acc_scr[:, sl] = acc_scr[:, sl] * alpha + pv
            m_scr[:, lh : lh + 1] = m_new

        @pl.when(mi == n_mblocks - 1)
        def _():
            for lh in range(h_blk):
                sl = slice(lh * head_dim, (lh + 1) * head_dim)
                l_fin = l_scr[:, lh : lh + 1]  # (1, 1)
                if allow_zero_attn:  # softmax1: virtual zero logit
                    l_fin = l_fin + jnp.exp(-m_scr[:, lh : lh + 1])
                o_ref[0, :, sl] = (acc_scr[:, sl] / l_fin).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("allow_zero_attn", "interpret"))
def pallas_decode_attention(
    q: jnp.ndarray,  # (B, H, 1, Dh)
    k_dm: jnp.ndarray,  # (B, H, Dh, M) decode layout
    v_dm: jnp.ndarray,
    bias=None,  # fp32 (B|1, 1|H, M) additive, or None
    allow_zero_attn: bool = False,
    interpret: bool = False,
):
    """Single-query attention against (B, H, Dh, M) decode-layout K/V on the
    MXU — a drop-in for ops.transformer.decode_attention (same signature,
    same fp32-accumulation math; reference semantics fm.py:485/515 decode).

    Grid (B, head-group, M-block) with an online softmax over M-blocks. Each
    cell streams its (h_blk, Dh, bm) K/V block ONCE in the compute dtype and
    contracts it on the MXU ((1, Dh) @ (Dh, bm) logits, (1, bm) @ (bm, Dh)^T
    p@V) — the bet was that native-bf16 MXU operands beat the VPU's fp32
    conversion pass. MEASURED RESULT (2026-08-19 toolchain, jax 0.9.0 /
    libtpu 0.0.34): it loses in the production decode loop — 5.24 ms/token
    vs 4.06 XLA at 4M-B chain shapes (B=16, M=2304). The single-row dots
    are launch/latency-bound (~234 us per 3.5 MB grid cell, 15 GB/s
    effective), not bandwidth-bound. Kept as a parity-tested opt-in raced by
    bench.py every run (use_decode_attn / FOURM_DECODE_ATTN=mxu); a future
    toolchain may invert this the way round-4's inverted the fused-step
    kernels. Returns (B, H, 1, Dh), or None when no lane-aligned blocking
    fits VMEM (caller falls back to XLA).
    """
    B, H, _, Dh = q.shape
    M = k_dm.shape[3]
    if M % 128:
        return None
    scale = Dh**-0.5
    itemsize = jnp.dtype(q.dtype).itemsize
    kv_itemsize = jnp.dtype(k_dm.dtype).itemsize

    bias_ph = bias is not None and bias.shape[1] != 1
    best = None
    for h_blk in _divisors_desc(H):
        # Mosaic: block last dims must be 128-divisible or the full dim
        if h_blk != H and (h_blk * Dh) % 128 != 0:
            continue
        # per-head bias block is (1, h_blk, bm): its sublane dim must be
        # 8-divisible or the full head dim
        if bias_ph and h_blk != H and h_blk % 8:
            continue
        for bm in (M, 4096, 3072, 2304, 2048, 1536, 1152, 1024, 768, 512,
                   384, 256, 128):
            if bm > M or M % bm or (bm != M and bm % 128):
                continue
            stream = 2 * 2 * h_blk * Dh * bm * kv_itemsize  # k+v, 2-buffered
            resident = (2 * 2 * h_blk * Dh * itemsize  # q + out blocks
                        + (2 * bm * 4 if bias is not None else 0)
                        + h_blk * Dh * 4 + 2 * 128 * 4  # acc + m/l scratch
                        + h_blk * 2 * bm * 4)  # per-unrolled-head live s/p
            if stream + resident <= _VMEM_BUDGET:
                cells = (H // h_blk) * (M // bm)
                if best is None or cells < best[0]:
                    best = (cells, h_blk, bm)
                break
    if best is None:
        return None
    _, h_blk, bm = best
    n_h, n_m = H // h_blk, M // bm
    _debug_blocks("decode_attention", B=B, H=H, Dh=Dh, M=M, h_blk=h_blk,
                  bm=bm)

    # q/out ride as (B, 1, C): Mosaic requires a block's second-to-last dim
    # to be 8-divisible or the full array dim — (1, C') blocks of a (B, C)
    # array violate that, (1, 1, C') blocks of (B, 1, C) don't
    q2 = q.reshape(B, 1, H * Dh)
    in_specs = [
        pl.BlockSpec((1, 1, h_blk * Dh), lambda b, hi, mi: (b, 0, hi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_blk, Dh, bm), lambda b, hi, mi: (b, hi, 0, mi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_blk, Dh, bm), lambda b, hi, mi: (b, hi, 0, mi),
                     memory_space=pltpu.VMEM),
    ]
    args = [q2, k_dm, v_dm]
    bias_per_head = False
    if bias is not None:
        bias_per_head = bias.shape[1] != 1
        b_bcast = bias.shape[0] == 1  # (1, ·, M): same rows for every b
        bspec = pl.BlockSpec(
            (1, h_blk if bias_per_head else 1, bm),
            (lambda b, hi, mi: (0 if b_bcast else b,
                                hi if bias_per_head else 0, mi)),
            memory_space=pltpu.VMEM)
        in_specs.append(bspec)
        args.append(bias.astype(jnp.float32))

    out = pl.pallas_call(
        _decode_attn_kernel(scale, allow_zero_attn, bias is not None,
                            bias_per_head, Dh, h_blk, n_m),
        out_shape=jax.ShapeDtypeStruct((B, 1, H * Dh), q.dtype),
        grid=(B, n_h, n_m),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, h_blk * Dh), lambda b, hi, mi: (b, 0, hi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),  # running max per local head
            pltpu.VMEM((1, 128), jnp.float32),  # running denom
            pltpu.VMEM((1, h_blk * Dh), jnp.float32),  # fp32 accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * M * Dh,
            bytes_accessed=(k_dm.size + v_dm.size) * kv_itemsize,
            transcendentals=B * H * M,
        ),
    )(*args)
    return out.reshape(B, H, 1, Dh)


def _residual_mlp_kernel(eps, gated, act_silu, has_bp, norm_bias, mlp_bias,
                         compute_dtype):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        a_ref = next(it)
        wp = next(it)[...]
        bp = next(it)[...] if has_bp else None
        g2 = next(it)[...]
        b2n = next(it)[...] if norm_bias else None
        w1 = next(it)[...]
        b1 = next(it)[...] if mlp_bias else None
        if gated:
            w3 = next(it)[...]
            b3 = next(it)[...] if mlp_bias else None
        w2 = next(it)[...]
        b2 = next(it)[...] if mlp_bias else None
        o_ref = next(it)

        proj = jnp.dot(a_ref[...], wp, preferred_element_type=jnp.float32)
        if bp is not None:
            proj = proj + bp
        x = x_ref[...] + proj.astype(x_ref.dtype)  # post-cross residual
        h = _ln32(x.astype(jnp.float32), g2, b2n, eps).astype(compute_dtype)
        u = jnp.dot(h, w1, preferred_element_type=jnp.float32)
        if b1 is not None:
            u = u + b1
        if gated:
            gte = jnp.dot(h, w3, preferred_element_type=jnp.float32)
            if b3 is not None:
                gte = gte + b3
            hid = (u * jax.lax.logistic(u)) * gte if act_silu else _gelu_exact(u) * gte
        else:
            hid = u * jax.lax.logistic(u) if act_silu else _gelu_exact(u)
        out = jnp.dot(hid.astype(compute_dtype), w2,
                      preferred_element_type=jnp.float32)
        if b2 is not None:
            out = out + b2
        o_ref[...] = x + out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "eps", "gated", "act_silu", "interpret"))
def pallas_residual_mlp(
    x: jnp.ndarray,  # (B, C) pre-cross-residual hidden
    attn: jnp.ndarray,  # (B, C) raw cross-attention head outputs
    w_proj: jnp.ndarray,  # (C, C) cross out-projection
    b_proj,  # fp32 (C,) or None
    gamma2: jnp.ndarray,  # fp32 (C,) LN2
    beta2,
    w1: jnp.ndarray,  # (C, HID)
    b1,
    w2: jnp.ndarray,  # (HID, C)
    b2,
    w3=None,  # (C, HID) for gated (SwiGLU)
    b3=None,
    eps: float = 1e-6,
    gated: bool = False,
    act_silu: bool = True,
    interpret: bool = False,
):
    """x' = x + proj(attn); return x' + mlp(LN2(x')) — the tail of a decoder
    step as ONE kernel. act_silu selects SiLU (SwiGLU path) vs exact GELU
    (the A&S erf polynomial shared with pallas_ln_mlp). Returns None when the
    resident weights exceed VMEM (XL geometries)."""
    B, C = x.shape
    HID = w1.shape[1]
    itemsize = jnp.dtype(x.dtype).itemsize
    n_w = 3 if gated else 2
    resident = ((C * C + n_w * C * HID) * itemsize
                + 4 * B * C * itemsize + 2 * B * HID * 4)
    if resident > _VMEM_BUDGET:
        return None

    cast = lambda a: a.astype(jnp.float32)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((B, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [xspec, xspec, const_spec(w_proj.shape)]
    args = [x, attn, w_proj]
    if b_proj is not None:
        in_specs.append(const_spec(b_proj.shape))
        args.append(cast(b_proj))
    in_specs.append(const_spec(gamma2.shape))
    args.append(cast(gamma2))
    if beta2 is not None:
        in_specs.append(const_spec(beta2.shape))
        args.append(cast(beta2))
    in_specs.append(const_spec(w1.shape))
    args.append(w1)
    if b1 is not None:
        in_specs.append(const_spec(b1.shape))
        args.append(cast(b1))
    if gated:
        in_specs.append(const_spec(w3.shape))
        args.append(w3)
        if b3 is not None:
            in_specs.append(const_spec(b3.shape))
            args.append(cast(b3))
    in_specs.append(const_spec(w2.shape))
    args.append(w2)
    if b2 is not None:
        in_specs.append(const_spec(b2.shape))
        args.append(cast(b2))

    return pl.pallas_call(
        _residual_mlp_kernel(eps, gated, act_silu, b_proj is not None,
                             beta2 is not None, b1 is not None, x.dtype),
        out_shape=jax.ShapeDtypeStruct((B, C), x.dtype),
        grid=(1,),
        in_specs=in_specs,
        out_specs=xspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * C + 2 * B * C * HID * n_w,
            bytes_accessed=(C * C + n_w * C * HID) * itemsize,
            transcendentals=B * HID,
        ),
    )(*args)
