"""Pallas TPU kernel: fused LayerNorm + MLP + residual.

The pre-LN MLP half of a transformer block (x + fc2(act(fc1(LN(x)))),
reference fm_utils.py:310-334) lowers in XLA to two matmul fusions whose
epilogues carry the fp32 LayerNorm converts/reduces; profiled on v5e at
ViT-B/196 (B=64) those fusions run at ~25% MXU efficiency (0.52 ms each vs
0.31 ms of matmul work). This kernel keeps one row-block of tokens resident
in VMEM through LN -> fc1 -> act -> fc2 -> residual-add: LN stats never
round-trip to HBM, the activations stay bf16 on the MXU, and HBM traffic
drops to x-in + x-out + one weight stream (weights use constant index maps,
so Mosaic holds them in VMEM across grid steps).

Supports the two MLP shapes 4M uses: exact-GELU `Mlp` and SwiGLU `GatedMlp`
(fm_utils.py:114-144). Exact GELU needs erf, which Mosaic does not provide;
`_erf` is the Abramowitz-Stegun 7.1.26 rational approximation (|err| <=
1.5e-7 exact, ~2e-6 evaluated in f32 — far below bf16 resolution).

Inference-only (pallas_call has no vjp) — gated behind use_pallas_attention
exactly like the attention kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Abramowitz & Stegun 7.1.26 coefficients
_A1, _A2, _A3, _A4, _A5 = (
    0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_P = 0.3275911


def _erf(x):
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ln(x32, gamma, beta, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma
    if beta is not None:
        y = y + beta
    return y


def _mlp_kernel(eps, norm_bias, mlp_bias, gated, compute_dtype, is3d=False):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        gamma = next(it)[...]
        beta = next(it)[...] if norm_bias else None
        w1 = next(it)[...]
        b1 = next(it)[...] if mlp_bias else None
        if gated:
            w3 = next(it)[...]
            b3 = next(it)[...] if mlp_bias else None
        w2 = next(it)[...]
        b2 = next(it)[...] if mlp_bias else None
        o_ref = next(it)

        xb = x_ref[0] if is3d else x_ref[...]
        h = _ln(xb.astype(jnp.float32), gamma, beta, eps).astype(compute_dtype)
        g = jnp.dot(h, w1, preferred_element_type=jnp.float32)
        if b1 is not None:
            g = g + b1
        if gated:
            u = jnp.dot(h, w3, preferred_element_type=jnp.float32)
            if b3 is not None:
                u = u + b3
            act = (g * jax.lax.logistic(g)) * u  # silu(g) * u
        else:
            act = _gelu_exact(g)
        act = act.astype(compute_dtype)
        out = jnp.dot(act, w2, preferred_element_type=jnp.float32)
        if b2 is not None:
            out = out + b2
        if is3d:
            o_ref[0] = xb + out.astype(o_ref.dtype)
        else:
            o_ref[...] = xb + out.astype(o_ref.dtype)

    return kernel


def _act_bytes(bm, d, hid, n_w, itemsize):
    return bm * (2 * d * itemsize * 2 + hid * 4 * (2 if n_w == 3 else 1))


def _fits_3d(n, d, hid, n_w, itemsize):
    """Whether a full-image (N-row) cell + resident weights fits a ~13 MB
    VMEM budget; when it does not (e.g. generation encoders at N=1280) the
    wrapper flattens to the 2-D row-blocked grid instead. (The 3-D budget is
    a bit more generous than the 2-D one: staying 3-D avoids a materialized
    (B,N,C)<->(B*N,C) reshape between consecutive custom calls, ~0.36 ms at
    ViT-B/196 B=64.)"""
    return n_w * d * hid * itemsize + _act_bytes(n, d, hid, n_w, itemsize) <= 13 * 1024 * 1024


def _pick_block_rows(m, d, hid, n_w, itemsize):
    """Largest row block whose working set fits a ~12 MB VMEM budget
    (weights resident + x/out blocks + the fp32 hidden activation)."""
    weight_bytes = n_w * d * hid * itemsize
    for bm in (1024, 512, 256, 128, 64, 32, 16, 8):
        if weight_bytes + _act_bytes(bm, d, hid, n_w, itemsize) <= 12 * 1024 * 1024 or bm == 8:
            return min(bm, max(8, m))
    return 8


def _ln_matmul_kernel(eps, norm_bias, mm_bias, compute_dtype, is3d):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        gamma = next(it)[...]
        beta = next(it)[...] if norm_bias else None
        w = next(it)[...]
        b = next(it)[...] if mm_bias else None
        o_ref = next(it)

        xb = x_ref[0] if is3d else x_ref[...]
        h = _ln(xb.astype(jnp.float32), gamma, beta, eps).astype(compute_dtype)
        out = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if b is not None:
            out = out + b
        if is3d:
            o_ref[0] = out.astype(o_ref.dtype)
        else:
            o_ref[...] = out.astype(o_ref.dtype)

    return kernel


def _row_layout(x):
    """(grid, row-block in-spec builder, out-spec builder) for 2-D (M, D)
    row-blocked or 3-D (B, N, D) per-image grids. 3-D mode exists so the
    fused block pipeline's custom-call edges carry identical shapes — XLA
    materializes reshape copies between consecutive custom calls (measured
    0.09 ms/layer at ViT-B/196 B=64) because it cannot fuse a bitcast into
    either side."""
    if x.ndim == 3:
        B, N, D = x.shape
        grid = (B,)

        def in_spec(_bm):
            return pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

        def out_spec(_bm, f):
            return pl.BlockSpec((1, N, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

        def out_shape(f, dt):
            return jax.ShapeDtypeStruct((B, N, f), dt)

        return N, grid, in_spec, out_spec, out_shape
    M, D = x.shape

    def in_spec(bm):
        return pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def out_spec(bm, f):
        return pl.BlockSpec((bm, f), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def out_shape(f, dt):
        return jax.ShapeDtypeStruct((M, f), dt)

    return None, None, in_spec, out_spec, out_shape


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def pallas_ln_matmul(
    x: jnp.ndarray,  # (M, D) rows, or (B, N, D) per-image grid
    gamma: jnp.ndarray,  # fp32 (D,)
    beta,  # fp32 (D,) or None
    w: jnp.ndarray,  # (D, F) compute dtype
    b,  # fp32 (F,) or None
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """LN(x) @ w + b — the pre-norm QKV projection (fm_utils.py:310-334 first
    half) without the LN stats HBM round-trip. Returns (..., F) in w.dtype."""
    D = x.shape[-1]
    M = x.size // D
    F = w.shape[1]
    norm_bias = beta is not None
    mm_bias = b is not None
    compute_dtype = w.dtype
    if x.ndim == 3 and not _fits_3d(x.shape[1], D, F, 1, compute_dtype.itemsize):
        out2 = pallas_ln_matmul(x.reshape(M, D), gamma, beta, w, b,
                                eps=eps, interpret=interpret)
        return out2.reshape(x.shape[0], x.shape[1], F)
    n3, grid3, in_spec, out_spec, out_shape = _row_layout(x)
    if grid3 is not None:
        bm, grid = n3, grid3
    else:
        bm = _pick_block_rows(M, D, F, 1, compute_dtype.itemsize)
        grid = ((M + bm - 1) // bm,)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    cast = lambda a: a.astype(jnp.float32)
    in_specs = [in_spec(bm), const_spec(gamma.shape)]
    args = [x, cast(gamma)]
    if norm_bias:
        in_specs.append(const_spec(beta.shape))
        args.append(cast(beta))
    in_specs.append(const_spec(w.shape))
    args.append(w)
    if mm_bias:
        in_specs.append(const_spec(b.shape))
        args.append(cast(b))

    return pl.pallas_call(
        _ln_matmul_kernel(eps, norm_bias, mm_bias, compute_dtype, x.ndim == 3),
        out_shape=out_shape(F, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec(bm, F),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * F,
            bytes_accessed=(M * D + D * F + M * F) * compute_dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "gated", "interpret"),
)
def pallas_ln_mlp(
    x: jnp.ndarray,  # (M, D) token rows
    gamma: jnp.ndarray,  # fp32 (D,)
    beta,  # fp32 (D,) or None
    w1: jnp.ndarray,  # (D, HID) compute dtype
    b1,  # fp32 (HID,) or None
    w2: jnp.ndarray,  # (HID, D)
    b2,  # fp32 (D,) or None
    w3=None,  # (D, HID) for gated (SwiGLU); None for plain GELU MLP
    b3=None,
    eps: float = 1e-6,
    gated: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + fc2(act(fc1(LN(x)))) over (M, D) token rows or (B, N, D) images.
    Returns x.shape in x.dtype."""
    D = x.shape[-1]
    M = x.size // D
    HID = w1.shape[1]
    norm_bias = beta is not None
    mlp_bias = b1 is not None
    compute_dtype = w1.dtype
    if x.ndim == 3 and not _fits_3d(x.shape[1], D, HID, 3 if gated else 2,
                                    compute_dtype.itemsize):
        out2 = pallas_ln_mlp(x.reshape(M, D), gamma, beta, w1, b1, w2, b2,
                             w3, b3, eps=eps, gated=gated, interpret=interpret)
        return out2.reshape(x.shape)
    n3, grid3, in_spec, out_spec, out_shape = _row_layout(x)
    if grid3 is not None:
        bm, grid = n3, grid3
    else:
        bm = _pick_block_rows(M, D, HID, 3 if gated else 2, compute_dtype.itemsize)
        grid = ((M + bm - 1) // bm,)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM)

    cast = lambda a: a.astype(jnp.float32)
    in_specs = [in_spec(bm), const_spec(gamma.shape)]
    args = [x, cast(gamma)]
    if norm_bias:
        in_specs.append(const_spec(beta.shape))
        args.append(cast(beta))
    in_specs.append(const_spec(w1.shape))
    args.append(w1)
    if mlp_bias:
        in_specs.append(const_spec(b1.shape))
        args.append(cast(b1))
    if gated:
        in_specs.append(const_spec(w3.shape))
        args.append(w3)
        if mlp_bias:
            in_specs.append(const_spec(b3.shape))
            args.append(cast(b3))
    in_specs.append(const_spec(w2.shape))
    args.append(w2)
    if mlp_bias:
        in_specs.append(const_spec(b2.shape))
        args.append(cast(b2))

    n_mm = 3 if gated else 2
    return pl.pallas_call(
        _mlp_kernel(eps, norm_bias, mlp_bias, gated, compute_dtype, x.ndim == 3),
        out_shape=out_shape(D, x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec(bm, D),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * D * HID * n_mm,
            bytes_accessed=(2 * M * D + n_mm * D * HID) * compute_dtype.itemsize,
            transcendentals=M * HID,
        ),
    )(*args)
