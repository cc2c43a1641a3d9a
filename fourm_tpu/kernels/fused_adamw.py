"""Fused AdamW update: one Pallas kernel pass per parameter leaf.

The optax.adamw chain (scale_by_adam -> add_decayed_weights -> scale_by_lr ->
apply_updates) measured 21.8 ms for the 4M-B 361M-param fp32 tree on v5e —
1.8x the 12.3 ms HBM floor (read g/p/m/v + write p/m/v = 7 passes x 1.44 GB).
The chain materializes the intermediate `updates` tree twice (once out of the
transformation, once into apply_updates) and XLA does not alias the moment
buffers across the update without donation, so several leaves round-trip HBM
more than the floor requires.

This kernel computes the WHOLE update (moments + bias correction + decoupled
weight decay + schedule scaling + parameter application) in one pass per
leaf with `input_output_aliasing` (p/m/v update in place):

    m' = b1 m + (1-b1) g           mhat = m' / (1 - b1^t)
    v' = b2 v + (1-b2) g^2         vhat = v' / (1 - b2^t)
    p' = p - lr (mhat / (sqrt(vhat) + eps) + wd_mask * wd * p)

— bit-matching optax.adamw's formula (eps_root=0, decoupled decay, count
incremented before correction; parity-tested against the optax chain in
tests/test_kernels.py).

Leaves whose element count is not lane-divisible fall back to the optax
math in plain XLA (none in the 4M trees — every tensor has a trailing
dim that is a multiple of 128 — but correctness must not depend on that).

Exposed via utils/optim.py `create_optimizer(..., fused=True)` which returns
a GradientTransformation-compatible object carrying a `fused_apply` method;
parallel/train.build_train_step uses `fused_apply` when present and falls
back to the standard update()/apply_updates() pair otherwise (mesh path,
frozen masks, clip chains).

Reference equivalent being replaced: torch.optim.AdamW driven by
fourm/utils/optim_factory.py:171-245 + native_scaler.py step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 1024  # (1024, 128) fp32 blocks: 512 KB/operand, 7 operands ~3.5 MB


def _adamw_kernel(b1: float, b2: float, eps: float, wd: float, decay: bool):
    def kernel(g_ref, p_ref, m_ref, v_ref, sc_ref, po_ref, mo_ref, vo_ref):
        g = g_ref[...].astype(jnp.float32)
        p = p_ref[...]
        m = m_ref[...]
        v = v_ref[...]
        lr = sc_ref[0]
        c1 = sc_ref[1]  # 1 / (1 - b1^t)
        c2 = sc_ref[2]  # 1 / (1 - b2^t)
        m2 = b1 * m + (1.0 - b1) * g
        v2 = b2 * v + (1.0 - b2) * g * g
        upd = (m2 * c1) / (jnp.sqrt(v2 * c2) + eps)
        if decay:
            upd = upd + wd * p
        po_ref[...] = p - lr * upd
        mo_ref[...] = m2
        vo_ref[...] = v2

    return kernel


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "wd", "decay",
                                             "interpret"))
def fused_adamw_leaf(g, p, m, v, scalars, b1=0.9, b2=0.999, eps=1e-8,
                     wd=0.0, decay=False, interpret=False):
    """One-leaf fused AdamW. scalars: fp32 (3,) = [lr, 1/(1-b1^t), 1/(1-b2^t)].
    Returns (p', m', v') with p/m/v aliased in place."""
    n = p.size
    use_pallas = interpret or jax.default_backend() == "tpu"
    if n % _LANES or p.dtype != jnp.float32 or not use_pallas:
        # XLA fallback, identical math
        g32 = g.astype(jnp.float32)
        lr, c1, c2 = scalars[0], scalars[1], scalars[2]
        m2 = b1 * m + (1.0 - b1) * g32
        v2 = b2 * v + (1.0 - b2) * g32 * g32
        upd = (m2 * c1) / (jnp.sqrt(v2 * c2) + eps)
        if decay:
            upd = upd + wd * p
        return p - lr * upd, m2, v2

    rows = n // _LANES
    shape2 = (rows, _LANES)
    block_rows = min(_BLOCK_ROWS, rows)
    # prefer an exact divisor to avoid a ragged tail block
    while rows % block_rows:
        block_rows -= 1
    grid = (rows // block_rows,)
    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    p2, m2, v2 = pl.pallas_call(
        _adamw_kernel(b1, b2, eps, wd, decay),
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 3,
        grid=grid,
        in_specs=[spec, spec, spec, spec, sspec],
        out_specs=[spec, spec, spec],
        input_output_aliases={1: 0, 2: 1, 3: 2},
        cost_estimate=pl.CostEstimate(
            flops=12 * n, bytes_accessed=7 * n * 4, transcendentals=n),
        interpret=interpret,
    )(g.reshape(shape2), p.reshape(shape2), m.reshape(shape2),
      v.reshape(shape2), scalars)
    return (p2.reshape(p.shape), m2.reshape(p.shape), v2.reshape(p.shape))


def adamw_scalars(count, schedule, b1: float, b2: float):
    """fp32 (3,) scalar vector for the kernel; count is the PRE-increment
    optax count. Matches optax exactly: bias correction uses t = count+1
    (scale_by_adam's count_inc), the schedule is evaluated at the
    pre-increment count (scale_by_schedule reads state.count BEFORE
    incrementing)."""
    t = (count + 1).astype(jnp.float32)
    lr = jnp.asarray(schedule(count) if callable(schedule) else schedule,
                     jnp.float32)
    c1 = 1.0 / (1.0 - jnp.float32(b1) ** t)
    c2 = 1.0 / (1.0 - jnp.float32(b2) ** t)
    return jnp.stack([lr, c1, c2])
