"""Repro/status sweep for remote-TPU Pallas compiler failures (HTTP 500s).

Round 3 abandoned two kernels after the axon remote compiler returned HTTP
500s on "several larger kernel shapes" (ROUND_NOTES r3, gaps #1/#3): a
monolithic fused decoder-layer step and a heads-in-kernel encoder flash.
Neither failing kernel was committed, which made the toolchain issue
unactionable — this script fixes that by sweeping the CURRENT fused kernels
(kernels/decode_step.py, kernels/attention.py) across block configurations
from comfortably-fitting to deliberately VMEM-oversubscribed, and printing a
per-config outcome table:

  ok          — compiled and ran on the attached TPU
  ValueError  — rejected client-side by the Pallas/Mosaic lowering (expected
                for misaligned or oversize blocks; NOT a toolchain bug)
  RuntimeError/XlaRuntimeError with 'INTERNAL' or 'HTTP' — the remote
                compiler crashed; THIS is the bug class to report

Run: python scripts/repro_pallas_500.py            (real chip via axon)
     python scripts/repro_pallas_500.py --interpret (CPU sanity pass)

Round-4 status (2026-08-17, axon v5e): the decode-step kernels at all
production shapes (4M-B/L/XL geometries) compile and run clean — no 500s
reproduced. The round-3 failures are therefore either fixed in the current
toolchain or were specific to the uncommitted kernel structure. Keep this
sweep as the canary: re-run after any toolchain update.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def outcome(fn):
    try:
        r = fn()
        if r is None:
            return "skipped (no block config fits VMEM budget)"
        import jax
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        import numpy as np
        leaf = jax.tree_util.tree_leaves(r)[0]
        ok = bool(np.isfinite(np.asarray(leaf, np.float32)).all())
        return "ok" if ok else "ok (non-finite output!)"
    except ValueError as e:
        return f"ValueError: {str(e)[:100]}"
    except Exception as e:  # noqa: BLE001 — classify the remote-compile crash
        s = f"{type(e).__name__}: {str(e)[:140]}"
        if "500" in s or "INTERNAL" in s.upper():
            s = "*** REMOTE COMPILER FAILURE *** " + s
        return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fourm_tpu.kernels.attention import flash_attention
    from fourm_tpu.kernels.decode_step import (pallas_cross_decode_attn,
                                               pallas_residual_mlp,
                                               pallas_self_decode)

    interp = args.interpret
    # fp32 under --interpret (bf16 emulation on CPU is ~10x slower); the
    # doubled itemsize makes the VMEM pickers skip a few configs that run
    # fine at bf16 on the real chip — the real-chip run is the authoritative
    # table, the interpret pass is a smoke check
    dt = jnp.bfloat16 if not interp else jnp.float32
    rng = np.random.RandomState(0)
    r = lambda *s: jnp.asarray(rng.randn(*s), dt) * 0.1

    rows = []

    # decode-step kernels across model geometries (B doubles under CFG)
    for name, (B, C, H, L, M) in {
        "4M-B  chain":      (16, 768, 12, 256, 2304),
        "4M-B  CFG-doubled": (32, 768, 12, 256, 2304),
        "4M-L  chain":      (16, 1024, 16, 256, 2304),
        "4M-XL chain":      (8, 2048, 32, 256, 1536),
        "4M-B  SR448":      (4, 768, 12, 256, 6400),
    }.items():
        Dh = C // H
        HID = int(2 * (4 * C) / 3)
        x = r(B, C)
        g = jnp.ones((C,), jnp.float32)
        qn = jnp.ones((Dh,), jnp.float32)
        rows.append((f"self_decode  {name}", outcome(lambda: pallas_self_decode(
            x, g, None, r(C, 3 * C), None, qn, None, qn, None,
            r(B, H, Dh, L), r(B, H, Dh, L), jnp.int32(5), H,
            interpret=interp))))
        rows.append((f"cross_decode {name}", outcome(
            lambda: pallas_cross_decode_attn(
                x, g, None, r(C, C), None, qn, None, r(B, H, Dh, M),
                r(B, H, Dh, M), jnp.zeros((B, M), jnp.float32), H,
                interpret=interp))))
        rows.append((f"residual_mlp {name}", outcome(
            lambda: pallas_residual_mlp(
                x, x, r(C, C), None, g, None, r(C, HID), None, r(HID, C),
                None, r(C, HID), None, gated=True, interpret=interp))))

    # encoder flash at prefill shapes, including the oversized blocks that
    # round 3 reported as remote-compiler failures
    B, H, Dh = 16, 12, 64
    for N, bq, bk in [(2304, 1024, 1024), (3072, 1024, 1024),
                      (2304, 2048, 2048), (3072, 3072, 3072)]:
        q = r(B, H, N, Dh)
        rows.append((f"flash_attention N={N} blocks=({bq},{bk})", outcome(
            lambda: flash_attention(q, q, q, None, block_q=bq, block_k=bk,
                                    interpret=interp))))

    w = max(len(a) for a, _ in rows)
    for a, b in rows:
        print(f"{a:{w}s}  {b}")


if __name__ == "__main__":
    main()
