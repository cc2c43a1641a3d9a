"""Phase profile of encode()/ar_prefill at headline chain shapes (B=16,
enc budget 2304): embedding+compaction vs encoder blocks vs cross-KV, with
the encoder blocks timed under BOTH attention impls (pallas flash MHA vs
XLA) — round 4 showed Pallas kernels can regress across toolchains, so
measure, don't assume.

Usage: python scripts/profile_encoder.py [--batch 16] [--budget 2304]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--budget", type=int, default=2304)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.ops.transformer import use_pallas_attention
    from fourm_tpu.utils.synthetic import (
        MOD21_DECODER_MODALITIES,
        MOD21_MODALITIES,
        synthetic_mod_batch,
    )

    B, M = args.batch, args.budget
    cfg = create_fourm_config(
        "fm_base_12e_12d_swiglu_qknorm_nobias",
        encoder_modalities=MOD21_MODALITIES,
        decoder_modalities=MOD21_DECODER_MODALITIES,
        dtype="bfloat16",
    )
    model = FourM(cfg)
    batch = jax.tree.map(jnp.asarray, synthetic_mod_batch(MOD21_MODALITIES, B, 64, 64, seed=0))

    def _init(r):
        p = model.init(r, jax.tree.map(lambda x: x[:1], batch), 64, 64)
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

    params = jax.jit(_init)(jax.random.key(0))

    def fence(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        _ = float(jnp.ravel(leaf)[0])

    def timeit(f, *a, label=""):
        out = f(*a)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        fence(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:52s} {dt*1e3:8.3f} ms", flush=True)
        return out, dt

    # embedding + token selection alone (no blocks)
    fmask = jax.jit(lambda v, md: model.apply(v, md, M, method="forward_mask_encoder"))
    (x, emb, mask, modid), _ = timeit(fmask, params, batch,
                                      label=f"forward_mask_encoder (embed+select, M={M})")

    xin = (x + emb).astype(jnp.bfloat16)
    for use_pallas, name in ((True, "pallas flash"), (False, "xla")):
        with use_pallas_attention(use_pallas):
            fenc = jax.jit(lambda v, x, m: model.apply(
                v, x, m, method="forward_encoder"))
            timeit(fenc, params, xin, mask,
                   label=f"forward_encoder 12 blocks [{name}]")

    # full encode + full prefill, both impls
    for use_pallas, name in ((True, "pallas flash"), (False, "xla")):
        with use_pallas_attention(use_pallas):
            enc = jax.jit(lambda v, md: model.apply(v, md, M, method="encode"))
            timeit(enc, params, batch, label=f"encode() [{name}]")
            prefill = jax.jit(lambda v, md: model.apply(
                v, md, "caption", 256, M, method="ar_prefill"))
            timeit(prefill, params, batch, label=f"ar_prefill() [{name}]")

    # matmul-FLOP reference points
    enc_flops = 2 * 85e6 * M * B * 1e-12
    print(f"# encoder blocks matmul FLOPs: {enc_flops:.2f} TFLOP "
          f"-> {enc_flops/197*1e3:.1f} ms at v5e bf16 peak")


if __name__ == "__main__":
    main()
