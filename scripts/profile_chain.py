"""Per-phase profile of the headline chain's AR hot loop on the real chip.

Isolates (a) ar_prefill (encoder + cross-KV + y_emb), (b) the steady-state
decode_one_token cost per token, (c) the logits head + sampling overhead, at
the late-chain shapes the ROUND_NOTES profile identified (B=16, enc budget
2304-3072, max_len 256). Timings fence with host fetches (axon tunnel).

Usage: python scripts/profile_chain.py [--batch 16] [--budget 2304]
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
    ap.add_argument("--max_len", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
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

    B, L, M = args.batch, args.max_len, args.budget
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

    target = "caption"

    def fence(tree):
        # scalar fetch only: np.asarray(leaf) would pull the WHOLE tensor
        # through the axon tunnel (56 MB for prefill outputs) and corrupt
        # the timing — index down to one element on device first.
        leaf = jax.tree_util.tree_leaves(tree)[0]
        _ = float(jnp.ravel(leaf)[0])

    def timeit(f, *a, iters=None, label=""):
        iters = iters or args.iters
        out = f(*a)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:44s} {dt*1e3:8.3f} ms")
        return out, dt

    with use_pallas_attention():
        # ---- prefill ----
        prefill = jax.jit(lambda v, md: model.apply(v, md, target, L, M, method="ar_prefill"))
        (cross_kvs, enc_mask, y_emb), t_prefill = timeit(
            prefill, params, batch, iters=10, label=f"ar_prefill (enc budget {M})")

        # encoder alone, for the prefill split
        enc = jax.jit(lambda v, md: model.apply(v, md, M, method="encode"))
        _, t_enc = timeit(enc, params, batch, iters=10, label="  encode() alone")

        # ---- one decode step ----
        caches = jax.jit(lambda: model.apply(params, B, L, method="init_kv_caches"))()

        tok = jnp.zeros((B, 1), jnp.int32)

        def step(variables, tok, caches, ckvs, emask, yemb, t):
            y_t = model.apply(variables, target, tok, method="embed_target_token")
            y_t = y_t + jax.lax.dynamic_slice_in_dim(yemb, t, 1, axis=1)
            y_out, caches = model.apply(
                variables, y_t, caches, ckvs, emask, t, method="decode_one_token")
            logits = model.apply(variables, target, y_out, method="mod_logits")[:, 0]
            return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], caches

        jstep = jax.jit(step, donate_argnums=(2,))
        t = jnp.int32(1)

        def run_step(c):
            return jstep(params, tok, c, cross_kvs, enc_mask, y_emb, t)

        tok2, caches = run_step(caches)
        fence(tok2)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            tok2, caches = run_step(caches)
        fence(tok2)
        t_step = (time.perf_counter() - t0) / args.iters
        print(f"{'decode step (embed+12L+logits+argmax)':44s} {t_step*1e3:8.3f} ms")

        # decode_one_token alone (no logits head)
        y_t0 = jnp.zeros((B, 1, cfg.dim), jnp.bfloat16)
        dstep = jax.jit(
            lambda v, y, c, ckvs, em, t: model.apply(v, y, c, ckvs, em, t,
                                                     method="decode_one_token"),
            donate_argnums=(2,))
        caches2 = jax.jit(lambda: model.apply(params, B, L, method="init_kv_caches"))()
        y_o, caches2 = dstep(params, y_t0, caches2, cross_kvs, enc_mask, t)
        fence(y_o)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y_o, caches2 = dstep(params, y_t0, caches2, cross_kvs, enc_mask, t)
        fence(y_o)
        t_dec = (time.perf_counter() - t0) / args.iters
        print(f"{'  decode_one_token alone (12 layers)':44s} {t_dec*1e3:8.3f} ms")

        # ---- the REAL decode cost: a fori_loop of steps inside ONE jit ----
        # (per-call jstep timing above includes ~tunnel dispatch per call;
        # the sampler runs the whole loop device-side)
        nsteps = 64

        # params/cross_kvs MUST be jit arguments: closed-over they become
        # program constants and the remote compile request blows the server's
        # body limit (HTTP 413 observed at 113 MB of cross-KV constants)
        @jax.jit
        def loop(variables, tok, caches, ckvs, emask, yemb):
            def loop_body(i, carry):
                tok, caches = carry
                y_t = model.apply(variables, target, tok, method="embed_target_token")
                y_t = y_t + jax.lax.dynamic_slice_in_dim(yemb, i, 1, axis=1)
                y_out, caches = model.apply(
                    variables, y_t, caches, ckvs, emask, i, method="decode_one_token")
                logits = model.apply(variables, target, y_out, method="mod_logits")[:, 0]
                return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], caches

            return jax.lax.fori_loop(0, nsteps, loop_body, (tok, caches))

        caches3 = jax.jit(lambda: model.apply(params, B, L, method="init_kv_caches"))()
        tok3, caches3 = loop(params, tok, caches3, cross_kvs, enc_mask, y_emb)
        fence(tok3)
        caches3 = jax.jit(lambda: model.apply(params, B, L, method="init_kv_caches"))()
        t0 = time.perf_counter()
        tok3, caches3 = loop(params, tok3, caches3, cross_kvs, enc_mask, y_emb)
        fence(tok3)
        t_loop = (time.perf_counter() - t0) / nsteps
        print(f"{'in-jit decode loop, per token':44s} {t_loop*1e3:8.3f} ms")

        # bandwidth floor for this shape
        H, Dh = cfg.num_heads, cfg.dim // cfg.num_heads
        cross_bytes = 12 * 2 * B * H * Dh * M * 2
        self_bytes = 12 * 2 * B * H * Dh * L * 2
        d = cfg.dim
        hid = int(2 * (4 * d) / 3)
        w_bytes = 12 * (3*d*d + d*d + d*d + 2*d*d + d*d + 3*d*hid) * 2
        floor_ms = (cross_bytes + self_bytes + w_bytes) / 819e9 * 1e3
        print(f"{'  bandwidth floor (cross+self KV+weights)':44s} {floor_ms:8.3f} ms"
              f"   (cross {cross_bytes/819e9*1e3:.2f}, weights {w_bytes/819e9*1e3:.2f})")


if __name__ == "__main__":
    main()
