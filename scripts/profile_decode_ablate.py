"""Component ablation of the AR decode loop at late-chain shapes.

bench.py measures 3.9 ms/token (XLA path, B=16, M=2304, 12 layers) against a
~2.1 ms HBM floor. This script decomposes the per-token cost by running
fori_loops whose bodies contain only ONE component of the decoder step:

  full     — the exact microbench loop (embed + 12 layer steps + logits head)
  layers   — 12 layer steps only (no embed / logits / argmax)
  cross    — per layer: x += cross_attn.attend_decode(query_norm(x), xk, xv)
  self     — per layer: x += self_attn.step(norm1(x), cache, i) (incl. proj)
  mlp      — per layer: x += mlp(norm2(x))
  head     — embed_target_token + logits + argmax only
  kvread   — pure bandwidth probe: fp32 multiply-reduce over every cross K/V
             byte (the dominant stream), nothing else

Component sums won't exactly equal `full` (fusion boundaries differ) but they
localize the over-floor slack. Shapes/flags mirror bench.bench_decode_microbench.

Usage: python scripts/profile_decode_ablate.py [--batch 16] [--budget 2304]
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
    ap.add_argument("--nsteps", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    B, L, M, nsteps = args.batch, args.max_len, args.budget, args.nsteps
    cfg = create_fourm_config(
        "fm_base_12e_12d_swiglu_qknorm_nobias",
        encoder_modalities=MOD21_MODALITIES,
        decoder_modalities=MOD21_DECODER_MODALITIES,
        dtype="bfloat16",
    )
    model = FourM(cfg)
    batch = jax.tree.map(jnp.asarray,
                         synthetic_mod_batch(MOD21_MODALITIES, B, 64, 64, seed=0))

    def _init(r):
        p = model.init(r, jax.tree.map(lambda x: x[:1], batch), 64, 64)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

    params = jax.jit(_init)(jax.random.key(0))
    target = "caption"

    with use_pallas_attention():
        prefill = jax.jit(lambda p, md: model.apply(
            p, md, target, L, M, method="ar_prefill"))
        cross_kvs, enc_mask, y_emb = prefill(params, batch)
    tok0 = jnp.asarray(np.full((B, 1), 7, np.int32))
    C = cfg.dim
    y0 = jnp.zeros((B, 1, C), jnp.bfloat16)

    def fresh_caches():
        return jax.jit(lambda: model.apply(params, B, L,
                                           method="init_kv_caches"))()

    def _fence(out):
        # block_until_ready does not block through the axon tunnel; a scalar
        # readback does (same fence bench.py uses)
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(fn, *arg_builders, label):
        arglists = [tuple(b() for b in arg_builders) for _ in range(2)]
        _fence(fn(*arglists[0]))
        t0 = time.perf_counter()
        _fence(fn(*arglists[1]))
        ms = (time.perf_counter() - t0) / nsteps * 1e3
        print(f"{label:8s} {ms:7.3f} ms/token")
        return ms

    # ---- full: the exact microbench loop
    def m_full(self, tok, caches, ckvs, emask, yemb):
        def body(i, carry):
            tok, caches = carry
            y_t = self.embed_target_token(target, tok)
            y_t = y_t + jax.lax.dynamic_slice_in_dim(yemb, i, 1, axis=1)
            y, caches = self.decode_one_token(y_t, caches, ckvs, emask, i)
            logits = self.mod_logits(target, y)[:, 0]
            return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], caches
        return jax.lax.fori_loop(0, nsteps, body, (tok, caches))

    # ---- layers only
    def m_layers(self, y0, caches, ckvs, emask):
        def body(i, carry):
            y, caches = carry
            y, caches = self.decode_one_token(y, caches, ckvs, emask, i)
            return y.astype(jnp.bfloat16), caches
        return jax.lax.fori_loop(0, nsteps, body, (y0, caches))

    # ---- cross-attention only
    def m_cross(self, y0, ckvs, emask):
        def body(i, y):
            for blk, (xk, xv) in zip(self.decoder, ckvs):
                y = y + blk.cross_attn.attend_decode(
                    blk.query_norm(y), xk, xv, emask)
            return (y + i * 0.0).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, nsteps, body, y0)

    # ---- self-attention only
    def m_self(self, y0, caches):
        def body(i, carry):
            y, caches = carry
            new = []
            for blk, (ck, cv) in zip(self.decoder, caches):
                sa, ck, cv = blk.self_attn.step(blk.norm1(y), ck, cv, i)
                y = y + sa
                new.append((ck, cv))
            return y.astype(jnp.bfloat16), new
        return jax.lax.fori_loop(0, nsteps, body, (y0, caches))

    # ---- mlp only
    def m_mlp(self, y0):
        def body(i, y):
            for blk in self.decoder:
                y = y + blk.mlp(blk.norm2(y))
            return (y + i * 0.0).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, nsteps, body, y0)

    # ---- embed + logits head + argmax only
    def m_head(self, tok):
        def body(i, tok):
            y_t = self.embed_target_token(target, tok)
            logits = self.mod_logits(target, y_t)[:, 0]
            return jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        return jax.lax.fori_loop(0, nsteps, body, tok)

    # ---- pure cross-KV read probe
    def m_kvread(self, q, ckvs):
        def body(i, q):
            # scale depends on the carry so the reads can't be hoisted out
            # of the loop; *0.0 is not foldable for floats (NaN semantics)
            scale = jnp.mean(q) * 0.0 + 1.0
            s = q
            for (xk, xv) in ckvs:
                s = s + jnp.mean(xk.astype(jnp.float32) * scale, axis=3,
                                 keepdims=True)
                s = s + jnp.mean(xv.astype(jnp.float32) * scale, axis=3,
                                 keepdims=True)
            return s
        return jax.lax.fori_loop(0, nsteps, body, q)

    with use_pallas_attention():
        # cross_kvs/enc_mask/y_emb MUST be jit ARGUMENTS: closing over them
        # embeds 1.3 GiB of constants in the program the tunnel ships to the
        # remote compiler (HTTP 413)
        full = jax.jit(lambda p, t, c, kvs, em, ye: model.apply(
            p, t, c, kvs, em, ye, method=m_full))
        layers = jax.jit(lambda p, y, c, kvs, em: model.apply(
            p, y, c, kvs, em, method=m_layers))
        cross = jax.jit(lambda p, y, kvs, em: model.apply(
            p, y, kvs, em, method=m_cross))
        self_ = jax.jit(lambda p, y, c: model.apply(p, y, c, method=m_self))
        mlp = jax.jit(lambda p, y: model.apply(p, y, method=m_mlp))
        head = jax.jit(lambda p, t: model.apply(p, t, method=m_head))
        q0 = jnp.zeros((B, cfg.num_heads, cfg.dim // cfg.num_heads, 1),
                       jnp.float32)
        kvread = jax.jit(lambda p, q, kvs: model.apply(p, q, kvs,
                                                       method=m_kvread))

        kv_bytes = sum(xk.size * xk.dtype.itemsize + xv.size * xv.dtype.itemsize
                       for xk, xv in cross_kvs)
        print(f"# B={B} M={M} L={L} layers={cfg.decoder_depth} "
              f"cross-KV {kv_bytes / 2**20:.0f} MiB/token")
        t_full = timed(full, lambda: params, lambda: tok0, fresh_caches,
                       lambda: cross_kvs, lambda: enc_mask, lambda: y_emb,
                       label="full")
        timed(layers, lambda: params, lambda: y0, fresh_caches,
              lambda: cross_kvs, lambda: enc_mask, label="layers")
        t_cross = timed(cross, lambda: params, lambda: y0,
                        lambda: cross_kvs, lambda: enc_mask, label="cross")
        timed(self_, lambda: params, lambda: y0, fresh_caches, label="self")
        timed(mlp, lambda: params, lambda: y0, label="mlp")
        timed(head, lambda: params, lambda: tok0, label="head")
        t_kv = timed(kvread, lambda: params, lambda: q0, lambda: cross_kvs,
                     label="kvread")
        bw = kv_bytes / (t_kv * 1e-3) / 1e9
        print(f"# kvread achieved {bw:.0f} GB/s on the cross-KV stream; "
              f"cross over kvread: {t_cross - t_kv:+.3f} ms")


if __name__ == "__main__":
    main()
