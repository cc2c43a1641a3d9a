"""Section profile of the VQ tokenize path (BASELINE metric 2).

bench.py measures ~20 ms/batch-64 against a ~12.6 ms speed-of-light
(compute-bound encoder + exact fp32-parity search). This decomposes the gap:

  full      — model.tokenize (patchify + 12 ViT blocks + quant_proj + search)
  encoder   — ViT encoder only (patchify + blocks + final norm)
  patchify  — patch projection + posemb add only
  search    — nearest-codebook search only (input: precomputed latents)
  proj+search — quant_proj + search (the post-encoder tail)

Usage: python scripts/profile_vq.py [--batch 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
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

    from fourm_tpu.ops.transformer import use_pallas_attention
    from fourm_tpu.vq import VQ

    B = args.batch
    model = VQ(image_size=224, patch_size=16, enc_type="vit_b_enc",
               codebook_size=16384, latent_dim=32, nearest_impl="pallas",
               dtype="bfloat16")
    x0 = jnp.zeros((B, 224, 224, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)},
                           x0[:1])
    x = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224, 3)
                    .astype(np.float32))

    def timed(fn, *fargs, label):
        out = fn(*fargs)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # fence
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label:12s} {ms:7.3f} ms/batch-{B}")
        return ms

    def m_encoder(self, x):
        return self.encoder(self.prepare_input(x))

    def m_projsearch(self, h):
        h = self.quant_proj(h)
        Bq, Hq, Wq, D = h.shape
        _, tokens, _ = self.quantize(h.reshape(Bq, Hq * Wq, D), train=False)
        return tokens

    def m_search(self, z):
        _, tokens, _ = self.quantize(z, train=False)
        return tokens

    with use_pallas_attention():
        full = jax.jit(lambda v, x: model.apply(v, x, method="tokenize"))
        enc = jax.jit(lambda v, x: model.apply(v, x, method=m_encoder))
        h = enc(variables, x)  # (B, 14, 14, 768)
        projsearch = jax.jit(lambda v, h: model.apply(v, h, method=m_projsearch))
        z = jax.jit(lambda v, h: model.apply(
            v, h, method=lambda s, hh: s.quant_proj(hh)))(variables, h)
        z2 = z.reshape(B, -1, z.shape[-1])
        search = jax.jit(lambda v, z: model.apply(v, z, method=m_search))

        t_full = timed(full, variables, x, label="full")
        t_enc = timed(enc, variables, x, label="encoder")

        # blocks-only: a standalone 12-block ViT-B stack on precomputed tokens
        # (fresh params — timing only). encoder - blocks = patchify + posemb.
        from fourm_tpu.ops.transformer import Block

        class _Stack(__import__("flax").linen.Module):
            @__import__("flax").linen.compact
            def __call__(self, t):
                for i in range(12):
                    t = Block(dim=768, num_heads=12, mlp_ratio=4.0,
                              qkv_bias=True, dtype=jnp.bfloat16,
                              name=f"b{i}")(t)
                return t

        stack = _Stack()
        tkns = h.reshape(B, -1, h.shape[-1])
        sv = jax.jit(stack.init)(jax.random.key(2), tkns[:1])
        sv = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, sv)
        blocks = jax.jit(lambda v, t: stack.apply(v, t))
        timed(blocks, sv, tkns, label="blocks")

        t_ps = timed(projsearch, variables, h, label="proj+search")
        t_s = timed(search, variables, z2, label="search")
        print(f"# encoder+tail-full gap: {t_enc + t_ps - t_full:+.3f} ms "
              f"(fusion-boundary overlap)")


if __name__ == "__main__":
    main()
