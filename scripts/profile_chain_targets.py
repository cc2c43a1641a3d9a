"""Per-TARGET wall-clock breakdown of the headline 14-target chain (B=16).

Replicates bench.py's headline setup exactly, then drives the sampler's
schedule groups one at a time with a host fence after each, printing per
(target, scheme) wall time for the steady-state iteration. The fences break
some cross-group pipelining, so the total prints alongside bench.py's
unfenced chain time for calibration.

Usage: python scripts/profile_chain_targets.py [--batch 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model", default="fm_base_12e_12d_swiglu_qknorm_nobias")
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

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_text_tokenizer

    from fourm_tpu.api import DEFAULT_ORDER, FourMSampler
    from fourm_tpu.data.modality_info import MODALITY_INFO
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.ops.transformer import use_pallas_attention
    from fourm_tpu.utils.synthetic import (
        MOD21_DECODER_MODALITIES,
        MOD21_MODALITIES,
        synthetic_mod_batch,
    )

    tok = build_text_tokenizer()
    targets = [t for t in DEFAULT_ORDER if t != "tok_rgb@224"]
    enc_mods = tuple(MOD21_MODALITIES)
    dec_mods = tuple(MOD21_DECODER_MODALITIES)
    cfg = create_fourm_config(args.model, encoder_modalities=enc_mods,
                              decoder_modalities=dec_mods, dtype="bfloat16")
    model = FourM(cfg)
    init_batch = jax.tree.map(
        jnp.asarray, synthetic_mod_batch(enc_mods, 1, 64, 64, seed=0))

    def _init_bf16(r):
        p = model.init(r, init_batch, 64, 64)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

    params = jax.jit(_init_bf16)(jax.random.key(0))
    sampler = FourMSampler(fm=(model, params), text_tokenizer=tok)

    B = args.batch
    rng_np = np.random.RandomState(0)
    sample = {"rgb@224": rng_np.rand(B, 224, 224, 3).astype(np.float32)}
    mod_dict = sampler.prepare_sample(sample, ["rgb@224"], targets, batch_size=B)
    schedule = sampler.build_schedule(["rgb@224"], targets)
    mod_dict = jax.tree.map(jnp.asarray, mod_dict)

    gs = sampler.sampler  # GenerationSampler

    def fence(md):
        leaf = jax.tree_util.tree_leaves(md)[0]
        _ = float(jnp.ravel(leaf)[0])

    def run_fenced(seed, report=False):
        rng = jax.random.key(seed)
        counts = gs._init_valid_counts(mod_dict)
        md = {m: dict(jax.tree.map(jnp.asarray, d)) for m, d in mod_dict.items()}
        rows = []
        total = 0.0
        for group in gs._group_schedule(schedule):
            rng, rng_step = jax.random.split(rng)
            first = group[0]
            tgt = first["target_domain"]
            scheme = (first.get("scheme") or
                      ("ar" if MODALITY_INFO[tgt].type != "img" else "?"))
            t0 = time.perf_counter()
            if len(group) > 1:
                md = gs._generate_img_target(md, group, rng_step, None, None,
                                             counts=counts)
            else:
                md = gs._generate_one_step(md, group[0], rng_step, tok, None,
                                           None, counts=counts)
            fence(md[tgt])
            dt = time.perf_counter() - t0
            total += dt
            rows.append((tgt, scheme, len(group), dt))
        if report:
            print(f"{'target':24s} {'scheme':8s} {'steps':>5s} {'ms':>9s} {'%':>5s}")
            for tgt, scheme, n, dt in rows:
                print(f"{tgt:24s} {scheme:8s} {n:5d} {dt*1e3:9.1f} "
                      f"{dt/total*100:5.1f}")
            print(f"{'TOTAL (fenced)':24s} {'':8s} {'':5s} {total*1e3:9.1f}")
        return md

    with use_pallas_attention():
        t0 = time.perf_counter()
        run_fenced(0)
        print(f"# compile+first run: {time.perf_counter()-t0:.0f}s", flush=True)
        run_fenced(1, report=True)


if __name__ == "__main__":
    main()
