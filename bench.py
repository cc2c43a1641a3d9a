"""Benchmark: RGB-to-all chained generation, samples/sec/chip — the BASELINE.json
headline metric ("Samples/sec/chip RGB-to-all (4M-21 B/XL)").

Measures the full chained any-to-any token generation of the Demo4MSampler default
RGB->X schedule over the 4M-21 modality set (8 image-token targets via ROAR + 6
autoregressive sequence targets with KV-cached decoding), with the Pallas fused
attention kernel, bf16, on whatever jax.devices() provides (one v5e chip under the
driver). Untrained weights time identically to trained ones for the fixed-shape
parts; AR decoding without EOS runs to the full target length, making this a
CONSERVATIVE (worst-case) number.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The reference
repo publishes no throughput numbers (SURVEY.md §6), so vs_baseline is null until
an A100 measurement of the reference exists.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: driver re-runs skip the ~1 min/program compiles
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from fourm_tpu.api import FourMSampler
    from fourm_tpu.generate import init_empty_target_modality, init_full_input_modality
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.ops.transformer import use_pallas_attention
    from fourm_tpu.utils.synthetic import (
        MOD21_DECODER_MODALITIES,
        MOD21_MODALITIES,
        synthetic_mod_batch,
    )

    B = 4  # batch of images generated together per chip
    # Representative RGB-to-all target subset: every vocab size and decoding
    # scheme (ROAR img targets at 196 + 256 tokens, AR sequences at 3 lengths).
    # Each target modality is its own compiled program; the full 14-target chain
    # times identically per target but overflows the bench's compile budget on
    # the remote-compile tunnel.
    TARGETS = [
        "tok_clip@224", "tok_depth@224", "tok_semseg@224", "tok_dinov2@224",
        "caption", "metadata",
    ]

    cfg = create_fourm_config(
        "fm_base_12e_12d_swiglu_qknorm_nobias",
        encoder_modalities=MOD21_MODALITIES,
        decoder_modalities=MOD21_DECODER_MODALITIES,
        dtype="bfloat16",
    )
    model = FourM(cfg)
    init_batch = jax.tree.map(
        jnp.asarray, synthetic_mod_batch(MOD21_MODALITIES, 1, 64, 64, seed=0)
    )
    params = model.init(jax.random.key(0), init_batch, 64, 64)

    # minimal text tokenizer (sentinel ids for AR span merging); trained release
    # tokenizers plug in identically
    import tempfile

    from fourm_tpu.utils.text_tokenizer import (
        generate_sentinel_tokens,
        train_unified_wordpiece_tokenizer,
    )

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("a photo of a cat and a dog\n" * 200)
        corpus = f.name
    tok = train_unified_wordpiece_tokenizer(
        corpus, vocab_size=300, sentinel_tokens=generate_sentinel_tokens(num=20),
        show_progress=False,
    )
    sampler = FourMSampler(fm=(model, params), text_tokenizer=tok)

    rng = np.random.RandomState(0)
    sample = {"rgb@224": rng.rand(B, 224, 224, 3).astype(np.float32)}
    mod_dict = sampler.prepare_sample(sample, ["rgb@224"], TARGETS, batch_size=B)
    schedule = sampler.build_schedule(["rgb@224"], TARGETS)

    def run(seed):
        with use_pallas_attention():
            out = sampler.generate(dict(mod_dict), schedule, seed=seed)
        # fence: fetch one token tensor per target to host
        for t in TARGETS:
            _ = np.asarray(out[t]["tensor"][0, :1])
        return out

    t0 = time.perf_counter()
    run(0)  # compile
    compile_s = time.perf_counter() - t0

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        run(1 + i)
    dt = time.perf_counter() - t0
    samples_per_sec_chip = B * iters / dt / len(jax.devices())

    print(json.dumps({
        "metric": "RGB-to-all chained generation samples/sec/chip (4M-21 B, 6-target "
                  "representative chain, ROAR+AR, Pallas attention, bf16, worst-case EOS)",
        "value": round(samples_per_sec_chip, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    }))
    print(f"# compile {compile_s:.0f}s, steady-state {dt / iters:.2f}s per {B}-image batch")


if __name__ == "__main__":
    main()
