"""Benchmark: the BASELINE.json headline metrics on real hardware.

Headline (the JSON "value"): samples/sec/chip for RGB-to-all chained generation
with 4M-21 B over the FULL Demo4MSampler default target chain (14 targets: 8
ROAR image-token modalities + 6 KV-cached autoregressive sequence modalities;
tok_rgb is the conditioning),
Pallas fused attention, bf16, batch-doubled CFG where scheduled. Untrained
weights time identically to trained ones for the fixed-shape parts; AR decoding
without a learned EOS runs to the full target length, making this a
CONSERVATIVE (worst-case) number.

Extra fields in the same JSON object:
  * vq_tokenize_images_per_sec: batch VQ tokenization @224 (ViT-B/16 encoder ->
    16k-codebook Pallas nearest-code search) — the second BASELINE metric —
    plus a roofline fraction vs the HBM-bandwidth bound of the codebook search.
  * train_step_samples_per_sec + train_mfu: 4M-B mod-7 training step (128/128
    tokens) and its model-FLOPs-utilization estimate vs 197 TFLOP/s bf16 (v5e).
  * xl_chain_samples_per_sec + xl_vs_baseline: the 4M-XL 3-target chain and
    its ratio vs the analytical reference-on-A100 estimate of the same chain
    (scripts/estimate_reference_a100.py) — the BASELINE.md north-star number.
  * xl_full_chain_samples_per_sec + xl_full_vs_baseline: the 4M-XL FULL
    14-target chain (the literal north-star workload) and its matching
    estimate ratio, in the default run since round 5.
  * sr448_samples_per_sec + sr448_vs_baseline: the 448px super-resolution
    chain (784-token modalities) and its estimate ratio.
  * toolchain: jax/jaxlib/libtpu versions + date + device kind — bench
    numbers are only comparable across rounds WITH this field (a round-4
    toolchain change silently inverted the fused-vs-XLA decode result).
  * ar_decode_ms_per_token_{xla,mxu,fused,int8kv}: every decode path measured
    every run; the headline chain AUTO-SELECTS the fastest of xla/mxu/fused
    (headline_decode_path records which; ar_decode_ms_per_token = winner).
  * vs_baseline (top level): headline chain vs the analytical A100 eager
    estimate of the reference pipeline (the reference publishes no throughput
    numbers, SURVEY.md §6 — BASELINE.md documents the derivation);
    vs_baseline_peak_bound divides by the unattainable 100%-MFU bound.
BENCH_SKIP_XL=1 / BENCH_SKIP_XL_FULL=1 / BENCH_SKIP_SR=1 opt out of the XL /
XL-full / SR chains for quick iterations (first cold-cache compile of each
costs several minutes).

Prints ONE JSON line.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def build_text_tokenizer():
    from fourm_tpu.utils.text_tokenizer import (
        generate_sentinel_tokens,
        train_unified_wordpiece_tokenizer,
    )

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("a photo of a cat and a dog\n" * 200)
        corpus = f.name
    return train_unified_wordpiece_tokenizer(
        corpus, vocab_size=300, sentinel_tokens=generate_sentinel_tokens(num=20),
        show_progress=False,
    )


def toolchain_info(jax):
    """Identify the toolchain a bench artifact was measured on: round 4's
    mid-round toolchain change silently inverted the fused-vs-XLA decode
    result; numbers are only comparable across rounds WITH this field."""
    import datetime

    info = {"jax": jax.__version__, "date": datetime.date.today().isoformat()}
    try:
        import jaxlib

        info["jaxlib"] = jaxlib.__version__
    except Exception:
        pass
    try:
        from importlib.metadata import version

        info["libtpu"] = version("libtpu")
    except Exception:
        pass
    info["backend"] = jax.default_backend()
    info["device"] = jax.devices()[0].device_kind
    return info


def bench_generation(jax, jnp, tok, model_name: str, batch: int, targets, label: str,
                     conds=("rgb@224",), fused_decode: bool = False,
                     decode_attn: str = "xla"):
    from fourm_tpu.api import FourMSampler
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.ops.transformer import use_pallas_attention
    from fourm_tpu.utils.synthetic import (
        MOD21_DECODER_MODALITIES,
        MOD21_MODALITIES,
        synthetic_mod_batch,
    )

    enc_mods = tuple(MOD21_MODALITIES) + tuple(
        t for t in targets if t not in MOD21_MODALITIES)
    dec_mods = tuple(MOD21_DECODER_MODALITIES) + tuple(
        t for t in targets if t not in MOD21_DECODER_MODALITIES)
    cfg = create_fourm_config(
        model_name,
        encoder_modalities=enc_mods,
        decoder_modalities=dec_mods,
        dtype="bfloat16",
    )
    model = FourM(cfg)
    init_batch = jax.tree.map(
        jnp.asarray, synthetic_mod_batch(enc_mods, 1, 64, 64, seed=0)
    )
    if not os.environ.get("BENCH_FP32_PARAMS"):
        # serving-mode weights (default since r3): bf16 params halve the
        # weight streaming that the AR token loop pays EVERY token (traced
        # ~700us/token of fp32 param copies at 4M-B B=16); init directly to
        # bf16 inside one jit so the fp32 master copy never materializes
        # (XL fp32 params alone are 11GB — over a v5e-1 chip's HBM)
        def _init_bf16(r):
            p = model.init(r, init_batch, 64, 64)
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p)

        params = jax.jit(_init_bf16)(jax.random.key(0))
    else:
        params = model.init(jax.random.key(0), init_batch, 64, 64)
    sampler = FourMSampler(fm=(model, params), text_tokenizer=tok)

    rng = np.random.RandomState(0)
    sample = {}
    for c in conds:
        from fourm_tpu.data.modality_info import MODALITY_INFO

        spec = MODALITY_INFO[c]
        if spec.type == "img" and spec.encoder_embedding == "image":
            sample[c] = rng.rand(batch, spec.input_size, spec.input_size, 3).astype(np.float32)
        else:
            sample[c] = rng.randint(0, spec.vocab_size,
                                    (batch, spec.resolved_max_tokens())).astype(np.int32)
    mod_dict = sampler.prepare_sample(sample, list(conds), targets, batch_size=batch)
    schedule = sampler.build_schedule(list(conds), targets)
    # stage conditioning on-device once: the metric is generation throughput,
    # and through the axon tunnel each of the ~84 host->device array uploads
    # costs a round trip (~0.4 s/batch of pure transfer latency otherwise)
    mod_dict = jax.tree.map(jnp.asarray, mod_dict)

    from fourm_tpu.ops.transformer import use_decode_attn, use_fused_decode

    def run(seed):
        with use_pallas_attention(), use_fused_decode(fused_decode), \
                use_decode_attn(decode_attn):
            out = sampler.generate(dict(mod_dict), schedule, seed=seed)
        for t in targets:  # fence with host fetches (axon tunnel quirk)
            _ = np.asarray(out[t]["tensor"][0, :1])
        return out

    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        run(1 + i)
    dt = time.perf_counter() - t0
    sps = batch * iters / dt / len(jax.devices())
    print(f"# {label}: compile {compile_s:.0f}s, steady {dt / iters:.2f}s "
          f"per {batch}-image batch -> {sps:.3f} samples/s/chip")
    return sps


def bench_vq_tokenize(jax, jnp):
    """Batch VQ tokenization images/sec @224 (BASELINE metric 2) + roofline."""
    from fourm_tpu.vq import VQ

    B = 64
    model = VQ(image_size=224, patch_size=16, enc_type="vit_b_enc",
               codebook_size=16384, latent_dim=32, nearest_impl="pallas",
               dtype="bfloat16")
    x0 = jnp.zeros((B, 224, 224, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)},
                           x0[:1])
    from fourm_tpu.ops.transformer import use_pallas_attention

    with use_pallas_attention():
        tokenize = jax.jit(lambda v, x: model.apply(v, x, method="tokenize"))
        x = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224, 3).astype(np.float32))
        _ = np.asarray(tokenize(variables, x))  # compile + fence
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = tokenize(variables, x)
        _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    ips = B / dt

    # Roofline. Terms (v5e: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM):
    #   encoder matmuls  2*86e6 params * 196 tok * B FLOP at peak MXU
    #   encoder attention 4*B*H*N^2*Dh FLOP (small but real)
    #   EXACT codebook search: parity with the fp32 reference requires
    #     Precision.HIGHEST = 6 bf16 MXU passes, and a D=32 contraction runs
    #     the 128-deep MXU at 32/128 of peak -> 6 * 2*(196B)*16384*32 FLOP
    #     at 197e12*(32/128) FLOP/s. This is a COMPUTE bound (~1.6 ms/batch-64)
    #     that the pure-HBM estimate of rounds 1-2 ignored; that old
    #     HBM-only fraction is still reported for comparability.
    #   input image read (B*224*224*3 fp32) from HBM
    enc_flops = 2 * 86e6 * 196 * B
    attn_flops = 4 * B * 12 * 196 * 196 * 64
    t_enc_sol = (enc_flops + attn_flops) / 197e12
    search_flops = 6 * 2 * (B * 196) * 16384 * 32
    t_search_sol = search_flops / (197e12 * 32 / 128)
    t_read_sol = (B * 224 * 224 * 3 * 4 + (B * 196 * 32 + 16384 * 32) * 4) / 819e9
    sol_ips = B / (t_enc_sol + t_search_sol + t_read_sol)
    hbm_only_ips = B / (enc_flops / 197e12 + (B * 196 * 32 + 16384 * 32) * 4 / 819e9)
    print(f"# vq tokenize: {ips:.0f} img/s ({dt*1e3:.2f} ms/batch-{B}); "
          f"speed-of-light ~{sol_ips:.0f} img/s (exact-search compute bound "
          f"included; old HBM-only estimate ~{hbm_only_ips:.0f})")
    return ips, ips / sol_ips, ips / hbm_only_ips


def bench_train_step(jax, jnp):
    """4M-B mod-7 train step samples/sec/chip + MFU (reproduces the round-1
    ROUND_NOTES claim in a committed artifact)."""
    import optax

    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.parallel import build_train_step, init_train_state
    from fourm_tpu.utils.optim import cosine_schedule, create_optimizer
    from fourm_tpu.utils.synthetic import (
        MOD7_DECODER_MODALITIES,
        MOD7_MODALITIES,
        synthetic_mod_batch,
    )

    B = 32
    cfg = create_fourm_config(
        "fm_base_12e_12d_swiglu_nobias",
        encoder_modalities=MOD7_MODALITIES,
        decoder_modalities=MOD7_DECODER_MODALITIES,
        dtype="bfloat16",
    )
    model = FourM(cfg)
    batch = jax.tree.map(jnp.asarray,
                         synthetic_mod_batch(MOD7_MODALITIES, B, 128, 128, seed=0))
    example = jax.tree.map(lambda x: x[:1], batch)
    shapes = jax.eval_shape(lambda r: model.init(r, example, 128, 128), jax.random.key(0))
    tx = create_optimizer(shapes, cosine_schedule(1e-4, 1000, 10))
    state, _ = init_train_state(model, tx, example, 128, 128, jax.random.key(0))
    # donate=True + state chaining matches a real training loop (measured
    # equal to donate=False on this chip, but donation is the honest setup).
    step = build_train_step(model, tx, 128, 128, donate=True)
    rng = jax.random.key(1)
    state, metrics = step(state, batch, rng)
    _ = float(metrics["loss"])  # compile + fence
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    sps = B / dt / len(jax.devices())

    # MFU: fwd+bwd ~ 6 * params_active * tokens. Encoder sees 128, decoder 128
    # (self) + cross into 128. Use 6*N*T with N=198e6 trunk+emb active params,
    # T=256 tokens/sample as the standard coarse estimate (kept for
    # round-over-round continuity).
    flops_per_sample = 6 * 198e6 * 256
    mfu = flops_per_sample * B / dt / 197e12
    # Honest HW utilization: XLA's own cost analysis counts 221.8 GFLOP/sample
    # for this step (measured via jitted.lower().compile().cost_analysis();
    # the 6ND convention overcounts because the decoder's cross-attention and
    # per-modality CE heads don't follow 6ND) — emit both.
    hw_util = 221.8e9 * B / dt / 197e12
    print(f"# train step: {sps:.0f} samples/s/chip ({dt*1e3:.1f} ms/step B={B}), "
          f"MFU~{mfu:.2f} (6ND convention), HW util ~{hw_util:.2f} (XLA-counted)")
    return sps, mfu, hw_util


def bench_decode_microbench(jax, jnp):
    """In-jit AR decode loop cost per token at late-chain shapes (B=16,
    budget 2304, 12 layers) for the fused bf16 path and the opt-in int8
    cross-KV path. Two numbers the chain benchmarks can't separate: the
    decode loop IS ~2/3 of the 6 AR targets' cost, and int8 halves its
    dominant HBM read (kernels/decode_step.py)."""
    import time

    import numpy as np

    from fourm_tpu.kernels.decode_step import quantize_kv_decode
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.ops.transformer import use_pallas_attention
    from fourm_tpu.utils.synthetic import (
        MOD21_DECODER_MODALITIES,
        MOD21_MODALITIES,
        synthetic_mod_batch,
    )

    B, L, M = 16, 256, 2304
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
    nsteps = 64

    from fourm_tpu.ops.transformer import use_decode_attn, use_fused_decode

    with use_pallas_attention():
        prefill = jax.jit(lambda p, md: model.apply(
            p, md, target, L, M, method="ar_prefill"))
        cross_kvs, enc_mask, y_emb = prefill(params, batch)
    tok0 = jnp.asarray(np.full((B, 1), 7, np.int32))

    def make_loop():
        # fresh jit per mode: the fused-decode switch is trace-time global,
        # so a cached trace must never be reused across modes
        @jax.jit
        def loop(variables, tok, caches, ckvs, emask, yemb):
            def body(i, carry):
                tok, caches = carry
                y_t = model.apply(variables, target, tok, method="embed_target_token")
                y_t = y_t + jax.lax.dynamic_slice_in_dim(yemb, i, 1, axis=1)
                y, caches = model.apply(variables, y_t, caches, ckvs, emask, i,
                                        method="decode_one_token")
                logits = model.apply(variables, target, y, method="mod_logits")[:, 0]
                return jnp.argmax(logits, -1).astype(jnp.int32)[:, None], caches
            return jax.lax.fori_loop(0, nsteps, body, (tok, caches))
        return loop

    def measure(ckvs, fused, decode_attn="xla"):
        with use_pallas_attention(), use_fused_decode(fused), \
                use_decode_attn(decode_attn):
            loop = make_loop()
            caches = jax.jit(lambda: model.apply(params, B, L,
                                                 method="init_kv_caches"))()
            t, c = loop(params, tok0, caches, ckvs, enc_mask, y_emb)
            float(jnp.sum(t))  # fence (tunnel-safe)
            best = None
            for _ in range(3):  # min-of-3: the tunnel adds ~10% run noise,
                # and this timing picks the headline decode path
                caches = jax.jit(lambda: model.apply(params, B, L,
                                                     method="init_kv_caches"))()
                t0 = time.perf_counter()
                t, c = loop(params, tok0, caches, ckvs, enc_mask, y_emb)
                float(jnp.sum(t))
                ms = (time.perf_counter() - t0) / nsteps * 1e3
                best = ms if best is None else min(best, ms)
            return best

    ms_bf16 = measure(cross_kvs, fused=False, decode_attn="xla")  # pure XLA
    # XLA step shape with decode_attention on the MXU (pallas_decode_attention)
    ms_mxu = measure(cross_kvs, fused=False, decode_attn="mxu")
    ms_fused = measure(cross_kvs, fused=True)  # fully-fused step kernels
    # fused self+MLP kernels, XLA cross-attention (the round-5 ablation split:
    # cross is at the HBM floor in XLA; self/MLP carry the recoverable slack)
    ms_hybrid = measure(cross_kvs, fused="hybrid")

    def _q(kv):
        k_i8, ks, v_i8, vs = quantize_kv_decode(*kv)
        return ((k_i8, ks), (v_i8, vs))

    ms_int8 = measure([_q(kv) for kv in cross_kvs], fused=True)
    print(f"# ar decode: {ms_bf16:.3f} ms/token xla, {ms_mxu:.3f} mxu-attn, "
          f"{ms_fused:.3f} fused, {ms_hybrid:.3f} hybrid, "
          f"{ms_int8:.3f} fused-int8-KV (B={B}, M={M}, 12 layers)")
    return ms_bf16, ms_mxu, ms_fused, ms_hybrid, ms_int8


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from fourm_tpu.api import DEFAULT_ORDER, DEFAULT_ORDER_SR

    tok = build_text_tokenizer()
    extras = {"toolchain": toolchain_info(jax)}

    # Decode-path selection FIRST: measure both AR decode implementations and
    # give the headline chain the faster one. A toolchain update must never
    # again silently strand the default on the slow path (round 4: the
    # mid-round toolchain change inverted fused-vs-XLA and the headline kept
    # running the loser). Keys: ar_decode_ms_per_token_{xla,fused,int8kv} are
    # the per-path measurements; ar_decode_ms_per_token = the selected
    # winner, i.e. what the headline chain actually runs (since round 5 —
    # in round 4 this key meant the XLA path, in rounds <=3 the fused path).
    fused_decode = False
    decode_attn = "xla"
    try:
        ms_xla, ms_mxu, ms_fused, ms_hybrid, ms_int8 = \
            bench_decode_microbench(jax, jnp)
        extras["ar_decode_ms_per_token_xla"] = round(ms_xla, 3)
        extras["ar_decode_ms_per_token_mxu"] = round(ms_mxu, 3)
        extras["ar_decode_ms_per_token_fused"] = round(ms_fused, 3)
        extras["ar_decode_ms_per_token_hybrid"] = round(ms_hybrid, 3)
        extras["ar_decode_ms_per_token_int8kv"] = round(ms_int8, 3)
        winner = min(("xla", ms_xla), ("mxu", ms_mxu), ("fused", ms_fused),
                     ("hybrid", ms_hybrid), key=lambda kv: kv[1])
        fused_decode = {"fused": True, "hybrid": "hybrid"}.get(winner[0], False)
        decode_attn = "mxu" if winner[0] == "mxu" else "xla"
        extras["ar_decode_ms_per_token"] = round(winner[1], 3)
        extras["headline_decode_path"] = winner[0]
    except Exception as e:  # pragma: no cover
        print(f"# decode microbench failed: {e}")
        extras["headline_decode_path"] = "xla"

    # headline: FULL RGB-to-all chain at 4M-21 B — all 14 non-RGB targets of
    # the Demo4MSampler default order (tok_rgb is the conditioning here).
    # Throughput metric: generation is AR-latency bound, so a larger batch
    # amortizes per-token latency (BENCH_BS overrides; default 16/chip).
    batch = int(os.environ.get("BENCH_BS", 16))
    targets = [t for t in DEFAULT_ORDER if t != "tok_rgb@224"]
    sps = bench_generation(jax, jnp, tok, "fm_base_12e_12d_swiglu_qknorm_nobias",
                           batch=batch, targets=targets,
                           label=f"4M-21 B full 14-target chain (B={batch})",
                           fused_decode=fused_decode, decode_attn=decode_attn)

    try:
        ips, roofline, roofline_hbm = bench_vq_tokenize(jax, jnp)
        extras["vq_tokenize_images_per_sec"] = round(ips, 1)
        extras["vq_tokenize_roofline_frac"] = round(roofline, 3)
        # rounds 1-2 reported the fraction of a pure-HBM estimate that ignored
        # the exact fp32 search's MXU compute bound; kept for comparability
        extras["vq_tokenize_roofline_frac_hbm_only_est"] = round(roofline_hbm, 3)
    except Exception as e:  # pragma: no cover
        print(f"# vq tokenize bench failed: {e}")
    try:
        tsps, mfu, hw_util = bench_train_step(jax, jnp)
        extras["train_step_samples_per_sec"] = round(tsps, 1)
        extras["train_mfu"] = round(mfu, 3)
        extras["train_hw_util_xla_counted"] = round(hw_util, 3)
    except Exception as e:  # pragma: no cover
        print(f"# train bench failed: {e}")

    # XL is part of the named BASELINE metric ("4M-21 B/XL") — in the default
    # run since round 3; the persistent compile cache absorbs the cost after
    # the first run. BENCH_SKIP_XL=1 opts out for quick iterations.
    if not os.environ.get("BENCH_SKIP_XL"):
        try:
            xl = bench_generation(jax, jnp, tok, "fm_xlarge_24e_24d_swiglu_qknorm_nobias",
                                  batch=4, targets=["tok_clip@224", "tok_semseg@224", "caption"],
                                  label="4M-21 XL 3-target chain",
                                  fused_decode=fused_decode, decode_attn=decode_attn)
            extras["xl_chain_samples_per_sec"] = round(xl, 3)
            # the BASELINE north star is the XL ratio: measured v5e XL chain vs
            # the analytical reference-on-A100 estimate of the SAME chain
            # (scripts/estimate_reference_a100.py XL geometry; BASELINE.md)
            try:
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "scripts"))
                from estimate_reference_a100 import reference_a100_xl_samples_per_sec

                xref = reference_a100_xl_samples_per_sec()
                extras["xl_ref_a100_samples_per_sec_est"] = round(xref["eager"], 3)
                extras["xl_vs_baseline"] = round(xl / xref["eager"], 3)
                extras["xl_vs_baseline_peak_bound"] = round(xl / xref["peak"], 3)
            except Exception as e:  # pragma: no cover
                print(f"# XL vs_baseline estimate failed: {e}")
        except Exception as e:
            print(f"# XL bench failed: {e}")
    # the LITERAL north-star workload: 4M-XL over the FULL 14-target chain
    # (BASELINE names "RGB-to-all (4M-21 B/XL)"; rounds <=4 only measured a
    # 3-target XL subset). BENCH_SKIP_XL_FULL=1 opts out.
    if not (os.environ.get("BENCH_SKIP_XL") or os.environ.get("BENCH_SKIP_XL_FULL")):
        try:
            xlf = bench_generation(jax, jnp, tok,
                                   "fm_xlarge_24e_24d_swiglu_qknorm_nobias",
                                   batch=4, targets=targets,
                                   label="4M-21 XL FULL 14-target chain",
                                   fused_decode=fused_decode, decode_attn=decode_attn)
            extras["xl_full_chain_samples_per_sec"] = round(xlf, 3)
            try:
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "scripts"))
                from estimate_reference_a100 import (
                    reference_a100_xl_full_samples_per_sec,
                )

                xfr = reference_a100_xl_full_samples_per_sec()
                extras["xl_full_ref_a100_samples_per_sec_est"] = round(xfr["eager"], 3)
                extras["xl_full_vs_baseline"] = round(xlf / xfr["eager"], 3)
                extras["xl_full_vs_baseline_peak_bound"] = round(xlf / xfr["peak"], 3)
            except Exception as e:  # pragma: no cover
                print(f"# XL-full vs_baseline estimate failed: {e}")
        except Exception as e:
            print(f"# XL full-chain bench failed: {e}")
    # SR 448 (784-token modalities) is the one sequence-length regime the
    # headline chain never touches — in the default driver run since round 4
    # (persistent compile cache absorbs the cost). BENCH_SKIP_SR=1 opts out.
    if not os.environ.get("BENCH_SKIP_SR"):
        try:
            sr = bench_generation(jax, jnp, tok, "fm_large_24e_24d_swiglu_nobias",
                                  batch=4, targets=list(DEFAULT_ORDER_SR),
                                  label="SR 448 chain (L)",
                                  conds=("rgb@224", "tok_rgb@224"),
                                  fused_decode=fused_decode, decode_attn=decode_attn)
            extras["sr448_samples_per_sec"] = round(sr, 3)
            try:
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "scripts"))
                from estimate_reference_a100 import (
                    reference_a100_sr_samples_per_sec,
                )

                sref = reference_a100_sr_samples_per_sec()
                extras["sr448_ref_a100_samples_per_sec_est"] = round(sref["eager"], 3)
                extras["sr448_vs_baseline"] = round(sr / sref["eager"], 3)
                extras["sr448_vs_baseline_peak_bound"] = round(sr / sref["peak"], 3)
            except Exception as e:  # pragma: no cover
                print(f"# SR vs_baseline estimate failed: {e}")
        except Exception as e:
            print(f"# SR bench failed: {e}")

    # vs_baseline: analytical estimate of the REFERENCE pipeline on one A100
    # for the same chain/batch (no A100 exists here; derivation in BASELINE.md
    # and scripts/estimate_reference_a100.py — auditable FLOP accounting of
    # the reference's no-KV-cache / sequential-CFG / re-encode-per-step paths).
    # vs_baseline uses the realistic "eager" scenario; _peak_bound divides by
    # the unattainable 100%-MFU zero-overhead bound (hard floor on the ratio).
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from estimate_reference_a100 import reference_a100_samples_per_sec

        ref = reference_a100_samples_per_sec()
        extras["ref_a100_samples_per_sec_est"] = round(ref["eager"], 3)
        extras["vs_baseline_peak_bound"] = round(sps / ref["peak"], 3)
        vs_baseline = round(sps / ref["eager"], 3)
    except Exception as e:  # pragma: no cover
        print(f"# vs_baseline estimate failed: {e}")
        vs_baseline = None

    print(json.dumps({
        "metric": "RGB-to-all chained generation samples/sec/chip (4M-21 B, FULL "
                  "14-target Demo4MSampler chain, ROAR+KV-cached AR, Pallas "
                  "attention, bf16, worst-case EOS)",
        "value": round(sps, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": vs_baseline,
        **extras,
    }))


if __name__ == "__main__":
    main()
