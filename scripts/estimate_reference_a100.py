"""Analytical A100 throughput estimate for the REFERENCE 4M pipeline.

BASELINE.json demands a `vs_baseline` comparison, but the reference repo
publishes no throughput numbers (SURVEY.md §6) and this environment has no
A100. This script derives an auditable estimate of the reference pipeline's
samples/sec on one A100 for the exact workloads our bench measures:
  * headline: FULL 14-target RGB-to-all Demo4MSampler chain, 4M-B, B=16/GPU
  * north star: 3-target chain (tok_clip, tok_semseg, caption), 4M-XL, B=4/GPU
    (BASELINE.json names the XL RGB-to-all ratio as the target metric)

Reference code properties modeled (all cited, SURVEY.md §3.2):
  * AR sequence decoding re-runs the FULL decoder over the growing target
    sequence for EVERY generated token — no KV cache
    (reference fourm/models/generate.py:889-918);
  * classifier-free guidance runs TWO sequential forwards per ROAR step
    (generate.py:684) — same FLOPs as our batch-doubling, so counted once
    per branch either way;
  * every step re-embeds and re-encodes all currently-valid conditioning
    tokens (generate.py:628-765); the reference's dynamic gather keeps only
    valid tokens, so conditioning token counts equal ours (no compaction
    advantage is assumed for us in this model);
  * chain structure from fourm/demo_4M_sampler.py:42-136 — ROAR image
    targets x 1 step (cfg 2.0) + autoregressive sequence targets (cfg 1.0).

Three scenarios, most to least favorable to the reference:
  peak     — 100% MFU at 312 TFLOP/s bf16 (A100 SXM peak), ZERO launch
             overhead, ZERO Python overhead. Physically unattainable for a
             Python token loop with dynamic shapes; treat as the reference's
             speed-of-light. vs_baseline computed against THIS bound is a
             hard lower bound on the true ratio.
  mfu35    — 35% MFU, still zero per-launch overhead. 35% is generous for
             eager PyTorch inference at these small shapes, and MORE generous
             for XL single-token decode (dim 2048, B=4 rows: memory-bound,
             real MFU is single-digit %) — so the XL estimate flatters the
             reference further.
  eager    — 35% MFU + 1 ms per Python-loop iteration (CUDA launch trains of
             a depth-12/24 decoder ≈ 150-300 kernels plus per-token
             embedding/mask rebuilds in eager torch; 1 ms/token is
             charitable — eager measurements of comparable loops run
             3-10 ms/token).

The bench JSON reports vs_baseline (headline vs `eager`), vs_baseline_peak_bound
(headline vs `peak`), and xl_vs_baseline (XL chain vs the XL `eager` estimate).

Run directly for the full audit table: python scripts/estimate_reference_a100.py
"""

from __future__ import annotations

from dataclasses import dataclass

A100_BF16_PEAK = 312e12  # dense bf16/fp16 TFLOP/s, A100 SXM


@dataclass
class Geometry:
    """Matmul-weight geometry of one 4M size (reference fm.py:839-1130
    registry, swiglu flavors; norms/biases negligible)."""

    dim: int
    enc_depth: int
    dec_depth: int

    @property
    def enc_params(self) -> float:
        d = self.dim
        hidden = int(2 * (4 * d) / 3)  # SwiGLU parameter-count compensation
        block = d * 3 * d + d * d + 3 * d * hidden  # qkv + proj + swiglu w1/w2/w3
        return self.enc_depth * block

    @property
    def dec_params(self) -> float:
        d = self.dim
        hidden = int(2 * (4 * d) / 3)
        block = (d * 3 * d + d * d + 3 * d * hidden
                 + d * d + d * 2 * d + d * d)  # + cross q/kv/proj
        return self.dec_depth * block


GEOM_B = Geometry(dim=768, enc_depth=12, dec_depth=12)    # 4M-B (198M)
GEOM_L = Geometry(dim=1024, enc_depth=24, dec_depth=24)   # 4M-L (705M)
GEOM_XL = Geometry(dim=2048, enc_depth=24, dec_depth=24)  # 4M-XL (2.8B)

# ---- chain structures (fourm/demo_4M_sampler.py:29-136) ----
# (modality, target_tokens, scheme, cfg_scale, vocab)
CHAIN_B = [
    ("tok_clip@224", 196, "roar", 2.0, 8192),
    ("tok_dinov2@224", 256, "roar", 2.0, 8192),
    ("tok_imagebind@224", 256, "roar", 2.0, 8192),
    ("tok_depth@224", 196, "roar", 2.0, 8192),
    ("tok_normal@224", 196, "roar", 2.0, 8192),
    ("tok_semseg@224", 196, "roar", 2.0, 4096),
    ("tok_canny_edge@224", 196, "roar", 2.0, 8192),
    ("tok_sam_edge@224", 196, "roar", 2.0, 8192),
    ("caption", 256, "ar", 1.0, 30522),
    ("det", 256, "ar", 1.0, 30522),
    ("human_poses", 275, "ar", 1.0, 30522),
    ("sam_instance", 256, "ar", 1.0, 30522),
    ("color_palette", 23, "ar", 1.0, 30522),
    ("metadata", 40, "ar", 1.0, 30522),
]
# the XL driver-bench chain (bench.py): clip + semseg ROAR, caption AR
CHAIN_XL = [
    ("tok_clip@224", 196, "roar", 2.0, 8192),
    ("tok_semseg@224", 196, "roar", 2.0, 4096),
    ("caption", 256, "ar", 1.0, 30522),
]
# 448px super-resolution chain (reference demo_4M_sampler.py:29-39 SR
# defaults, fourm/data/modality_info.py:311-383 784-token @448 modalities):
# 4M-L SR model, MaskGIT x 8 steps, cfg 2.0 per target. Each MaskGIT step
# runs encoder over all valid conditioning + decoder over the FULL 784-token
# grid (the reference feeds the whole masked target and selects from
# full-grid logits; ours decodes the full grid identically).
CHAIN_SR = [
    ("tok_clip@448", 784, "maskgit8", 2.0, 8192),
    ("tok_depth@448", 784, "maskgit8", 2.0, 8192),
    ("tok_normal@448", 784, "maskgit8", 2.0, 8192),
    ("tok_semseg@448", 784, "maskgit8", 2.0, 4096),
    ("tok_rgb@448", 784, "maskgit8", 2.0, 16384),
]
RGB_COND_TOKENS = 196  # tok_rgb@224 conditioning
# SR conditioning: rgb@224 pixel patches (196) + tok_rgb@224 (196), matching
# bench.py's conds=("rgb@224", "tok_rgb@224")
SR_COND_TOKENS = 392
MASKGIT_STEPS = 8


@dataclass
class Estimate:
    flops_per_sample: float
    ar_tokens: int
    launches: int  # Python-level device round trips (shared across the batch)

    def samples_per_sec(self, mfu: float, launch_overhead_s: float,
                        batch: int) -> float:
        t_compute = self.flops_per_sample / (A100_BF16_PEAK * mfu)
        # launch overhead amortizes over the batch (one loop drives all B rows)
        t_launch = self.launches * launch_overhead_s / batch
        return 1.0 / (t_compute + t_launch)


def reference_chain_flops(geom: Geometry, chain,
                          cond_tokens: int = RGB_COND_TOKENS) -> Estimate:
    """FLOPs per SAMPLE for the reference pipeline on the given chain."""
    flops = 0.0
    launches = 0
    cond = cond_tokens  # valid conditioning tokens so far
    ar_tokens = 0
    for _mod, L, scheme, cfg, vocab in chain:
        n_fwd = 2 if cfg != 1.0 else 1  # sequential CFG (generate.py:684)
        if scheme == "maskgit8":
            # MaskGIT x 8: every step re-encodes conditioning and decodes the
            # full L-token grid (+ logits head over the grid)
            flops += MASKGIT_STEPS * n_fwd * (
                2 * geom.enc_params * cond + 2 * geom.dec_params * L
                + 2 * L * geom.dim * vocab)
            launches += MASKGIT_STEPS * n_fwd
        elif scheme == "roar":
            # one step decodes the whole grid: encoder over cond + decoder
            # over L masked queries (+ logits head)
            flops += n_fwd * (2 * geom.enc_params * cond + 2 * geom.dec_params * L
                              + 2 * L * geom.dim * vocab)
            launches += n_fwd
        else:
            # encoder once per target; then per token t: FULL decoder re-run
            # over t positions, growing causal mask, no KV cache
            # (generate.py:889-918). Logits head on the last position only.
            flops += n_fwd * 2 * geom.enc_params * cond
            flops += n_fwd * (2 * geom.dec_params * (L * (L + 1) / 2)
                              + 2 * L * geom.dim * vocab)
            launches += n_fwd * (L + 1)
            ar_tokens += L
        cond += L  # decoded target becomes conditioning for later steps
    return Estimate(flops, ar_tokens, launches)


def _scenarios(est: Estimate, batch: int) -> dict:
    return {
        "flops_per_sample_T": est.flops_per_sample / 1e12,
        "ar_tokens": est.ar_tokens,
        "launches_per_sample_chain": est.launches,
        "peak": est.samples_per_sec(mfu=1.0, launch_overhead_s=0.0, batch=batch),
        "mfu35": est.samples_per_sec(mfu=0.35, launch_overhead_s=0.0, batch=batch),
        "eager": est.samples_per_sec(mfu=0.35, launch_overhead_s=1e-3, batch=batch),
    }


def reference_a100_samples_per_sec() -> dict:
    """Headline workload: 4M-B, 14-target chain, B=16/GPU."""
    return _scenarios(reference_chain_flops(GEOM_B, CHAIN_B), batch=16)


def reference_a100_xl_samples_per_sec() -> dict:
    """North-star workload: 4M-XL, 3-target chain, B=4/GPU (matches bench.py)."""
    return _scenarios(reference_chain_flops(GEOM_XL, CHAIN_XL), batch=4)


def reference_a100_xl_full_samples_per_sec() -> dict:
    """The literal north-star workload: 4M-XL over the FULL 14-target chain,
    B=4/GPU (matches bench.py's xl_full chain)."""
    return _scenarios(reference_chain_flops(GEOM_XL, CHAIN_B), batch=4)


def reference_a100_sr_samples_per_sec() -> dict:
    """SR workload: 4M-L SR model, 5-target 448px MaskGIT-8 chain, B=4/GPU
    (matches bench.py's SR chain; reference demo_4M_sampler.py:29-39)."""
    return _scenarios(reference_chain_flops(GEOM_L, CHAIN_SR,
                                            cond_tokens=SR_COND_TOKENS),
                      batch=4)


def _print_table(name, geom, chain, batch, r):
    print(f"{name} ({len(chain)}-target chain, B={batch}), per sample:")
    print(f"  model: enc {geom.enc_params/1e6:.1f}M dec {geom.dec_params/1e6:.1f}M matmul params")
    print(f"  FLOPs/sample: {r['flops_per_sample_T']:.2f} TFLOP "
          f"(AR tokens: {r['ar_tokens']})")
    print(f"  device round trips per chain (batch-shared): {r['launches_per_sample_chain']}")
    print(f"  peak   (100% MFU, zero overhead — unattainable bound): {r['peak']:.3f}")
    print(f"  mfu35  (35% MFU, zero overhead):                        {r['mfu35']:.3f}")
    print(f"  eager  (35% MFU + 1 ms/Python-loop iteration):          {r['eager']:.3f}")


if __name__ == "__main__":
    _print_table("Reference 4M-B headline", GEOM_B, CHAIN_B, 16,
                 reference_a100_samples_per_sec())
    print()
    _print_table("Reference 4M-XL north star", GEOM_XL, CHAIN_XL, 4,
                 reference_a100_xl_samples_per_sec())
    print()
    _print_table("Reference 4M-XL FULL 14-target", GEOM_XL, CHAIN_B, 4,
                 reference_a100_xl_full_samples_per_sec())
    print()
    _print_table("Reference 4M-L SR-448 MaskGIT-8", GEOM_L, CHAIN_SR, 4,
                 reference_a100_sr_samples_per_sec())
