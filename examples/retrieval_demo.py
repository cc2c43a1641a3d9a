#!/usr/bin/env python
"""Any-to-any retrieval demo — the fourm_tpu equivalent of the reference
notebooks/retrieval_4M-21.ipynb.

4M-21 retrieval works by predicting the DINOv2 GLOBAL embedding tokens
(`tok_dinov2_global`) from any conditioning modality, decoding them to an
embedding vector with the global tokenizer, and ranking a gallery by cosine
similarity. Everything below runs offline on tiny random-init models — swap in
released checkpoints (load_fourm_safetensors / get_image_tokenizer) for real
retrieval quality.

Run: python examples/retrieval_demo.py   (~2 min on CPU)
"""

import numpy as np


def main():
    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fourm_tpu.api import FourMSampler
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.utils.synthetic import synthetic_mod_batch
    from fourm_tpu.vq import VQVAE

    # 1) a 4M model that maps RGB -> global-embedding tokens
    mods = ("rgb@224", "tok_dinov2_global")
    cfg = create_fourm_config(
        "fm_tiny_6e_6d_gelu", encoder_modalities=mods,
        decoder_modalities=("tok_dinov2_global",),
        dim=128, encoder_depth=2, decoder_depth=2, num_heads=4,
    )
    model = FourM(cfg)
    batch = jax.tree.map(jnp.asarray, synthetic_mod_batch(mods, 1, 32, 32, seed=0))
    params = model.init(jax.random.key(0), batch, 32, 32)
    sampler = FourMSampler(fm=(model, params))

    # 2) the global-embedding tokenizer (BottleneckMLP in the release; a tiny
    #    VQVAE stands in here) decodes the 16 predicted tokens to an embedding
    tok_model = VQVAE(image_size=4, patch_size=1, enc_type="BottleneckMLP/B_1-Wi_64",
                      dec_type="BottleneckMLP/B_1-Wi_64", codebook_size=8192,
                      latent_dim=8, n_channels=32, patch_proj=False)
    tok_vars = tok_model.init(
        {"params": jax.random.key(1), "rng": jax.random.key(2)},
        jnp.zeros((1, 4, 4, 32)))

    def embed_image(rgb: np.ndarray, seed: int) -> np.ndarray:
        md = sampler.prepare_sample({"rgb@224": rgb[None]}, ["rgb@224"],
                                    ["tok_dinov2_global"], batch_size=1)
        sched = sampler.build_schedule(["rgb@224"], ["tok_dinov2_global"])
        out = sampler.generate(md, sched, seed=seed)
        toks = np.asarray(out["tok_dinov2_global"]["tensor"]).reshape(1, 4, 4)
        emb = np.asarray(tok_model.apply(tok_vars, jnp.asarray(toks),
                                         method="decode_tokens"))
        return emb.reshape(-1)

    # 3) gallery + query, ranked by cosine similarity
    rng = np.random.RandomState(0)
    gallery = [rng.rand(224, 224, 3).astype(np.float32) for _ in range(4)]
    query = gallery[2] + 0.01 * rng.rand(224, 224, 3).astype(np.float32)

    g_embs = np.stack([embed_image(g, seed=7) for g in gallery])  # same seed =
    q_emb = embed_image(query, seed=7)  # deterministic embedding per image

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    sims = [cos(q_emb, g) for g in g_embs]
    ranking = np.argsort(sims)[::-1]
    print("cosine similarities:", [round(s, 4) for s in sims])
    print("retrieval ranking (gallery indices, best first):", ranking.tolist())
    print("NOTE: random-init models — load released 4M-21 + tokenizer weights "
          "for meaningful retrieval.")


if __name__ == "__main__":
    main()
