"""VQControlNet tests (VERDICT round 1, item 5): forward, one train step with
the frozen-base trainable mask, diffusion decode, from-unet init, and the
safetensors torch-name round-trip mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourm_tpu.vq import (
    AutoencoderKL,
    VQControlNet,
    controlnet_decode_tokens,
    controlnet_params_from_unet,
    vqcontrolnet_trainable_mask,
)

TINY = dict(
    image_size=32, patch_size=4, enc_type="vit_t_enc", codebook_size=64,
    latent_dim=8, model_channels=32, channel_mult=(1, 2), attention_levels=(1,),
    num_heads=2, context_len=4, context_dim=16, vae_base_channels=32,
    vae_ch_mult=(1, 2),
)


@pytest.fixture(scope="module")
def tiny_cn():
    model = VQControlNet(cls_free_guidance_dropout=0.2, masked_cfg=True, **TINY)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    zlat = jnp.zeros((2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    rngs = {"params": jax.random.key(0), "rng": jax.random.key(1)}
    variables = model.init(rngs, x, zlat, t, method="init_all")
    return model, variables, x


def test_forward_shapes_and_latent_space(tiny_cn):
    model, variables, x = tiny_cn
    z = model.apply(variables, x, jax.random.key(2), method="vae_encode")
    assert z.shape == (2, 16, 16, 4)  # 2x VAE downscale of 32px
    t = jnp.full((2,), 10, jnp.int32)
    pred, code_loss = model.apply(variables, x, z, t, train=False)
    assert pred.shape == z.shape
    assert np.isfinite(np.asarray(pred)).all()


def test_train_step_only_controlnet_moves(tiny_cn):
    import optax

    model, variables, x = tiny_cn
    params = {"params": variables["params"]}
    codebook = {"codebook": variables["codebook"]}
    trainable = vqcontrolnet_trainable_mask(params)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    sched = model.noise_scheduler()

    z = model.apply(variables, x, None, method="vae_encode")
    noise = jax.random.normal(jax.random.key(3), z.shape, jnp.float32)
    t = jnp.full((2,), 100, jnp.int32)
    noised = sched.add_noise(z.astype(jnp.float32), noise, t)

    def loss(p):
        (pred, _cl), mut = model.apply(
            {**p, **codebook}, x, noised, t, train=True,
            mutable=["codebook"], rngs={"rng": jax.random.key(4)},
        )
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - noise))

    grads = jax.grad(loss)(params)
    grads = jax.tree.map(lambda g, m: g * m, grads, trainable)
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u, m: u * m, updates, trainable)
    new_params = optax.apply_updates(params, updates)

    p0, p1 = params["params"], new_params["params"]
    # base UNet + VAE + VQ encoder bitwise frozen
    for frozen_key in ("vae", "encoder", "quant_proj"):
        for a, b in zip(jax.tree_util.tree_leaves(p0[frozen_key]),
                        jax.tree_util.tree_leaves(p1[frozen_key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(p0["decoder"]["unet"]),
                    jax.tree_util.tree_leaves(p1["decoder"]["unet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ControlNet branch must move
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0["decoder"]["controlnet"]),
                        jax.tree_util.tree_leaves(p1["decoder"]["controlnet"]))
    )
    assert moved


def test_decode_tokens_roundtrip_shape(tiny_cn):
    model, variables, x = tiny_cn
    tokens = model.apply(variables, x, method="tokenize")
    img = controlnet_decode_tokens(model, variables, tokens, jax.random.key(5),
                                   timesteps=2)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_controlnet_from_unet_copies_encoder(tiny_cn):
    model, variables, x = tiny_cn
    v2 = controlnet_params_from_unet(variables)
    dec = v2["params"]["decoder"]
    for key in ("time_embed", "encoder"):
        for a, b in zip(jax.tree_util.tree_leaves(dec["unet"][key]),
                        jax.tree_util.tree_leaves(dec["controlnet"][key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unconditional_zeroes_controlnet_contribution(tiny_cn):
    """CFG unconditional pass must be independent of the conditioning
    (reference controlnet.py:200-203)."""
    model, variables, x = tiny_cn
    z = jnp.zeros((2, 16, 16, 4))
    t = jnp.full((2,), 10, jnp.int32)
    q1 = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 8), jnp.float32)
    q2 = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 8), jnp.float32)
    a = model.apply(variables, z, t, q1, unconditional=True, method="denoise_step")
    b = model.apply(variables, z, t, q2, unconditional=True, method="denoise_step")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_vq_safetensors_name_roundtrip(tiny_cn):
    """Export to reference-style torch names and re-import: bitwise identical
    (the mapping releases/loads VQControlNet checkpoints)."""
    from fourm_tpu.utils.checkpoint import export_vq_torch_state, import_vq_state_dict

    model, variables, x = tiny_cn
    sd = export_vq_torch_state(variables)
    assert any(k.startswith("decoder.controlnet.") for k in sd)
    assert any(k.startswith("vae.") for k in sd)
    restored = import_vq_state_dict(sd, variables)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=0)


def test_train_vqcontrolnet_cli_smoke(tmp_path):
    from fourm_tpu.cli.train_vqcontrolnet import main

    main([
        "--synthetic_data", "--input_size", "32", "--patch_size", "4",
        "--enc_type", "vit_t_enc", "--codebook_size", "64", "--latent_dim", "8",
        "--model_channels", "32", "--channel_mult", "1", "2",
        "--attention_levels", "1", "--num_heads", "2", "--context_len", "4",
        "--context_dim", "16", "--vae_base_channels", "32",
        "--vae_ch_mult", "1", "2", "--batch_size", "2", "--total_steps", "3",
        "--warmup_steps", "1", "--eval_freq", "3", "--eval_timesteps", "2",
        "--save_ckpt_freq", "1000", "--print_freq", "1", "--dtype", "float32",
        "--output_dir", str(tmp_path / "cn"),
    ])


def test_token2vae_shapes_and_sampling():
    """Token2VAE adapter (reference lm_models.py:30-160): quant grid -> VAE
    latent stats (8ch) upsampled 2^(n_blocks-1)x; stats -> sample."""
    from fourm_tpu.vq import Token2VAE

    m = Token2VAE(in_channels=8, block_out_channels=(32, 64), layers_per_block=1)
    q = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 8), jnp.float32)
    v = m.init(jax.random.key(0), q)
    stats = m.apply(v, q)
    assert stats.shape == (2, 8, 8, 8)  # 2x upsample, mean+std channels
    z = m.sample(stats, rng=jax.random.key(1))
    assert z.shape == (2, 8, 8, 4)
    # 4ch input passes through sample() unchanged
    np.testing.assert_array_equal(np.asarray(m.sample(z)), np.asarray(z))
