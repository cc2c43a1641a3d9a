"""End-to-end generation CLI test (VERDICT round 1, weak #4 + item 8):
train_4m writes config.json + params export; generate.py loads the orbax dir
(not just safetensors), loads VQ tokenizers via get_image_tokenizer, and saves
DECODED images/text — not only raw token npz."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

MODS = "tok_rgb@224-caption"


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from fourm_tpu.cli.train_4m import main

    out = tmp_path_factory.mktemp("gen") / "run"
    main([
        "--model", "fm_tiny_6e_6d_gelu", "--dim", "64", "--encoder_depth", "2",
        "--decoder_depth", "2", "--num_heads", "2",
        "--in_domains", MODS, "--out_domains", MODS,
        "--synthetic_data", "--batch_size", "2", "--num_input_tokens", "32",
        "--num_target_tokens", "32", "--total_tokens", "0.0001",
        "--warmup_tokens", "0.00001", "--epoch_size", "8", "--max_steps", "2",
        "--eval_freq", "1000", "--save_ckpt_freq", "1",
        "--output_dir", str(out), "--run_name", "r", "--dtype", "float32",
        "--print_freq", "1",
    ])
    run_dir = str(out / "r")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    assert os.listdir(os.path.join(run_dir, "weights"))
    return run_dir


@pytest.fixture(scope="module")
def vq_safetensors(tmp_path_factory):
    """Tiny RGB tokenizer exported in the release safetensors format."""
    from fourm_tpu.utils.checkpoint import export_vq_safetensors
    from fourm_tpu.vq import VQVAE

    cfg = dict(image_size=224, patch_size=16, enc_type="vit_s_enc",
               dec_type="vit_s_dec", codebook_size=16384, latent_dim=8,
               domain="rgb")
    model = VQVAE(**{k: v for k, v in cfg.items() if k != "domain"})
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(
        {"params": jax.random.key(0), "rng": jax.random.key(1)}, x)
    path = tmp_path_factory.mktemp("tok") / "rgb_16k.safetensors"
    export_vq_safetensors(variables, cfg, str(path))
    return str(path)


def test_get_image_tokenizer_from_safetensors(vq_safetensors):
    from fourm_tpu.vq import VQVAE, get_image_tokenizer

    model, variables = get_image_tokenizer(vq_safetensors, verbose=False)
    assert isinstance(model, VQVAE)
    assert model.codebook_size == 16384
    toks = model.apply(variables, jnp.zeros((1, 224, 224, 3)), method="tokenize")
    assert toks.shape == (1, 14, 14)


def test_get_image_tokenizer_encoder_only(vq_safetensors):
    from fourm_tpu.vq import VQ, get_image_tokenizer

    model, variables = get_image_tokenizer(vq_safetensors, encoder_only=True,
                                           verbose=False)
    assert type(model) is VQ
    assert "decoder" not in variables["params"]


def test_generate_cli_decodes_images_and_text(trained_run, vq_safetensors,
                                              tmp_path, tmp_path_factory):
    from fourm_tpu.cli.generate import main
    from fourm_tpu.utils.text_tokenizer import (
        generate_sentinel_tokens,
        train_unified_wordpiece_tokenizer,
    )

    corpus = tmp_path / "c.txt"
    corpus.write_text("a cat sits on a mat\n" * 50)
    tok = train_unified_wordpiece_tokenizer(
        str(corpus), vocab_size=300,
        sentinel_tokens=generate_sentinel_tokens(num=10), show_progress=False)
    tok_path = str(tmp_path / "tok.json")
    tok.save(tok_path)

    out_dir = tmp_path / "gen_out"
    main([
        "--fm_ckpt", trained_run,
        "--text_tokenizer_path", tok_path,
        "--cond_domains", "", "--target_domains", MODS,
        "--dataset", "empty", "--num_samples", "1", "--decoding_steps", "2",
        "--tokenizer", f"tok_rgb={vq_safetensors}",
        "--detokenizer_steps", "2",
        "--output_dir", str(out_dir), "--seed", "0",
    ])
    files = os.listdir(out_dir)
    assert any(f.endswith(".npz") for f in files), files
    assert any(f.endswith(".png") for f in files), files
    assert any(f.endswith(".txt") for f in files), files
    # decoded image is a real 224px RGB image
    from PIL import Image

    png = next(f for f in files if f.endswith(".png"))
    img = Image.open(out_dir / png)
    assert img.size == (224, 224)
