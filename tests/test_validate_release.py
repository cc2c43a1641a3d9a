"""validate_release.py smoke: the full load->tokenize->generate->decode flow
runs against LOCAL safetensors files (standing in for the released HF
checkpoints — same formats, tiny sizes). The network path is exercised on
real hardware; here we prove the script's logic end-to-end and its goldens
round-trip."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture(scope="module")
def release_files(tmp_path_factory):
    """Tiny 4M + RGB tokenizer safetensors in the released format."""
    import yaml
    from safetensors.numpy import save_file

    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.utils.checkpoint import (
        export_fourm_torch_state,
        export_vq_safetensors,
    )
    from fourm_tpu.utils.synthetic import synthetic_mod_batch
    from fourm_tpu.vq import VQVAE

    d = tmp_path_factory.mktemp("release")

    cfg = create_fourm_config(
        "fm_tiny_6e_6d_gelu",
        encoder_modalities=("tok_rgb@224", "tok_depth@224"),
        decoder_modalities=("tok_rgb@224", "tok_depth@224"),
        dim=64, encoder_depth=2, decoder_depth=2, num_heads=4,
        decoder_share_embedding=False,
    )
    model = FourM(cfg)
    batch = jax.tree.map(jnp.asarray, synthetic_mod_batch(
        cfg.encoder_modalities, 1, 16, 16))
    variables = model.init(jax.random.key(0), batch, 16, 16)
    sd = export_fourm_torch_state(variables, cfg)
    meta_cfg = {
        "domains_in": list(cfg.encoder_modalities),
        "domains_out": list(cfg.decoder_modalities),
        "dim": cfg.dim, "encoder_depth": cfg.encoder_depth,
        "decoder_depth": cfg.decoder_depth, "num_heads": cfg.num_heads,
        "act_layer": "GELU",
    }
    fm_path = d / "fm.safetensors"
    save_file(sd, str(fm_path), metadata={"config": yaml.safe_dump(meta_cfg)})

    vq = VQVAE(image_size=224, patch_size=16, enc_type="vit_t_enc",
               dec_type="vit_t_dec", codebook_size=64, latent_dim=8)
    vq_vars = vq.init({"params": jax.random.key(1), "rng": jax.random.key(2)},
                      jnp.zeros((1, 224, 224, 3)))
    vq_path = d / "tok_rgb.safetensors"
    export_vq_safetensors(
        vq_vars,
        {"image_size": 224, "patch_size": 16, "enc_type": "vit_t_enc",
         "dec_type": "vit_t_dec", "codebook_size": 64, "latent_dim": 8,
         "model_type": "VQVAE"},
        str(vq_path),
    )
    return str(fm_path), str(vq_path)


def test_validate_release_local_files(release_files, tmp_path, monkeypatch):
    import validate_release

    fm_path, vq_path = release_files
    monkeypatch.setattr(validate_release, "GOLDEN_PATH",
                        str(tmp_path / "goldens.json"))
    validate_release.main([
        "--fm", fm_path, "--tokenizer", vq_path,
        "--targets", "tok_depth@224", "--write_golden",
    ])
    goldens = json.load(open(tmp_path / "goldens.json"))
    assert vq_path in goldens and len(goldens[vq_path]) == 32
    # second run asserts the golden (must pass: same weights, same input)
    validate_release.main([
        "--fm", fm_path, "--tokenizer", vq_path, "--targets", "tok_depth@224",
    ])


def test_validate_release_offline_message(tmp_path):
    """No network + hub id -> actionable exit 2, not a stack trace."""
    env = {**os.environ, "HF_HUB_OFFLINE": "1", "JAX_PLATFORMS": "cpu"}
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "validate_release.py"),
         "--fm", "EPFL-VILAB/4M-21_B"],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert res.returncode == 2, res.stderr
    assert "machine with network access" in res.stderr
