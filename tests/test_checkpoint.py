"""Checkpoint tests: torch->flax conversion parity, FourM state-dict round trip,
Orbax save/load."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from fourm_tpu.models import FourM, create_fourm_config
from fourm_tpu.utils.checkpoint import (
    auto_resume,
    export_fourm_torch_state,
    import_fourm_state_dict,
    load_checkpoint,
    save_checkpoint,
    t2j_conv,
    t2j_conv_transpose,
    t2j_linear,
)


class TestTensorConversion:
    def test_linear_parity(self):
        from flax import linen as nn

        lin = torch.nn.Linear(8, 16)
        x = torch.randn(2, 8)
        golden = lin(x).detach().numpy()
        dense = nn.Dense(16)
        params = {"params": {
            "kernel": jnp.asarray(t2j_linear(lin.weight.detach().numpy())),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }}
        ours = np.asarray(dense.apply(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(ours, golden, atol=1e-5)

    def test_conv_parity(self):
        from flax import linen as nn

        conv = torch.nn.Conv2d(3, 8, kernel_size=4, stride=4)
        x = torch.randn(1, 3, 8, 8)
        golden = conv(x).detach().numpy()  # (1, 8, 2, 2)
        fconv = nn.Conv(8, (4, 4), strides=(4, 4), padding=0)
        params = {"params": {
            "kernel": jnp.asarray(t2j_conv(conv.weight.detach().numpy())),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }}
        xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())  # NHWC
        ours = np.asarray(fconv.apply(params, xj)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, golden, atol=1e-5)

    def test_conv_transpose_parity(self):
        from flax import linen as nn

        conv = torch.nn.ConvTranspose2d(6, 3, kernel_size=4, stride=4)
        x = torch.randn(1, 6, 2, 2)
        golden = conv(x).detach().numpy()
        fconv = nn.ConvTranspose(3, (4, 4), strides=(4, 4), padding="VALID", transpose_kernel=True)
        params = {"params": {
            "kernel": jnp.asarray(t2j_conv_transpose(conv.weight.detach().numpy())),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }}
        xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
        ours = np.asarray(fconv.apply(params, xj)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, golden, atol=1e-5)


class TestFourMStateDictRoundTrip:
    @pytest.mark.parametrize("share", [True, False])
    def test_round_trip_identical(self, share):
        cfg = create_fourm_config(
            "fm_tiny_6e_6d_swiglu_qknorm_nobias" if False else "fm_base_12e_12d_swiglu_qknorm_nobias",
            encoder_modalities=("rgb@224", "tok_rgb@224", "caption", "t5_caption", "tok_dinov2_global"),
            decoder_modalities=("tok_rgb@224", "caption"),
            dim=64, encoder_depth=2, decoder_depth=2, num_heads=4,
            share_modality_embeddings=share,
            decoder_share_embedding=False,
            num_register_tokens=2,
        )
        model = FourM(cfg)
        from fourm_tpu.utils.synthetic import synthetic_mod_batch

        batch = jax.tree.map(jnp.asarray, synthetic_mod_batch(
            cfg.encoder_modalities, 1, 16, 16, t5_emb_dim=4096))
        variables = model.init(jax.random.key(0), batch, 16, 16)

        sd = export_fourm_torch_state(variables, cfg)
        reimported = import_fourm_state_dict(sd, cfg)

        flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        flat_b_tree = reimported["params"]
        for path, leaf in flat_a:
            node = flat_b_tree
            for p in path:
                node = node[p.key]
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(node), atol=1e-6,
                err_msg=str(path),
            )

        # imported params give identical forward outputs
        loss_a, _ = model.apply(variables, batch, 16, 16)
        loss_b, _ = model.apply(reimported, batch, 16, 16)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


class TestOrbax:
    def test_save_load_auto_resume(self, tmp_path):
        state = {
            "step": jnp.asarray(7),
            "params": {"w": jnp.arange(12.0).reshape(3, 4)},
        }
        save_checkpoint(str(tmp_path), state, step=7)
        save_checkpoint(str(tmp_path), state, step=9)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        restored, step = auto_resume(str(tmp_path), abstract)
        assert step == 9
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.asarray(state["params"]["w"]))


class TestVQStateDictRoundTrip:
    def test_vqvae_roundtrip(self):
        from fourm_tpu.vq import VQVAE
        from fourm_tpu.utils.checkpoint import export_vq_torch_state, import_vq_state_dict

        m = VQVAE(image_size=32, patch_size=4, enc_type="vit_t_enc", dec_type="vit_t_dec",
                  codebook_size=64, latent_dim=8)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
        v = m.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x)
        sd = export_vq_torch_state(v)
        assert "quantize._codebook.embed" in sd
        assert "decoder.out_proj.weight" in sd
        v2 = import_vq_state_dict(sd, v)
        a, _ = m.apply(v, x)
        b, _ = m.apply(v2, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(m.apply(v, x, method="tokenize")),
            np.asarray(m.apply(v2, x, method="tokenize")),
        )

    def test_divae_roundtrip(self):
        from fourm_tpu.vq import DiVAE
        from fourm_tpu.utils.checkpoint import export_vq_torch_state, import_vq_state_dict

        m = DiVAE(image_size=32, patch_size=4, enc_type="vit_t_enc",
                  dec_type="uvit_b_p4_f16", codebook_size=64, latent_dim=8,
                  num_train_timesteps=10)
        rng = np.random.RandomState(0)
        clean = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        noised = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        t = jnp.asarray([3])
        v = m.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, clean, noised, t)
        sd = export_vq_torch_state(v)
        assert any(k.startswith("decoder.mid_block.mid_block.0") for k in sd)
        assert "decoder.conv_out.weight" in sd
        v2 = import_vq_state_dict(sd, v)
        a, _ = m.apply(v, clean, noised, t)
        b, _ = m.apply(v2, clean, noised, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
