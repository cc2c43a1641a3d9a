"""FourMViT transfer model + LoRA tests."""

import numpy as np
import jax
import jax.numpy as jnp

from fourm_tpu.models import FourM, create_fourm_config
from fourm_tpu.models.fm_vit import (
    FourMViT,
    FourMViTConfig,
    params_from_fourm,
    vit_config_from_registry,
)
from fourm_tpu.models.lora import apply_lora, fuse_lora, init_lora_params, lora_param_count


class TestFourMViT:
    def test_features_and_head(self):
        cfg = FourMViTConfig(img_size=32, patch_size=8, dim=64, encoder_depth=2,
                             num_heads=4, num_classes=10)
        model = FourMViT(cfg)
        x = jnp.asarray(np.random.rand(2, 32, 32, 3).astype(np.float32))
        params = model.init(jax.random.key(0), x)
        logits = model.apply(params, x)
        assert logits.shape == (2, 10)
        feats = model.apply(params, x, method="forward_features")
        assert feats.shape == (2, 16, 64)

    def test_registry_config(self):
        cfg = vit_config_from_registry("fm_base_12e_12d_swiglu_nobias")
        assert cfg.dim == 768 and cfg.gated_mlp and not cfg.qkv_bias

    def test_warm_start_from_fourm(self):
        """4M encoder weights transfer into the ViT and change its output."""
        from fourm_tpu.utils.synthetic import synthetic_mod_batch

        fcfg = create_fourm_config(
            "fm_tiny_6e_6d_gelu",
            encoder_modalities=("rgb@224", "caption"),
            decoder_modalities=("caption",),
            dim=64, encoder_depth=2, decoder_depth=2, num_heads=4,
        )
        fourm = FourM(fcfg)
        batch = jax.tree.map(jnp.asarray, synthetic_mod_batch(("rgb@224", "caption"), 1, 16, 16))
        fparams = fourm.init(jax.random.key(0), batch, 16, 16)

        vcfg = FourMViTConfig(img_size=224, patch_size=16, dim=64, encoder_depth=2, num_heads=4)
        vit = FourMViT(vcfg)
        x = jnp.asarray(np.random.rand(1, 224, 224, 3).astype(np.float32))
        vparams = vit.init(jax.random.key(1), x)

        warm = params_from_fourm(fparams)
        # all encoder blocks + rgb embedding transferred
        assert "encoder_0" in warm["params"] and "encoder_embeddings_rgb@224" in warm["params"]
        merged = {"params": {**vparams["params"], **warm["params"]}}
        out_a = np.asarray(vit.apply(vparams, x))
        out_b = np.asarray(vit.apply(merged, x))
        assert not np.allclose(out_a, out_b)


class TestLoRA:
    def test_init_and_fuse(self):
        cfg = FourMViTConfig(img_size=32, patch_size=8, dim=64, encoder_depth=2, num_heads=4)
        model = FourMViT(cfg)
        x = jnp.asarray(np.random.rand(1, 32, 32, 3).astype(np.float32))
        params = model.init(jax.random.key(0), x)

        lora = init_lora_params(jax.random.key(1), params["params"], rank=4)
        assert len(lora) == 2 * 2  # qkv + proj per block
        # qkv gets a 3x-packed bottleneck
        qkv_key = [k for k in lora if k.endswith("qkv/kernel")][0]
        assert lora[qkv_key]["down"].shape[1] == 12
        assert lora_param_count(lora) > 0

        # freshly-initialized LoRA (up=0) is an exact no-op
        fused = {"params": apply_lora(params["params"], lora)}
        np.testing.assert_allclose(
            np.asarray(model.apply(params, x)), np.asarray(model.apply(fused, x)), atol=1e-6
        )

        # training the up matrix changes the output
        lora2 = jax.tree.map(lambda v: v + 0.01, lora)
        fused2 = {"params": fuse_lora(params["params"], lora2, scale=1.0)}
        assert not np.allclose(
            np.asarray(model.apply(params, x)), np.asarray(model.apply(fused2, x))
        )

    def test_gradients_flow_only_to_lora(self):
        cfg = FourMViTConfig(img_size=32, patch_size=8, dim=64, encoder_depth=1, num_heads=4)
        model = FourMViT(cfg)
        x = jnp.asarray(np.random.rand(1, 32, 32, 3).astype(np.float32))
        params = model.init(jax.random.key(0), x)
        lora = init_lora_params(jax.random.key(1), params["params"], rank=2)

        def loss_fn(lora_tree):
            fused = {"params": apply_lora(params["params"], lora_tree)}
            return jnp.sum(model.apply(fused, x) ** 2)

        grads = jax.grad(loss_fn)(lora)
        gnorm = sum(float(jnp.abs(g).sum()) for v in grads.values() for g in v.values())
        assert gnorm > 0
