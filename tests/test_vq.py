"""VQ tokenizer subsystem tests: quantizer parity with the reference arithmetic,
EMA training behavior, VQVAE round trips, diffusion schedulers, DiVAE decoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from fourm_tpu.vq import (
    DiVAE,
    DiffusionScheduler,
    VQVAE,
    VectorQuantize,
    divae_decode_tokens,
    enforce_zero_terminal_snr,
    make_alphas_cumprod,
    spaced_timesteps,
)
from fourm_tpu.vq.quantizer import euclidean_distance_logits, l2norm
from fourm_tpu.vq.vit_models import ViTDecoder, ViTEncoder


class TestQuantizerParity:
    def test_euclidean_indices_match_torch(self):
        """Nearest-code indices must match the reference distance arithmetic
        exactly (BASELINE.json: codebook indices matching PyTorch exactly)."""
        rng = np.random.RandomState(0)
        x = rng.randn(512, 32).astype(np.float32)
        embed = rng.randn(1024, 32).astype(np.float32)

        ours = np.asarray(jnp.argmax(euclidean_distance_logits(jnp.asarray(x), jnp.asarray(embed)), -1))

        tx, te = torch.from_numpy(x), torch.from_numpy(embed).t()
        dist = -(tx.pow(2).sum(1, keepdim=True) - 2 * tx @ te + te.pow(2).sum(0, keepdim=True))
        golden = dist.argmax(dim=-1).numpy()
        np.testing.assert_array_equal(ours, golden)

    def test_cosine_indices_match_torch(self):
        rng = np.random.RandomState(1)
        x = rng.randn(256, 16).astype(np.float32)
        embed = rng.randn(512, 16).astype(np.float32)
        xn = np.asarray(l2norm(jnp.asarray(x)))
        en = np.asarray(l2norm(jnp.asarray(embed)))
        ours = np.asarray(jnp.argmax(
            jnp.dot(jnp.asarray(xn), jnp.asarray(en).T, precision=jax.lax.Precision.HIGHEST), -1))
        tx = torch.nn.functional.normalize(torch.from_numpy(x), p=2, dim=-1)
        te = torch.nn.functional.normalize(torch.from_numpy(embed), p=2, dim=-1)
        golden = (tx @ te.t()).argmax(dim=-1).numpy()
        np.testing.assert_array_equal(ours, golden)


class TestVectorQuantize:
    def make(self, **kw):
        vq = VectorQuantize(dim=16, codebook_size=64, codebook_dim=16, **kw)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 50, 16).astype(np.float32))
        variables = vq.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x)
        return vq, variables, x

    def test_inference_roundtrip(self):
        vq, variables, x = self.make()
        quant, ind, loss = vq.apply(variables, x)
        assert quant.shape == x.shape
        assert ind.shape == (2, 50)
        assert float(loss) == 0.0
        # indices_to_embedding(ind) == quant at inference
        emb = vq.apply(variables, ind, method="indices_to_embedding")
        np.testing.assert_allclose(np.asarray(emb), np.asarray(quant), atol=1e-6)

    def test_ema_training_updates_codebook(self):
        vq, variables, x = self.make(decay=0.5, threshold_ema_dead_code=0.0)
        before = np.asarray(variables["codebook"]["embed"])
        (quant, ind, loss), mutated = vq.apply(
            variables, x, train=True, mutable=["codebook"], rngs={"rng": jax.random.key(2)}
        )
        after = np.asarray(mutated["codebook"]["embed"])
        assert not np.allclose(before, after)
        assert float(loss) > 0  # commitment loss
        assert np.asarray(mutated["codebook"]["cluster_size"]).sum() > 0

    def test_dead_code_replacement(self):
        vq, variables, x = self.make(decay=0.99, threshold_ema_dead_code=10.0)
        (q, i, l), mutated = vq.apply(
            variables, x, train=True, mutable=["codebook"], rngs={"rng": jax.random.key(3)}
        )
        # all codes start with cluster_size 0 < 10 -> all replaced by batch latents
        after = np.asarray(mutated["codebook"]["embed"])
        norms = np.linalg.norm(after, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)  # batch_random l2norms

    def test_straight_through_gradient(self):
        vq, variables, x = self.make(commitment_weight=1.0)

        def loss_fn(xin):
            (quant, _, _), _ = vq.apply(
                variables, xin, train=True, mutable=["codebook"], rngs={"rng": jax.random.key(0)}
            )
            return jnp.sum(quant**2)

        g = jax.grad(loss_fn)(x)
        assert np.abs(np.asarray(g)).sum() > 0  # STE passes gradients through

    def test_multihead(self):
        vq = VectorQuantize(dim=32, codebook_size=64, codebook_dim=16, heads=2)
        x = jnp.asarray(np.random.randn(2, 10, 32).astype(np.float32))
        variables = vq.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x)
        quant, ind, _ = vq.apply(variables, x)
        assert quant.shape == (2, 10, 32)
        assert ind.shape == (2, 10, 2)


class TestSchedulers:
    def test_zero_terminal_snr(self):
        betas = np.linspace(1e-4, 0.02, 100).astype(np.float32)
        fixed = enforce_zero_terminal_snr(betas)
        acp = np.cumprod(1 - fixed)
        assert abs(acp[-1]) < 1e-6

    def test_alphas_cumprod_schedules(self):
        for sched in ["linear", "scaled_linear", "squaredcos_cap_v2", "shifted_cosine:0.5"]:
            acp = make_alphas_cumprod(100, sched)
            assert acp.shape == (100,)
            assert acp[0] > 0.9
            assert acp[-1] < 1e-5  # zero terminal SNR

    def test_spaced_timesteps_modes(self):
        for mode in ["trailing", "leading", "linspace"]:
            ts = spaced_timesteps(1000, 50, mode)
            assert len(ts) == 50
            assert (np.diff(ts) < 0).all()
            assert ts.max() < 1000 and ts.min() >= 0

    def test_add_noise_velocity_consistency(self):
        sched = DiffusionScheduler(kind="ddpm", num_train_timesteps=100, beta_schedule="linear")
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
        noise = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
        t = jnp.asarray([10, 50])
        noisy = sched.add_noise(x0, noise, t)
        v = sched.get_velocity(x0, noise, t)
        # identity: noise = sqrt(a)*v + sqrt(1-a)*x_noisy
        n2 = sched.get_noise(noisy, v, t)
        np.testing.assert_allclose(np.asarray(n2), np.asarray(noise), atol=1e-5)

    def test_ddim_step_deterministic(self):
        sched = DiffusionScheduler(kind="ddim", num_train_timesteps=100,
                                   prediction_type="epsilon", clip_sample=False,
                                   thresholding=False)
        rng = np.random.RandomState(0)
        sample = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
        out = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
        a = sched.step(out, jnp.int32(50), jnp.int32(40), sample, jax.random.key(0))
        b = sched.step(out, jnp.int32(50), jnp.int32(40), sample, jax.random.key(9))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # eta=0: no noise

    def test_ddpm_step_finite(self):
        sched = DiffusionScheduler(kind="ddpm", num_train_timesteps=100,
                                   prediction_type="v_prediction", thresholding=True,
                                   clip_sample=False)
        rng = np.random.RandomState(0)
        sample = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
        out = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
        prev = sched.step(out, jnp.int32(99), jnp.int32(98), sample, jax.random.key(0))
        assert np.isfinite(np.asarray(prev)).all()


@pytest.fixture(scope="module")
def tiny_vqvae():
    model = VQVAE(
        image_size=32, patch_size=4, enc_type="vit_t_enc", dec_type="vit_t_dec",
        codebook_size=128, latent_dim=8, norm_codes=True,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x)
    return model, variables, x


class TestVQVAE:
    def test_encode_shapes(self, tiny_vqvae):
        model, variables, x = tiny_vqvae
        quant, code_loss, tokens = model.apply(variables, x, method="encode")
        assert quant.shape == (2, 8, 8, 8)
        assert tokens.shape == (2, 8, 8)
        assert tokens.dtype in (jnp.int32, jnp.int64)

    def test_autoencode_shapes(self, tiny_vqvae):
        model, variables, x = tiny_vqvae
        rec = model.apply(variables, x, method="autoencode")
        assert rec.shape == x.shape

    def test_decode_tokens(self, tiny_vqvae):
        model, variables, x = tiny_vqvae
        tokens = model.apply(variables, x, method="tokenize")
        dec = model.apply(variables, tokens, method="decode_tokens")
        assert dec.shape == x.shape

    def test_training_reduces_reconstruction(self):
        import optax

        # expiry disabled: with a fresh codebook every code is below the dead-code
        # threshold for the first ~30 steps and gets resampled each step (reference
        # behaves identically), which makes a 20-step loss-decrease check flaky
        model = VQVAE(
            image_size=32, patch_size=4, enc_type="vit_t_enc", dec_type="vit_t_dec",
            codebook_size=128, latent_dim=8, norm_codes=True,
            threshold_ema_dead_code=0.0, ema_decay=0.8,
        )
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
        variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x)
        params = {"params": variables["params"]}
        codebook = {"codebook": variables["codebook"]}
        tx = optax.adam(3e-4)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, codebook, opt_state, rng):
            def loss_fn(p):
                (dec, code_loss), mut = model.apply(
                    {**p, **codebook}, x, train=True, mutable=["codebook"],
                    rngs={"rng": rng},
                )
                rec = jnp.mean(jnp.square(dec - x))
                return rec + code_loss, (rec, mut)

            (loss, (rec, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), {"codebook": mut["codebook"]}, opt_state, rec

        recs = []
        for i in range(25):
            params, codebook, opt_state, rec = step(params, codebook, opt_state, jax.random.key(i))
            recs.append(float(rec))
        assert min(recs[-5:]) < recs[0], recs


class TestDiVAE:
    def test_forward_and_decode(self):
        model = DiVAE(
            image_size=32, patch_size=4, enc_type="vit_t_enc",
            dec_type="uvit_t_p4_f16", codebook_size=64, latent_dim=8,
            num_train_timesteps=20, cls_free_guidance_dropout=0.1, masked_cfg=True,
        )
        rng = np.random.RandomState(0)
        clean = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
        noised = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        t = jnp.asarray([3, 10])
        variables = model.init(
            {"params": jax.random.key(0), "rng": jax.random.key(1)}, clean, noised, t,
        )
        (dec, code_loss), _ = model.apply(
            variables, clean, noised, t, train=True, mutable=["codebook"],
            rngs={"rng": jax.random.key(2)},
        )
        assert dec.shape == clean.shape
        assert np.isfinite(np.asarray(dec)).all()

        tokens = model.apply(variables, clean, method="tokenize")
        img = divae_decode_tokens(
            model, variables, tokens, jax.random.key(0), timesteps=4,
        )
        assert img.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_cfg_decode(self):
        model = DiVAE(
            image_size=32, patch_size=4, enc_type="vit_t_enc",
            dec_type="uvit_t_p4_f16", codebook_size=64, latent_dim=8,
            num_train_timesteps=10,
        )
        rng = np.random.RandomState(0)
        clean = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        noised = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        variables = model.init(
            {"params": jax.random.key(0), "rng": jax.random.key(1)}, clean, noised,
            jnp.asarray([1]),
        )
        tokens = model.apply(variables, clean, method="tokenize")
        img = divae_decode_tokens(
            model, variables, tokens, jax.random.key(0), timesteps=2, guidance_scale=2.0,
        )
        assert np.isfinite(np.asarray(img)).all()


class TestViTBackbones:
    def test_feature_map_mode(self):
        """patch_proj=False: tokenizing dense feature maps (CLIP/DINO)."""
        enc = ViTEncoder(in_channels=64, patch_size=16, resolution=224, patch_proj=False,
                         dim_tokens=128, depth=2, num_heads=4)
        x = jnp.asarray(np.random.randn(1, 14, 14, 64).astype(np.float32))
        p = enc.init(jax.random.key(0), x)
        out = enc.apply(p, x)
        assert out.shape == (1, 14, 14, 128)

    def test_multires_posemb_interp(self):
        enc = ViTEncoder(in_channels=3, patch_size=4, resolution=32, dim_tokens=64,
                         depth=1, num_heads=2)
        p = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        out = enc.apply(p, jnp.zeros((1, 48, 48, 3)))  # different resolution
        assert out.shape == (1, 12, 12, 64)

    def test_decoder_out_conv(self):
        dec = ViTDecoder(out_channels=3, patch_size=4, resolution=32, dim_tokens=64,
                         depth=1, num_heads=2, out_conv=True)
        x = jnp.zeros((1, 8, 8, 64))
        p = dec.init(jax.random.key(0), x)
        out = dec.apply(p, x)
        assert out.shape == (1, 32, 32, 3)


class TestMemcodes:
    def test_roundtrip_and_train(self):
        from fourm_tpu.vq import Memcodes

        mc = Memcodes(dim=32, codebook_size=64, heads=2)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 32).astype(np.float32))
        variables = mc.init({"params": jax.random.key(0), "rng": jax.random.key(1)}, x)
        out, ind, loss = mc.apply(variables, x)
        assert out.shape == x.shape and ind.shape == (2, 10, 2)
        emb = mc.apply(variables, ind, method="indices_to_embedding")
        np.testing.assert_allclose(np.asarray(emb), np.asarray(out), atol=1e-5)
        # training path has gradients through the straight-through gumbel
        def loss_fn(v):
            o, _, _ = mc.apply(v, x, train=True, rngs={"rng": jax.random.key(2)})
            return jnp.sum(o ** 2)
        g = jax.grad(loss_fn)(variables)
        assert float(jnp.abs(g["params"]["codes"]).sum()) > 0


class TestPNDM:
    def test_pndm_sample_runs(self):
        from fourm_tpu.vq import PNDMScheduler, pndm_sample

        sched = PNDMScheduler(num_train_timesteps=100, beta_schedule="linear",
                              zero_terminal_snr=False, clip_sample=False,
                              thresholding=False)

        def model_fn(x, t, cond):
            return 0.1 * x + 0.01 * cond

        cond = jnp.ones((1, 8, 8, 3))
        img = pndm_sample(model_fn, sched, jax.random.key(0), cond, (1, 8, 8, 3),
                          timesteps=10)
        assert np.isfinite(np.asarray(img)).all()


class TestPatchedUNet:
    def test_divae_with_unet_patched(self):
        """The released RGB/depth/edge DiVAEs use the ADM patched UNet decoder."""
        from fourm_tpu.vq import DiVAE, divae_decode_tokens

        model = DiVAE(
            image_size=32, patch_size=4, enc_type="vit_t_enc", dec_type="unet_patched",
            codebook_size=64, latent_dim=8, num_train_timesteps=10,
            prediction_type="sample", beta_schedule="linear",
        )
        rng = np.random.RandomState(0)
        clean = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        noised = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        t = jnp.asarray([3])
        variables = model.init({"params": jax.random.key(0), "rng": jax.random.key(1)},
                               clean, noised, t)
        dec, code_loss = model.apply(variables, clean, noised, t)
        assert dec.shape == clean.shape
        assert np.isfinite(np.asarray(dec)).all()
        tokens = model.apply(variables, clean, method="tokenize")
        img = divae_decode_tokens(model, variables, tokens, jax.random.key(0), timesteps=2)
        assert img.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_cond_mask_zeroes_condition(self):
        from fourm_tpu.vq.unet import PatchedUNetCondCat

        m = PatchedUNetCondCat(in_channels=3, out_channels=3, cond_dim=4,
                               patch_size=4, model_channels=32, num_res_blocks=1,
                               attention_resolutions=(2,), channel_mult=(1, 2))
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3).astype(np.float32))
        cond = jnp.ones((1, 4, 4, 4))
        p = m.init(jax.random.key(0), x, jnp.asarray([1]), cond)
        a = m.apply(p, x, jnp.asarray([1]), cond, unconditional=True)
        b = m.apply(p, x, jnp.asarray([1]), jnp.zeros_like(cond))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
