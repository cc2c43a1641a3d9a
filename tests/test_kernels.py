"""Pallas kernel tests (interpret mode on CPU; the real-TPU run happens in
bench/verify). Parity against the XLA reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourm_tpu.kernels import (
    pallas_attention,
    pallas_nearest_code,
    pallas_nearest_code_cosine,
)
from fourm_tpu.ops.transformer import dot_product_attention, mask_to_bias
from fourm_tpu.vq.quantizer import euclidean_distance_logits, l2norm


class TestPallasAttention:
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_matches_xla(self, with_bias):
        rng = np.random.RandomState(0)
        B, H, N, M, Dh = 2, 3, 64, 80, 32
        q = jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        bias = None
        if with_bias:
            mask = jnp.asarray(rng.rand(B, N, M) > 0.5)
            bias = mask_to_bias(mask, N)
        golden = dot_product_attention(q, k, v, bias)
        ours = pallas_attention(q, k, v, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)

    def test_softmax1_variant(self):
        rng = np.random.RandomState(1)
        B, H, N, Dh = 1, 2, 32, 16
        q = jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
        golden = dot_product_attention(q, q, q, None, allow_zero_attn=True)
        ours = pallas_attention(q, q, q, None, allow_zero_attn=True, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)

    def test_key_broadcast_bias(self):
        """(B, 1, 1, M) pad-mask bias broadcasts over heads and queries."""
        rng = np.random.RandomState(2)
        B, H, N, M, Dh = 2, 2, 16, 24, 8
        q = jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        mask = jnp.asarray(rng.rand(B, 1, M) > 0.3)
        bias = mask_to_bias(mask, N)  # (B, 1, 1, M)
        golden = dot_product_attention(q, k, v, bias)
        ours = pallas_attention(q, k, v, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)


class TestPallasCodebook:
    def test_euclidean_exact_indices(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(300, 32).astype(np.float32))
        embed = jnp.asarray(rng.randn(1000, 32).astype(np.float32))
        golden = jnp.argmax(euclidean_distance_logits(x, embed), axis=-1)
        ours = pallas_nearest_code(x, embed, block_n=128, block_k=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(golden))

    def test_cosine_exact_indices(self):
        rng = np.random.RandomState(1)
        x = l2norm(jnp.asarray(rng.randn(200, 16).astype(np.float32)))
        embed = l2norm(jnp.asarray(rng.randn(512, 16).astype(np.float32)))
        golden = jnp.argmax(
            jnp.dot(x, embed.T, precision=jax.lax.Precision.HIGHEST), axis=-1
        )
        ours = pallas_nearest_code_cosine(x, embed, block_n=128, block_k=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(golden))

    def test_tie_break_first_index(self):
        # duplicate codebook rows: argmax must pick the first occurrence
        embed = jnp.asarray(np.tile(np.eye(8, dtype=np.float32), (4, 1)))  # 32 rows
        x = jnp.asarray(np.eye(8, dtype=np.float32))
        ours = pallas_nearest_code(x, embed, block_n=8, block_k=8, interpret=True)
        np.testing.assert_array_equal(np.asarray(ours), np.arange(8))


class TestFlashAttention:
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_matches_xla_long_stream(self, with_bias):
        from fourm_tpu.kernels.attention import flash_attention

        rng = np.random.RandomState(0)
        B, H, N, M, Dh = 1, 2, 300, 260, 32  # odd sizes exercise padding
        q = jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        bias = None
        if with_bias:
            mask = jnp.asarray(rng.rand(B, N, M) > 0.5)
            bias = mask_to_bias(mask, N)
        golden = dot_product_attention(q, k, v, bias)
        ours = flash_attention(q, k, v, bias, block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)

    def test_key_only_bias_streams(self):
        """(B, 1, 1, M) pad-mask bias takes the streamed key-bias path
        (no (N, M) broadcast) and matches XLA, incl. padded key blocks."""
        from fourm_tpu.kernels.attention import flash_attention

        rng = np.random.RandomState(3)
        B, H, N, M, Dh = 2, 2, 140, 200, 16  # M % block_k != 0 -> iota mask
        q = jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        mask = jnp.asarray(rng.rand(B, 1, M) > 0.3)
        bias = mask_to_bias(mask, N)  # (B, 1, 1, M)
        golden = dot_product_attention(q, k, v, bias)
        ours = flash_attention(q, k, v, bias, block_q=128, block_k=128,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)

    def test_softmax1_long(self):
        from fourm_tpu.kernels.attention import flash_attention

        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 1, 256, 16).astype(np.float32))
        golden = dot_product_attention(q, q, q, None, allow_zero_attn=True)
        ours = flash_attention(q, q, q, None, allow_zero_attn=True,
                               block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)


class TestMHAShort:
    """pallas_mha_short (per-batch-cell, heads in-kernel) vs the generic
    attention math — the VQ-tokenize encoder fast path."""

    def _ref(self, qkv, H, bias=None, allow_zero_attn=False):
        from fourm_tpu.ops.transformer import dot_product_attention

        B, N, C3 = qkv.shape
        Dh = C3 // (3 * H)
        q, k, v = [jnp.moveaxis(qkv.reshape(B, N, 3, H, Dh)[:, :, i], 1, 2)
                   for i in range(3)]
        b4 = None if bias is None else bias[:, None, None, :]
        out = dot_product_attention(q, k, v, b4, allow_zero_attn)
        return jnp.moveaxis(out, 1, 2).reshape(B, N, H * Dh)

    @pytest.mark.parametrize("zero_attn", [False, True])
    def test_matches_generic(self, zero_attn):
        from fourm_tpu.kernels.attention import pallas_mha_short

        B, N, H, Dh = 2, 24, 4, 16
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(B, N, 3 * H * Dh).astype(np.float32))
        out = pallas_mha_short(qkv, H, None, allow_zero_attn=zero_attn,
                               interpret=True)
        ref = self._ref(qkv, H, allow_zero_attn=zero_attn)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_key_bias_mask(self):
        from fourm_tpu.kernels.attention import pallas_mha_short
        from fourm_tpu.ops.transformer import MASK_FILL_VALUE

        B, N, H, Dh = 2, 16, 2, 8
        rng = np.random.RandomState(1)
        qkv = jnp.asarray(rng.randn(B, N, 3 * H * Dh).astype(np.float32))
        mask = jnp.asarray(rng.rand(B, N) > 0.5)
        bias = jnp.where(mask, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
        out = pallas_mha_short(qkv, H, bias, interpret=True)
        ref = self._ref(qkv, H, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestFusedLnMlp:
    """pallas_ln_mlp (fused LN+MLP+residual) vs the unfused module math."""

    def _ref(self, x, gamma, beta, w1, b1, w2, b2, w3=None, b3=None, eps=1e-6):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
        h = (x32 - mean) * jax.lax.rsqrt(var + eps) * gamma
        if beta is not None:
            h = h + beta
        h = h.astype(x.dtype)
        g = jnp.dot(h, w1)
        if b1 is not None:
            g = g + b1
        if w3 is None:
            act = jax.nn.gelu(g.astype(jnp.float32), approximate=False)
        else:
            u = jnp.dot(h, w3)
            if b3 is not None:
                u = u + b3
            act = jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
        out = jnp.dot(act.astype(x.dtype), w2)
        if b2 is not None:
            out = out + b2
        return x + out

    @pytest.mark.parametrize("bias", [True, False])
    def test_gelu_mlp(self, bias):
        from fourm_tpu.kernels.fused_mlp import pallas_ln_mlp

        M, D, HID = 48, 64, 128
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(D).astype(np.float32)) if bias else None
        w1 = jnp.asarray(rng.randn(D, HID).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.randn(HID).astype(np.float32) * 0.1) if bias else None
        w2 = jnp.asarray(rng.randn(HID, D).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1) if bias else None
        out = pallas_ln_mlp(x, gamma, beta, w1, b1, w2, b2, interpret=True)
        ref = self._ref(x, gamma, beta, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_swiglu(self):
        from fourm_tpu.kernels.fused_mlp import pallas_ln_mlp

        M, D, HID = 32, 64, 96
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        w1 = jnp.asarray(rng.randn(D, HID).astype(np.float32) * 0.1)
        w3 = jnp.asarray(rng.randn(D, HID).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.randn(HID, D).astype(np.float32) * 0.1)
        out = pallas_ln_mlp(x, gamma, None, w1, None, w2, None, w3, None,
                            gated=True, interpret=True)
        ref = self._ref(x, gamma, None, w1, None, w2, None, w3, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_erf_poly_accuracy(self):
        from fourm_tpu.kernels.fused_mlp import _erf

        x = jnp.linspace(-6, 6, 4001)
        import scipy.special

        # A&S 7.1.26 is |err|<=1.5e-7 in exact arithmetic; f32 evaluation adds
        # rounding to ~2e-6 — still ~3 orders below bf16 resolution (~8e-3)
        err = np.abs(np.asarray(_erf(x)) - scipy.special.erf(np.asarray(x)))
        assert err.max() < 1e-5


class TestLnMatmul:
    def test_matches_unfused(self):
        from fourm_tpu.kernels.fused_mlp import pallas_ln_matmul

        M, D, F = 40, 64, 192
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(M, D).astype(np.float32))
        gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(D).astype(np.float32))
        w = jnp.asarray(rng.randn(D, F).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)
        out = pallas_ln_matmul(x, gamma, beta, w, b, interpret=True)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
        h = (x32 - mean) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
        ref = jnp.dot(h, w) + b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestFused3D:
    """3-D (B, N, D) per-image grid mode of the fused LN kernels."""

    def test_ln_mlp_3d_matches_2d(self):
        from fourm_tpu.kernels.fused_mlp import pallas_ln_mlp

        B, N, D, HID = 3, 16, 64, 128
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
        gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(D).astype(np.float32))
        w1 = jnp.asarray(rng.randn(D, HID).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.randn(HID).astype(np.float32) * 0.1)
        w2 = jnp.asarray(rng.randn(HID, D).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.randn(D).astype(np.float32) * 0.1)
        o3 = pallas_ln_mlp(x, gamma, beta, w1, b1, w2, b2, interpret=True)
        o2 = pallas_ln_mlp(x.reshape(B * N, D), gamma, beta, w1, b1, w2, b2,
                           interpret=True)
        assert o3.shape == (B, N, D)
        np.testing.assert_allclose(np.asarray(o3).reshape(B * N, D),
                                   np.asarray(o2), rtol=1e-5, atol=1e-5)

    def test_ln_matmul_3d_matches_2d(self):
        from fourm_tpu.kernels.fused_mlp import pallas_ln_matmul

        B, N, D, F = 2, 24, 64, 96
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
        gamma = jnp.asarray(rng.rand(D).astype(np.float32) + 0.5)
        w = jnp.asarray(rng.randn(D, F).astype(np.float32) * 0.1)
        o3 = pallas_ln_matmul(x, gamma, None, w, None, interpret=True)
        o2 = pallas_ln_matmul(x.reshape(B * N, D), gamma, None, w, None,
                              interpret=True)
        assert o3.shape == (B, N, F)
        np.testing.assert_allclose(np.asarray(o3).reshape(B * N, F),
                                   np.asarray(o2), rtol=1e-5, atol=1e-5)


class TestAttnBlock:
    """pallas_attn_block (merged LN+QKV+MHA+proj+residual) vs unfused math."""

    @pytest.mark.parametrize("bias_mode", ["none", "key"])
    def test_matches_unfused(self, bias_mode):
        from fourm_tpu.kernels.attention import pallas_attn_block
        from fourm_tpu.ops.transformer import MASK_FILL_VALUE

        B, N, H, Dh = 2, 24, 4, 16
        C = H * Dh
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        gamma = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
        beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.1)
        bq = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.1)
        wp = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
        bp = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        bias = None
        mask_bias4 = None
        if bias_mode == "key":
            mask = jnp.asarray(rng.rand(B, N) > 0.5)
            bias = jnp.where(mask, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
            mask_bias4 = bias[:, None, None, :]

        out = pallas_attn_block(x, gamma, beta, wq, bq, wp, bp, H, bias,
                                interpret=True)

        # unfused reference
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
        h = (x32 - mean) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
        qkv = jnp.dot(h, wq) + bq
        q, k, v = [jnp.moveaxis(qkv.reshape(B, N, 3, H, Dh)[:, :, i], 1, 2)
                   for i in range(3)]
        from fourm_tpu.ops.transformer import dot_product_attention

        a = dot_product_attention(q, k, v, mask_bias4)
        a = jnp.moveaxis(a, 1, 2).reshape(B, N, C)
        ref = x + (jnp.dot(a, wp) + bp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_no_biases(self):
        from fourm_tpu.kernels.attention import pallas_attn_block

        B, N, H, Dh = 1, 16, 2, 8
        C = H * Dh
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        gamma = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
        wq = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.1)
        wp = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
        out = pallas_attn_block(x, gamma, None, wq, None, wp, None, H,
                                interpret=True)
        assert out.shape == (B, N, C)
        assert np.isfinite(np.asarray(out)).all()


class TestAttentionTrainBwd:
    """Custom-vjp fused attention (training path): gradients must match the
    XLA attention path (interpret mode on CPU)."""

    def _grads(self, fn, q, k, v, *extra):
        def loss(q, k, v):
            out = fn(q, k, v, *extra)
            return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize("with_bias,zero_attn", [
        (False, False), (True, False), (False, True), (True, True)])
    def test_grads_match_xla(self, with_bias, zero_attn):
        from fourm_tpu.kernels.attention_bwd import attention_train

        rng = np.random.RandomState(0)
        B, H, N, M, Dh = 2, 3, 48, 56, 32
        q = jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        bias = None
        if with_bias:
            mask = jnp.asarray(rng.rand(B, N, M) > 0.4)
            bias = mask_to_bias(mask, N)

        def xla(q, k, v):
            return dot_product_attention(q, k, v, bias, allow_zero_attn=zero_attn)

        def fused(q, k, v):
            return attention_train(q, k, v, bias, allow_zero_attn=zero_attn,
                                   interpret=True)

        g_x = self._grads(lambda q, k, v: xla(q, k, v), q, k, v)
        g_f = self._grads(lambda q, k, v: fused(q, k, v), q, k, v)
        for a, b in zip(g_f, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-4)

    def test_key_bias_grads(self):
        from fourm_tpu.kernels.attention_bwd import attention_train

        rng = np.random.RandomState(1)
        B, H, N, M, Dh = 2, 2, 32, 40, 16
        q = jnp.asarray(rng.randn(B, H, N, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, H, M, Dh).astype(np.float32))
        mask = jnp.asarray(rng.rand(B, 1, M) > 0.3)
        bias = mask_to_bias(mask, N)  # (B, 1, 1, M)

        g_x = self._grads(
            lambda q, k, v: dot_product_attention(q, k, v, bias), q, k, v)
        g_f = self._grads(
            lambda q, k, v: attention_train(q, k, v, bias, interpret=True),
            q, k, v)
        for a, b in zip(g_f, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-4)


class TestFusedAdamW:
    """Fused single-pass AdamW (kernels/fused_adamw.py + utils.optim.FusedAdamW)
    must bit-match the optax.adamw chain: params, moments, count, and the
    schedule/bias-correction semantics, over multiple steps, across decayed
    and non-decayed leaves and the non-lane-divisible fallback."""

    def _setup(self):
        from fourm_tpu.utils.optim import FusedAdamW, cosine_schedule

        rng = np.random.RandomState(0)
        params = {
            "w": jnp.asarray(rng.randn(8, 256).astype(np.float32)),   # decayed
            "b": jnp.asarray(rng.randn(256).astype(np.float32)),      # no decay
            "odd": jnp.asarray(rng.randn(37).astype(np.float32)),     # fallback
        }
        mask = {"w": True, "b": False, "odd": False}
        sched = cosine_schedule(1e-2, 50, 5)
        tx = FusedAdamW(sched, (0.9, 0.95), 1e-8, 0.05, mask)
        tx.interpret = True
        return tx, params, sched, mask

    def test_matches_optax_chain_over_steps(self):
        import optax

        tx, params, sched, mask = self._setup()
        ref_tx = optax.adamw(learning_rate=sched, b1=0.9, b2=0.95, eps=1e-8,
                             weight_decay=0.05, mask=mask)

        state_f = tx.init(params)
        state_r = ref_tx.init(params)
        p_f = params
        p_r = params
        rng = np.random.RandomState(1)
        for step in range(4):
            grads = jax.tree.map(
                lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)),
                p_f)
            p_f, state_f = tx.fused_apply(grads, state_f, p_f)
            upd, state_r = ref_tx.update(grads, state_r, p_r)
            p_r = optax.apply_updates(p_r, upd)
            for k in params:
                np.testing.assert_allclose(
                    np.asarray(p_f[k]), np.asarray(p_r[k]),
                    atol=1e-6, rtol=1e-5, err_msg=f"step {step} param {k}")
        # opt state trees interchange: counts and moments line up
        adam_f = [s for s in jax.tree_util.tree_leaves(
            state_f, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
            if isinstance(s, optax.ScaleByAdamState)][0]
        adam_r = [s for s in jax.tree_util.tree_leaves(
            state_r, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
            if isinstance(s, optax.ScaleByAdamState)][0]
        assert int(adam_f.count) == int(adam_r.count) == 4
        for k in params:
            np.testing.assert_allclose(np.asarray(adam_f.mu[k]),
                                       np.asarray(adam_r.mu[k]),
                                       atol=1e-6, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(adam_f.nu[k]),
                                       np.asarray(adam_r.nu[k]),
                                       atol=1e-6, rtol=1e-5)

    def test_update_path_still_optax(self):
        """FusedAdamW.update() must remain the plain optax chain (mesh path)."""
        import optax

        tx, params, sched, mask = self._setup()
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        upd, state2 = tx.update(grads, state, params)
        ref = optax.adamw(learning_rate=sched, b1=0.9, b2=0.95, eps=1e-8,
                          weight_decay=0.05, mask=mask)
        upd_r, _ = ref.update(grads, ref.init(params), params)
        for k in params:
            np.testing.assert_allclose(np.asarray(upd[k]), np.asarray(upd_r[k]),
                                       atol=1e-7, rtol=1e-6)


class TestDecodeStepKernels:
    """Fused decode-step kernels (kernels/decode_step.py) vs the unfused
    DecoderBlock.step path, bit-for-bit on the same param tree. Covers the
    full composition: self kernel -> XLA out-proj -> cache splice -> cross
    kernel -> residual+proj+MLP kernel."""

    def _block(self, qk_norm, gated, C=128, H=4):
        from fourm_tpu.ops.transformer import DecoderBlock
        import flax.linen as nn
        from fourm_tpu.ops.transformer import gelu_exact

        blk = DecoderBlock(
            dim=C, num_heads=H, mlp_ratio=4.0, qkv_bias=not qk_norm,
            proj_bias=not qk_norm, mlp_bias=not qk_norm,
            act=nn.silu if gated else gelu_exact, gated_mlp=gated,
            qk_norm=qk_norm, norm_bias=not qk_norm, dtype=jnp.float32,
        )
        return blk

    @pytest.mark.parametrize("qk_norm,gated", [(False, False), (True, True)])
    def test_full_step_matches_unfused(self, qk_norm, gated):
        from fourm_tpu.kernels.decode_step import (pallas_cross_decode_attn,
                                                   pallas_residual_mlp,
                                                   pallas_self_decode)
        from fourm_tpu.ops.transformer import MASK_FILL_VALUE

        B, C, H, L, M = 4, 128, 4, 32, 64
        Dh = C // H
        blk = self._block(qk_norm, gated, C, H)
        rng = np.random.RandomState(0)
        x_t = jnp.asarray(rng.randn(B, 1, C), jnp.float32) * 0.2
        cross_k = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.2
        cross_v = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.2
        xa_mask = jnp.asarray(rng.rand(B, M) > 0.7)
        step_idx = jnp.int32(5)
        cache_k = jnp.asarray(rng.randn(B, H, Dh, L), jnp.float32) * 0.2
        cache_v = jnp.asarray(rng.randn(B, H, Dh, L), jnp.float32) * 0.2
        params = blk.init(jax.random.key(0), x_t, jnp.zeros((B, 1, C)),
                          method=lambda m, x, c: m(x, c))

        want_x, want_ck, want_cv = blk.apply(
            params, x_t, cache_k, cache_v, cross_k, cross_v, xa_mask,
            step_idx, method="step")

        p = params["params"]
        def path(*ks):
            d = p
            for k in ks:
                d = d[k]
            return d
        def maybe(*ks):
            d = p
            for k in ks:
                if k not in d:
                    return None
                d = d[k]
            return d

        x2 = x_t[:, 0]
        res = pallas_self_decode(
            x2,
            path("norm1", "weight"), maybe("norm1", "bias"),
            path("self_attn", "qkv", "kernel"), maybe("self_attn", "qkv", "bias"),
            path("self_attn", "q_norm", "weight") if qk_norm else None,
            maybe("self_attn", "q_norm", "bias") if qk_norm else None,
            path("self_attn", "k_norm", "weight") if qk_norm else None,
            maybe("self_attn", "k_norm", "bias") if qk_norm else None,
            cache_k, cache_v, step_idx, H, interpret=True)
        assert res is not None
        attn, ck, cv = res
        wp = path("self_attn", "proj", "kernel")
        bp = maybe("self_attn", "proj", "bias")
        x2 = x2 + (attn @ wp + (0 if bp is None else bp))
        np.testing.assert_allclose(np.asarray(ck), np.asarray(want_ck),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(cv), np.asarray(want_cv),
                                   atol=2e-5, rtol=1e-4)

        bias = jnp.where(xa_mask, MASK_FILL_VALUE, 0.0).astype(jnp.float32)
        attn_x = pallas_cross_decode_attn(
            x2,
            path("query_norm", "weight"), maybe("query_norm", "bias"),
            path("cross_attn", "q", "kernel"), maybe("cross_attn", "q", "bias"),
            path("cross_attn", "q_norm", "weight") if qk_norm else None,
            maybe("cross_attn", "q_norm", "bias") if qk_norm else None,
            cross_k, cross_v, bias, H, interpret=True)
        assert attn_x is not None

        if gated:
            w1 = path("mlp", "fc1", "kernel"); w3 = path("mlp", "fc3", "kernel")
            w2 = path("mlp", "fc2", "kernel")
            b1 = maybe("mlp", "fc1", "bias"); b3 = maybe("mlp", "fc3", "bias")
            b2 = maybe("mlp", "fc2", "bias")
        else:
            w1 = path("mlp", "fc1", "kernel"); w2 = path("mlp", "fc2", "kernel")
            b1 = maybe("mlp", "fc1", "bias"); b2 = maybe("mlp", "fc2", "bias")
            w3 = b3 = None
        out = pallas_residual_mlp(
            x2, attn_x,
            path("cross_attn", "proj", "kernel"), maybe("cross_attn", "proj", "bias"),
            path("norm2", "weight"), maybe("norm2", "bias"),
            w1, b1, w2, b2, w3, b3, gated=gated, act_silu=gated,
            interpret=True)
        assert out is not None
        np.testing.assert_allclose(np.asarray(out[:, None, :]),
                                   np.asarray(want_x), atol=5e-5, rtol=1e-3)

    def test_step_idx_zero_empty_cache(self):
        """step_idx=0: every cache position masked; attention must collapse to
        the new token alone (prob 1), not NaN."""
        from fourm_tpu.kernels.decode_step import pallas_self_decode

        B, C, H, L = 2, 64, 2, 32
        Dh = C // H
        rng = np.random.RandomState(1)
        x2 = jnp.asarray(rng.randn(B, C), jnp.float32) * 0.3
        g1 = jnp.ones((C,), jnp.float32)
        wq = jnp.asarray(rng.randn(C, 3 * C), jnp.float32) * 0.05
        cache = jnp.zeros((B, H, Dh, L), jnp.float32)
        res = pallas_self_decode(x2, g1, None, wq, None, None, None, None,
                                 None, cache, cache, jnp.int32(0), H,
                                 interpret=True)
        attn, ck, cv = res
        assert np.isfinite(np.asarray(attn)).all()
        # prob 1 on the new token => attn output == v_new == cache col 0
        x32 = np.asarray(x2, np.float64)
        mean = x32.mean(-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
        h = (x32 - mean) / np.sqrt(var + 1e-6)
        qkv = h @ np.asarray(wq, np.float64)
        v_ref = qkv[:, 2 * C:]
        np.testing.assert_allclose(np.asarray(attn), v_ref, atol=1e-4, rtol=1e-4)
        got_v0 = np.asarray(cv)[:, :, :, 0].reshape(B, C)
        np.testing.assert_allclose(got_v0, v_ref, atol=1e-4, rtol=1e-4)
        # untouched columns preserved through the aliased in-kernel update
        np.testing.assert_array_equal(np.asarray(ck)[:, :, :, 1:],
                                      np.asarray(cache)[:, :, :, 1:])

    def test_softmax1_denominator(self):
        """allow_zero_attn: softmax1's virtual zero logit must appear in the
        denominator exactly as decode_attention's softmax1."""
        from fourm_tpu.kernels.decode_step import pallas_cross_decode_attn
        from fourm_tpu.ops.transformer import decode_attention

        B, C, H, M = 2, 64, 2, 64
        Dh = C // H
        rng = np.random.RandomState(2)
        x2 = jnp.asarray(rng.randn(B, C), jnp.float32) * 0.3
        k_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.3
        v_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.3
        gq = jnp.ones((C,), jnp.float32)
        wq = jnp.asarray(rng.randn(C, C), jnp.float32) * 0.05
        attn = pallas_cross_decode_attn(x2, gq, None, wq, None, None, None,
                                        k_dm, v_dm, None, H,
                                        allow_zero_attn=True, interpret=True)
        # reference: query_norm -> q proj -> decode_attention(softmax1)
        x32 = x2.astype(jnp.float32)
        mean = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
        h = (x32 - mean) * jax.lax.rsqrt(var + 1e-6) * gq
        q = (h @ wq).reshape(B, 1, H, Dh).swapaxes(1, 2)  # (B, H, 1, Dh)
        att = decode_attention(q, k_dm, v_dm, None, allow_zero_attn=True)
        want = att.swapaxes(1, 2).reshape(B, C)
        np.testing.assert_allclose(np.asarray(attn), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    @pytest.mark.parametrize("mode", [True, "hybrid"])
    @pytest.mark.parametrize("qk_norm,gated", [(False, False), (True, True)])
    def test_fused_step_module_path(self, qk_norm, gated, mode, monkeypatch):
        """Drive DecoderBlock._fused_step itself (param extraction + kernel
        wiring) on CPU: monkeypatch the backend gate and force interpret mode.
        Catches wiring bugs the direct-kernel tests can't (e.g. return_params
        shape inference for the (Dh,) qk-norm params)."""
        import functools
        import fourm_tpu.kernels.decode_step as ds
        import fourm_tpu.ops.transformer as tr

        B, C, H, L, M = 4, 128, 4, 32, 64
        Dh = C // H
        blk = self._block(qk_norm, gated, C, H)
        rng = np.random.RandomState(3)
        x_t = jnp.asarray(rng.randn(B, 1, C), jnp.float32) * 0.2
        cross_k = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.2
        cross_v = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.2
        xa_mask = jnp.asarray(rng.rand(B, M) > 0.7)
        step_idx = jnp.int32(7)
        cache_k = jnp.asarray(rng.randn(B, H, Dh, L), jnp.float32) * 0.2
        cache_v = jnp.asarray(rng.randn(B, H, Dh, L), jnp.float32) * 0.2
        params = blk.init(jax.random.key(0), x_t, jnp.zeros((B, 1, C)),
                          method=lambda m, x, c: m(x, c))

        want = blk.apply(params, x_t, cache_k, cache_v, cross_k, cross_v,
                         xa_mask, step_idx, method="step")

        monkeypatch.setattr(tr.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(ds, "pallas_self_decode", functools.partial(
            pallas_self_decode_orig, interpret=True))
        monkeypatch.setattr(ds, "pallas_cross_decode_attn", functools.partial(
            pallas_cross_decode_attn_orig, interpret=True))
        monkeypatch.setattr(ds, "pallas_residual_mlp", functools.partial(
            pallas_residual_mlp_orig, interpret=True))
        from fourm_tpu.ops.transformer import (use_fused_decode,
                                               use_pallas_attention)
        with use_pallas_attention(), use_fused_decode(mode):
            got = blk.apply(params, x_t, cache_k, cache_v, cross_k, cross_v,
                            xa_mask, step_idx, method="step")
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=5e-5, rtol=1e-3)


from fourm_tpu.kernels.decode_step import (
    pallas_cross_decode_attn as pallas_cross_decode_attn_orig,
    pallas_residual_mlp as pallas_residual_mlp_orig,
    pallas_self_decode as pallas_self_decode_orig,
)


class TestFlashMHA:
    """Heads-in-kernel flash (pallas_flash_mha) vs the split-head XLA
    reference, incl. in-kernel per-head QK-norm and key-bias masks."""

    def _ref(self, q3, k3, v3, H, bias2, qng, qnb, kng, knb):
        from fourm_tpu.ops.transformer import dot_product_attention

        B, N, C = q3.shape
        Dh = C // H
        def split(a):
            return jnp.moveaxis(a.reshape(B, N, H, Dh), 1, 2)
        q, k, v = split(q3), split(k3), split(v3)
        def ln(a, g, b):
            a32 = a.astype(jnp.float32)
            mean = jnp.mean(a32, -1, keepdims=True)
            var = jnp.mean(jnp.square(a32 - mean), -1, keepdims=True)
            y = (a32 - mean) * jax.lax.rsqrt(var + 1e-6) * g
            if b is not None:
                y = y + b
            return y.astype(a.dtype)
        if qng is not None:
            q, k = ln(q, qng, qnb), ln(k, kng, knb)
        bias4 = None if bias2 is None else bias2[:, None, None, :]
        out = dot_product_attention(q, k, v, bias4)
        return jnp.moveaxis(out, 1, 2).reshape(B, N, C)

    @pytest.mark.parametrize("qk_norm,with_bias", [(False, True), (True, False),
                                                   (True, True)])
    def test_matches_reference(self, qk_norm, with_bias):
        from fourm_tpu.kernels.attention import pallas_flash_mha
        from fourm_tpu.ops.transformer import MASK_FILL_VALUE

        B, N, C, H = 2, 384, 64, 2
        Dh = C // H
        rng = np.random.RandomState(0)
        r = lambda *s: jnp.asarray(rng.randn(*s), jnp.float32) * 0.3
        q3, k3, v3 = r(B, N, C), r(B, N, C), r(B, N, C)
        bias2 = None
        if with_bias:
            mask = rng.rand(B, N) > 0.8
            bias2 = jnp.where(jnp.asarray(mask), MASK_FILL_VALUE, 0.0
                              ).astype(jnp.float32)
        qng = jnp.asarray(rng.rand(Dh) + 0.5, jnp.float32) if qk_norm else None
        qnb = jnp.asarray(rng.randn(Dh) * 0.1, jnp.float32) if qk_norm else None
        kng = jnp.asarray(rng.rand(Dh) + 0.5, jnp.float32) if qk_norm else None
        knb = None
        got = pallas_flash_mha(q3, k3, v3, H, bias2, qng, qnb, kng, knb,
                               interpret=True)
        assert got is not None
        want = self._ref(q3, k3, v3, H, bias2, qng, qnb, kng, knb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)

    def test_nondivisible_returns_none(self):
        from fourm_tpu.kernels.attention import pallas_flash_mha

        q = jnp.zeros((1, 130, 64), jnp.float32)
        assert pallas_flash_mha(q, q, q, 2) is None

    def test_blocked_streams_match_single_block(self):
        """N=512 with forced multi-block online softmax == one-shot result."""
        from fourm_tpu.kernels.attention import pallas_flash_mha

        B, N, C, H = 1, 512, 128, 4
        rng = np.random.RandomState(3)
        r = lambda *s: jnp.asarray(rng.randn(*s), jnp.float32) * 0.3
        q3, k3, v3 = r(B, N, C), r(B, N, C), r(B, N, C)
        got = pallas_flash_mha(q3, k3, v3, H, interpret=True)
        want = self._ref(q3, k3, v3, H, None, None, None, None, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)


class TestInt8CrossKV:
    """int8 cross-KV decode: the fused kernel with folded scales must match
    the bf16 kernel run on the dequantized tensors (identical math, different
    fold order), and quantization error itself must stay small."""

    def test_kernel_matches_dequantized_oracle(self):
        from fourm_tpu.kernels.decode_step import (pallas_cross_decode_attn,
                                                   quantize_kv_decode)

        B, C, H, M = 2, 64, 2, 128
        Dh = C // H
        rng = np.random.RandomState(5)
        r = lambda *s: jnp.asarray(rng.randn(*s), jnp.float32) * 0.4
        x = r(B, C)
        gq = jnp.ones((C,), jnp.float32)
        wq = r(C, C) * 0.2
        k_dm, v_dm = r(B, H, Dh, M), r(B, H, Dh, M)
        k_i8, ks, v_i8, vs = quantize_kv_decode(k_dm, v_dm)

        got = pallas_cross_decode_attn(x, gq, None, wq, None, None, None,
                                       k_i8, v_i8, None, H,
                                       k_scale=ks, v_scale=vs, interpret=True)
        deq_k = (k_i8.astype(jnp.float32) * ks[..., None])
        deq_v = (v_i8.astype(jnp.float32) * vs[..., None])
        want = pallas_cross_decode_attn(x, gq, None, wq, None, None, None,
                                        deq_k, deq_v, None, H, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)
        # quantization error vs the unquantized KV stays ~1% relative
        ref = pallas_cross_decode_attn(x, gq, None, wq, None, None, None,
                                       k_dm, v_dm, None, H, interpret=True)
        rel = (np.abs(np.asarray(got) - np.asarray(ref)).max()
               / max(np.abs(np.asarray(ref)).max(), 1e-9))
        assert rel < 0.05, rel

    def test_sampler_kv_quant_end_to_end(self, tmp_path):
        """kv_quant='int8' runs the full AR path (CPU: XLA dequantize
        fallback) and produces near-identical tokens to the bf16 sampler on
        an untrained tiny model."""
        from tests.test_generation import make_caption_cond, tiny_gen  # noqa: F401
        from fourm_tpu.generate import (GenerationSampler,
                                        build_chained_generation_schedules,
                                        init_empty_target_modality)
        from fourm_tpu.models import FourM, create_fourm_config
        from fourm_tpu.utils.synthetic import synthetic_mod_batch

        cfg = create_fourm_config(
            "fm_tiny_6e_6d_gelu",
            encoder_modalities=("tok_rgb@224", "caption"),
            decoder_modalities=("tok_rgb@224", "caption"),
            dim=128, encoder_depth=2, decoder_depth=2, num_heads=4,
        )
        model = FourM(cfg)
        batch = jax.tree.map(jnp.asarray, synthetic_mod_batch(
            ("tok_rgb@224", "caption"), 1, num_input_tokens=32,
            num_target_tokens=32))
        params = model.init(jax.random.key(0), batch, 32, 32)

        mod_dict = make_caption_cond()
        init_empty_target_modality(mod_dict, "caption", 1, 64)
        # regenerate caption FROM rgb conditioning: AR with cross-KV
        md0 = {"tok_rgb@224": {k: np.array(v) for k, v in
                               batch["tok_rgb@224"].items()}}
        from fourm_tpu.generate import init_full_input_modality
        init_full_input_modality(md0, "tok_rgb@224")
        init_empty_target_modality(md0, "caption", 1, 64)

        schedule = build_chained_generation_schedules(
            cond_domains=["tok_rgb@224"], target_domains=["caption"],
            tokens_per_target=[None], autoregression_schemes=["autoregressive"],
            decoding_steps=[None], token_decoding_schedules=[None],
            temps=[0.0], temp_schedules=["constant"],
            cfg_scales=[1.0], cfg_schedules=["constant"],
        )
        from fourm_tpu.utils.text_tokenizer import (
            generate_sentinel_tokens, train_unified_wordpiece_tokenizer)

        corpus = tmp_path / "c.txt"
        corpus.write_text("a photo of a cat\n" * 50)
        tok = train_unified_wordpiece_tokenizer(
            str(corpus), vocab_size=300,
            sentinel_tokens=generate_sentinel_tokens(num=10),
            show_progress=False)

        outs = {}
        for quant in (None, "int8"):
            s = GenerationSampler(model, params, text_tokenizer=tok,
                                  kv_quant=quant)
            md = {m: dict(jax.tree.map(jnp.asarray, d)) for m, d in md0.items()}
            counts = s._init_valid_counts(md)
            for step_info in schedule:
                md = s._generate_one_step(md, step_info, jax.random.key(2),
                                          counts=counts)
            outs[quant] = np.asarray(md["caption"]["tensor"])
        # temp-0 argmax on an untrained model: tokens should agree nearly
        # everywhere (quantization can flip near-ties)
        agree = (outs[None] == outs["int8"]).mean()
        assert agree > 0.9, agree


class TestMXUDecodeAttention:
    """pallas_decode_attention (MXU single-query attention) vs the XLA form of
    ops.transformer.decode_attention — the drop-in contract behind the
    use_decode_attn("mxu") switch (raced by bench.py every run)."""

    def _xla(self, q, k_dm, v_dm, bias, aza):
        # the XLA body of decode_attention (the CPU backend gate already
        # routes there, but call the math directly so the oracle is explicit)
        from fourm_tpu.ops.transformer import softmax1

        scale = q.shape[-1] ** -0.5
        q_d = jnp.swapaxes(q, 2, 3).astype(jnp.float32)
        logits = jnp.sum(q_d * k_dm.astype(jnp.float32), axis=2) * scale
        if bias is not None:
            logits = logits + bias
        probs = softmax1(logits) if aza else jax.nn.softmax(logits, axis=-1)
        probs = probs.astype(v_dm.dtype)
        out = jnp.sum(probs[:, :, None, :] * v_dm, axis=3)
        return out[:, :, None, :].astype(q.dtype)

    @pytest.mark.parametrize("bias_kind,aza", [
        (None, False), ("b1m", False), ("bhm", True), ("11m", False)])
    def test_parity(self, bias_kind, aza):
        from fourm_tpu.kernels.decode_step import pallas_decode_attention
        from fourm_tpu.ops.transformer import MASK_FILL_VALUE

        B, H, Dh, M = 2, 4, 64, 256
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, H, 1, Dh), jnp.float32) * 0.3
        k_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.3
        v_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.3
        if bias_kind is None:
            bias = None
        elif bias_kind == "b1m":  # cross-attention mask shape
            bias = jnp.where(jnp.asarray(rng.rand(B, 1, M) > 0.7),
                             MASK_FILL_VALUE, 0.0).astype(jnp.float32)
        elif bias_kind == "bhm":  # per-head bias
            bias = jnp.where(jnp.asarray(rng.rand(B, H, M) > 0.7),
                             MASK_FILL_VALUE, 0.0).astype(jnp.float32)
        else:  # (1, 1, M): the self-attention step_idx mask shape
            pos = jnp.arange(M)
            bias = jnp.where(pos[None, None, :] <= 37, 0.0,
                             MASK_FILL_VALUE).astype(jnp.float32)
        out = pallas_decode_attention(q, k_dm, v_dm, bias, aza,
                                      interpret=True)
        assert out is not None
        want = self._xla(q, k_dm, v_dm, bias, aza)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_multiblock_online_softmax(self):
        """Force multiple M-blocks so the online-softmax rescale runs: M big
        enough that the VMEM model splits it (monkeypatch the budget down)."""
        import fourm_tpu.kernels.decode_step as ds
        from fourm_tpu.kernels.decode_step import pallas_decode_attention

        B, H, Dh, M = 1, 2, 64, 512
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(B, H, 1, Dh), jnp.float32) * 0.5
        k_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.5
        v_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.5
        old = ds._VMEM_BUDGET
        try:
            ds._VMEM_BUDGET = 300 * 1024  # forces bm=128 -> 4 online blocks
            out = pallas_decode_attention(q, k_dm, v_dm, None, False,
                                          interpret=True)
        finally:
            ds._VMEM_BUDGET = old
        assert out is not None
        want = self._xla(q, k_dm, v_dm, None, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_switch_module_path(self, monkeypatch):
        """decode_attention under use_decode_attn("mxu") routes through the
        kernel (backend gate monkeypatched) and matches the XLA default."""
        import functools
        import fourm_tpu.kernels.decode_step as ds
        import fourm_tpu.ops.transformer as tr

        B, H, Dh, M = 2, 2, 64, 128
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(B, H, 1, Dh), jnp.float32) * 0.3
        k_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.3
        v_dm = jnp.asarray(rng.randn(B, H, Dh, M), jnp.float32) * 0.3
        want = tr.decode_attention(q, k_dm, v_dm, None, False)

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            ds, "pallas_decode_attention",
            functools.partial(ds.pallas_decode_attention, interpret=True))
        with tr.use_decode_attn("mxu"):
            got = tr.decode_attention(q, k_dm, v_dm, None, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)
