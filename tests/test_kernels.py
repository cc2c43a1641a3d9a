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
