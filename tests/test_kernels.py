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

    def test_softmax1_long(self):
        from fourm_tpu.kernels.attention import flash_attention

        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 1, 256, 16).astype(np.float32))
        golden = dot_product_attention(q, q, q, None, allow_zero_attn=True)
        ours = flash_attention(q, q, q, None, allow_zero_attn=True,
                               block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=2e-5)
