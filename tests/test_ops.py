"""Unit tests for fourm_tpu.ops: parity with reference math (computed via torch/numpy
goldens written from the published formulas) and fixed-shape selection semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from fourm_tpu.ops import (
    adapt_decoder_attention_mask,
    build_1d_sincos_posemb,
    build_2d_sincos_posemb,
    compact_position_ids,
    gather_tokens,
    mask_to_bias,
    sample_tokens,
    select_tokens,
    softmax1,
    top_k_top_p_filtering,
)
from fourm_tpu.ops.transformer import (
    Attention,
    Block,
    CrossAttention,
    DecoderBlock,
    GatedMlp,
    LayerNorm,
    dot_product_attention,
)


def torch_sincos_1d(max_len, dim, temperature=10000.0):
    arange = torch.arange(max_len, dtype=torch.float32)
    pos_dim = dim // 2
    omega = torch.arange(pos_dim, dtype=torch.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out = torch.einsum("n,d->nd", arange, omega)
    return torch.cat([torch.sin(out), torch.cos(out)], dim=1)


def torch_sincos_2d(h, w, dim, temperature=10000.0):
    grid_w = torch.arange(w, dtype=torch.float32)
    grid_h = torch.arange(h, dtype=torch.float32)
    grid_w, grid_h = torch.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = dim // 4
    omega = torch.arange(pos_dim, dtype=torch.float32) / pos_dim
    omega = 1.0 / (temperature**omega)
    out_w = torch.einsum("n,d->nd", grid_w.reshape(-1), omega)
    out_h = torch.einsum("n,d->nd", grid_h.reshape(-1), omega)
    return torch.cat(
        [torch.sin(out_w), torch.cos(out_w), torch.sin(out_h), torch.cos(out_h)], dim=1
    )


class TestPosemb:
    def test_1d_matches_reference_formula(self):
        ours = np.asarray(build_1d_sincos_posemb(37, 64))
        golden = torch_sincos_1d(37, 64).numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-6)

    def test_2d_matches_reference_formula(self):
        ours = np.asarray(build_2d_sincos_posemb(7, 5, 64))
        golden = torch_sincos_2d(7, 5, 64).numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-6)

    def test_2d_nonsquare_ordering(self):
        # position index is w * H + h (reference meshgrid indexing quirk)
        h, w, dim = 3, 4, 8
        emb = np.asarray(build_2d_sincos_posemb(h, w, dim))
        assert emb.shape == (h * w, dim)


class TestSoftmax1:
    def test_matches_padded_softmax(self):
        x = torch.randn(4, 9)
        golden = F.pad(x, (0, 1)).softmax(dim=-1)[..., :-1].numpy()
        ours = np.asarray(softmax1(jnp.asarray(x.numpy())))
        np.testing.assert_allclose(ours, golden, atol=1e-6)

    def test_large_negative_stable(self):
        x = jnp.full((2, 5), -1e9)
        out = softmax1(x)
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(np.asarray(out).sum(-1), 0.0, atol=1e-6)


class TestLayerNorm:
    @pytest.mark.parametrize("use_bias", [True, False])
    def test_matches_torch(self, use_bias):
        x = np.random.randn(2, 5, 16).astype(np.float32)
        ln = LayerNorm(eps=1e-6, use_bias=use_bias)
        params = ln.init(jax.random.key(0), jnp.asarray(x))
        w = np.random.randn(16).astype(np.float32)
        b = np.random.randn(16).astype(np.float32) if use_bias else np.zeros(16, np.float32)
        p = {"params": {"weight": jnp.asarray(w)}}
        if use_bias:
            p["params"]["bias"] = jnp.asarray(b)
        ours = np.asarray(ln.apply(p, jnp.asarray(x)))
        golden = F.layer_norm(
            torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-6
        ).numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-5)


class TestAttentionCore:
    def test_masked_attention_matches_torch(self):
        B, H, N, D = 2, 3, 8, 4
        rng = np.random.RandomState(0)
        q = rng.randn(B, H, N, D).astype(np.float32)
        k = rng.randn(B, H, N, D).astype(np.float32)
        v = rng.randn(B, H, N, D).astype(np.float32)
        mask = rng.rand(B, N, N) > 0.7  # True = masked

        bias = mask_to_bias(jnp.asarray(mask), N)
        ours = np.asarray(dot_product_attention(*map(jnp.asarray, (q, k, v)), bias))

        tq, tk, tv = map(torch.from_numpy, (q, k, v))
        attn = (tq @ tk.transpose(-2, -1)) * D**-0.5
        attn = attn.masked_fill(torch.from_numpy(mask).unsqueeze(1), -torch.finfo(attn.dtype).max)
        golden = (attn.softmax(dim=-1) @ tv).numpy()
        np.testing.assert_allclose(ours, golden, atol=1e-5)

    def test_attention_module_shapes(self):
        x = jnp.asarray(np.random.randn(2, 10, 32).astype(np.float32))
        attn = Attention(dim=32, num_heads=4, qk_norm=True)
        params = attn.init(jax.random.key(0), x)
        out = attn.apply(params, x)
        assert out.shape == x.shape

    def test_cross_attention_module_shapes(self):
        x = jnp.asarray(np.random.randn(2, 6, 32).astype(np.float32))
        ctx = jnp.asarray(np.random.randn(2, 11, 32).astype(np.float32))
        xattn = CrossAttention(dim=32, num_heads=4)
        params = xattn.init(jax.random.key(0), x, ctx)
        out = xattn.apply(params, x, ctx)
        assert out.shape == x.shape

    def test_blocks_run(self):
        x = jnp.asarray(np.random.randn(2, 6, 32).astype(np.float32))
        ctx = jnp.asarray(np.random.randn(2, 9, 32).astype(np.float32))
        blk = Block(dim=32, num_heads=4, gated_mlp=True, qk_norm=True)
        p = blk.init(jax.random.key(0), x)
        assert blk.apply(p, x).shape == x.shape
        dblk = DecoderBlock(dim=32, num_heads=4)
        sa_mask = jnp.zeros((2, 6, 6), dtype=bool)
        xa_mask = jnp.zeros((2, 1, 9), dtype=bool)
        p = dblk.init(jax.random.key(0), x, ctx, sa_mask, xa_mask)
        assert dblk.apply(p, x, ctx, sa_mask, xa_mask).shape == x.shape

    def test_gated_mlp_hidden_dim(self):
        x = jnp.ones((1, 2, 12))
        mlp = GatedMlp(hidden_dim=48)
        p = mlp.init(jax.random.key(0), x)
        # 2/3 compensation: hidden = 2*48/3 = 32
        assert p["params"]["fc1"]["kernel"].shape == (12, 32)


class TestTokenSelect:
    def test_matches_reference_argsort(self):
        rng = np.random.RandomState(1)
        B, O, K = 3, 50, 12
        mask = rng.rand(B, O) > 0.5
        # Reference selection: argsort(mask + arange*1e-6)[:K] (fm.py:363-366)
        golden = np.argsort(mask.astype(np.float64) + np.arange(O) * 1e-6, axis=1)[:, :K]
        ours = np.asarray(select_tokens(jnp.asarray(mask), K))
        np.testing.assert_array_equal(ours, golden)

    def test_gather(self):
        x = jnp.asarray(np.arange(2 * 5 * 3).reshape(2, 5, 3).astype(np.float32))
        idx = jnp.asarray([[4, 0], [1, 1]])
        out = np.asarray(gather_tokens(x, idx))
        np.testing.assert_array_equal(out[0, 0], np.asarray(x[0, 4]))
        np.testing.assert_array_equal(out[1, 1], np.asarray(x[1, 1]))

    def test_compact_position_ids(self):
        mask = jnp.asarray([[False, True, False, False, True]])
        pos = np.asarray(compact_position_ids(mask))
        np.testing.assert_array_equal(pos, [[0, 0, 1, 2, 0]])

    def test_adapt_attention_mask_cumsum_semantics(self):
        # Mask [4,0,0,0] -> all attend to each other; [1,1,1,1] -> causal (fm.py:455-460)
        full = jnp.asarray([[4, 0, 0, 0]])
        out = np.asarray(adapt_decoder_attention_mask(full, None, sep_mask=False))
        assert not out.any()
        ar = jnp.asarray([[1, 1, 1, 1]])
        out = np.asarray(adapt_decoder_attention_mask(ar, None, sep_mask=False))
        golden = np.triu(np.ones((4, 4), dtype=bool), k=1)
        np.testing.assert_array_equal(out[0], golden)

    def test_adapt_attention_mask_mixed(self):
        mixed = jnp.asarray([[2, 0, 1, 1]])
        out = np.asarray(adapt_decoder_attention_mask(mixed, None, sep_mask=False))
        # token 0,1 attend to each other; token 2 attends to 0-2; token 3 to all
        golden = ~np.array(
            [
                [True, True, False, False],
                [True, True, False, False],
                [True, True, True, False],
                [True, True, True, True],
            ]
        )
        np.testing.assert_array_equal(out[0], golden)

    def test_sep_mask(self):
        comp = jnp.asarray([[4, 0, 0, 0]])
        mods = jnp.asarray([[0, 0, 1, 1]])
        out = np.asarray(adapt_decoder_attention_mask(comp, mods, sep_mask=True))
        assert not out[0, 0, 1] and out[0, 0, 2] and out[0, 2, 0] and not out[0, 2, 3]

    def test_causal_mode(self):
        comp = jnp.asarray([[4, 0, 0, 0]])
        out = np.asarray(adapt_decoder_attention_mask(comp, None, causal=True, sep_mask=False))
        np.testing.assert_array_equal(out[0], np.triu(np.ones((4, 4), dtype=bool), k=1))


class TestSampling:
    def test_top_k_filtering(self):
        logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
        out = np.asarray(top_k_top_p_filtering(logits, top_k=2))
        assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 2])
        assert out[0, 0] < -1e30 and out[0, 3] < -1e30

    def test_top_p_filtering_keeps_first_crossing(self):
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
        out = np.asarray(top_k_top_p_filtering(logits, top_p=0.6))
        # 0.5 alone < 0.6, so 0.5 and 0.3 are kept (first crossing kept)
        assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
        assert out[0, 2] < -1e30 and out[0, 3] < -1e30

    def test_temperature_zero_is_argmax(self):
        logits = jnp.asarray([[0.1, 3.0, 0.2], [9.0, 1.0, 2.0]])
        samples, probs = sample_tokens(jax.random.key(0), logits, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(samples), [1, 0])
        np.testing.assert_array_equal(np.asarray(probs), [1.0, 1.0])

    def test_sampling_respects_filter(self):
        logits = jnp.asarray([[10.0, 0.0, -1.0, -2.0]] * 64)
        samples, _ = sample_tokens(jax.random.key(1), logits, temperature=1.0, top_k=1)
        np.testing.assert_array_equal(np.asarray(samples), np.zeros(64))


class TestFusedPrenormParity:
    """The fused_prenorm long-sequence / qk_norm branch must include the
    attention residual (regression: it once returned proj(out) without x+,
    silently corrupting every N>1024 prefill under pallas mode on TPU).
    Runs the pallas path in interpret mode on CPU with the backend gate
    monkeypatched, compared against the unfused XLA forward."""

    def _run(self, monkeypatch, *, qk_norm, N, B=2, C=64, heads=2):
        import functools
        from fourm_tpu.kernels import attention as attn_mod
        from fourm_tpu.kernels import fused_mlp as mlp_mod
        from fourm_tpu.ops import transformer as tr

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        blk = Block(dim=C, num_heads=heads, qk_norm=qk_norm)
        params = blk.init(jax.random.key(0), x)
        golden = blk.apply(params, x)  # xla path (default impl)

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        for mod, name in ((attn_mod, "pallas_attention"),
                          (attn_mod, "pallas_mha_short"),
                          (attn_mod, "pallas_attn_block"),
                          (attn_mod, "pallas_flash_mha"),
                          (mlp_mod, "pallas_ln_matmul"),
                          (mlp_mod, "pallas_ln_mlp")):
            fn = getattr(mod, name)
            monkeypatch.setattr(mod, name, functools.partial(fn, interpret=True))
        with tr.use_pallas_attention():
            fused = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(golden),
                                   atol=2e-4, rtol=2e-4)

    def test_qk_norm_branch_keeps_residual(self, monkeypatch):
        self._run(monkeypatch, qk_norm=True, N=128)

    def test_long_sequence_branch_keeps_residual(self, monkeypatch):
        self._run(monkeypatch, qk_norm=False, N=1152, B=1)


class TestSelectTokensPartition:
    def test_bit_identical_to_topk(self):
        """The cumsum+scatter partition must reproduce select_tokens exactly
        across edge cases: all-valid, all-masked, mixed, clamped budgets."""
        from fourm_tpu.ops.token_select import (select_tokens,
                                                select_tokens_partition)

        rng = np.random.RandomState(0)
        for B, O, k in [(4, 48, 32), (2, 3024, 2304), (1, 8, 8), (3, 16, 20)]:
            for p in (0.0, 0.3, 0.7, 1.0):
                mask = jnp.asarray(rng.rand(B, O) < p)
                a = select_tokens(mask, k)
                b = select_tokens_partition(mask, k)
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
