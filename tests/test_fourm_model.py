"""End-to-end tests of the FourM model: init, forward loss, logits shapes,
gradient step sanity (loss decreases on a fixed batch)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from fourm_tpu.data.modality_info import MODALITY_INFO, generate_uint15_hash
from fourm_tpu.models import FourM, create_fourm_config

B = 2
RGB_TOKENS = 196  # 224/16 = 14x14
CAP_LEN = 256


def make_mod_dict(rng: np.random.RandomState):
    """Synthetic batch: tok_rgb@224 (img) + caption (seq)."""
    rgb_tok = rng.randint(0, 16384, size=(B, RGB_TOKENS)).astype(np.int32)
    rgb_input_mask = rng.rand(B, RGB_TOKENS) > 0.4  # True = not input
    rgb_target_mask = ~rgb_input_mask  # targets are the non-input tokens
    cap = rng.randint(1, 30000, size=(B, CAP_LEN)).astype(np.int32)
    cap_input_mask = np.ones((B, CAP_LEN), dtype=bool)
    cap_input_mask[:, :16] = False
    cap_target_mask = np.ones((B, CAP_LEN), dtype=bool)
    cap_target_mask[:, 16:48] = False
    cap_attn = np.ones((B, CAP_LEN), dtype=np.int32)  # autoregressive
    return {
        "tok_rgb@224": {
            "tensor": jnp.asarray(rgb_tok),
            "input_mask": jnp.asarray(rgb_input_mask),
            "target_mask": jnp.asarray(rgb_target_mask),
            "decoder_attention_mask": jnp.asarray(
                np.zeros((B, RGB_TOKENS), dtype=np.int32)
            ),
        },
        "caption": {
            "tensor": jnp.asarray(cap),
            "input_mask": jnp.asarray(cap_input_mask),
            "target_mask": jnp.asarray(cap_target_mask),
            "decoder_attention_mask": jnp.asarray(cap_attn),
        },
    }


@pytest.fixture(scope="module")
def tiny_model():
    cfg = create_fourm_config(
        "fm_tiny_6e_6d_gelu",
        encoder_modalities=("tok_rgb@224", "caption"),
        decoder_modalities=("tok_rgb@224", "caption"),
        dim=128, encoder_depth=2, decoder_depth=2, num_heads=4,
    )
    model = FourM(cfg)
    mod_dict = make_mod_dict(np.random.RandomState(0))
    params = model.init(jax.random.key(0), mod_dict, 128, 128)
    return model, params, mod_dict


def test_modality_ids_match_reference_hash():
    # pinned golden values of the uint15 hash (stable across platforms)
    assert generate_uint15_hash("tok_rgb@224") == MODALITY_INFO["tok_rgb@224"].id
    import hashlib

    def ref_hash(s):
        return int(hashlib.sha256(s.encode("utf-8")).hexdigest(), 16) % (2**15)

    for name, spec in MODALITY_INFO.items():
        assert spec.id == ref_hash(name), name


def test_forward_loss_finite(tiny_model):
    model, params, mod_dict = tiny_model
    loss, (mod_loss, mod_count) = model.apply(params, mod_dict, 128, 128)
    assert np.isfinite(float(loss))
    assert set(mod_loss) == {"tok_rgb@224", "caption"}
    assert all(np.isfinite(float(v)) for v in mod_loss.values())
    # counts: caption has 32 targets/sample but the shifted+merged mask loses one
    assert int(mod_count["caption"]) > 0
    assert int(mod_count["tok_rgb@224"]) > 0


def test_token_loss_type(tiny_model):
    model, params, mod_dict = tiny_model
    loss, (mod_loss, mod_count) = model.apply(params, mod_dict, 128, 128, loss_type="token")
    assert np.isfinite(float(loss))
    # reference token loss weights each modality by logits.numel() =
    # n_tokens * vocab_size (fm.py:628-637); matched exactly
    from fourm_tpu.data.modality_info import MODALITY_INFO
    vocab = {m: MODALITY_INFO[m].vocab_size for m in mod_loss}
    total = sum(float(mod_loss[m]) * float(mod_count[m]) * vocab[m] for m in mod_loss)
    cnt = sum(float(mod_count[m]) * vocab[m] for m in mod_loss)
    np.testing.assert_allclose(float(loss), total / cnt, rtol=1e-5)


def test_return_logits_shapes(tiny_model):
    model, params, mod_dict = tiny_model
    logits = model.apply(params, mod_dict, 128, 128, return_logits=True)
    assert logits["tok_rgb@224"].shape == (B, 128, 16384)
    assert logits["caption"].shape == (B, 128, 30000)


def test_loss_decreases_with_training(tiny_model):
    model, params, mod_dict = tiny_model
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            # 32/32 budgets: same code path as 128/128, ~4x cheaper grad
            # compile on the 1-core CI box
            loss, _ = model.apply(p, mod_dict, 32, 32)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_generation_path_full_stream(tiny_model):
    """num_encoder_tokens=None keeps the full concatenated stream (generation)."""
    model, params, mod_dict = tiny_model
    enc_out, enc_emb, enc_mask, modid = model.apply(
        params, mod_dict, method="encode"
    )
    assert enc_out.shape == (B, RGB_TOKENS + CAP_LEN, 128)
    assert enc_mask.shape == (B, RGB_TOKENS + CAP_LEN)


def test_shared_modality_embedding_param_tree(tiny_model):
    model, params, _ = tiny_model
    p = params["params"]
    assert "mod_emb_caption" in p and "mod_emb_tok_rgb@224" in p
    # decoder embeddings tie logits to token_emb (no separate to_logits kernel)
    assert "to_logits" not in p.get("decoder_embeddings_caption", {})
