"""Tests for the Dirichlet-budgeted masking engine and span masking round-trips."""

import numpy as np
import pytest

from fourm_tpu.data.masking import (
    TransferMasking,
    UnifiedMasking,
    chunk_span_masking,
    simple_span_masking,
)
from fourm_tpu.data.modality_info import MODALITY_INFO
from fourm_tpu.utils.text_tokenizer import (
    generate_coord_tokens,
    generate_sentinel_tokens,
    get_sentinel_to_id_mapping,
    merge_span_masking,
    train_unified_wordpiece_tokenizer,
)

WORDS = ["cat", "dog", "tree", "house", "sky", "river", "sun", "moon", "bird", "fish"]


@pytest.fixture(scope="session")
def tokenizer(tmp_path_factory):
    rng = np.random.RandomState(0)
    corpus = tmp_path_factory.mktemp("tok") / "corpus.txt"
    lines = [" ".join(rng.choice(WORDS, size=8)) for _ in range(200)]
    corpus.write_text("\n".join(lines))
    tok = train_unified_wordpiece_tokenizer(
        str(corpus), vocab_size=500,
        sentinel_tokens=generate_sentinel_tokens(num=20),
        coord_tokens=generate_coord_tokens(bins=10),
        show_progress=False,
    )
    return tok


def test_special_token_order(tokenizer):
    assert tokenizer.token_to_id("[PAD]") == 0
    assert tokenizer.token_to_id("[UNK]") == 1
    assert tokenizer.token_to_id("[SOS]") == 2
    assert tokenizer.token_to_id("[EOS]") == 3
    assert tokenizer.token_to_id("[S_0]") == 4
    assert tokenizer.token_to_id("v0=0") == 24


def test_sentinel_mapping(tokenizer):
    mapping = get_sentinel_to_id_mapping(tokenizer)
    assert mapping[0] == tokenizer.token_to_id("[S_0]")
    assert mapping[19] == tokenizer.token_to_id("[S_19]")
    assert len(mapping) == 20


class TestSpanMasking:
    def test_round_trip(self, tokenizer):
        rng = np.random.default_rng(0)
        mapping = get_sentinel_to_id_mapping(tokenizer)
        sentinel_ids = set(mapping.values())
        seq = list(rng.integers(100, 400, size=30))
        for keep_prob in [0.0, 0.3, 0.7, 1.0]:
            inp, tgt = simple_span_masking(seq, mapping, keep_prob, rng)
            merged = merge_span_masking(inp, tgt, sentinel_ids)
            assert merged == seq, f"round trip failed at keep_prob={keep_prob}"

    def test_keep_prob_one_keeps_all(self, tokenizer):
        rng = np.random.default_rng(1)
        mapping = get_sentinel_to_id_mapping(tokenizer)
        seq = list(range(100, 120))
        inp, tgt = simple_span_masking(seq, mapping, 1.0, rng)
        assert inp == seq
        assert tgt == [mapping[1]]  # only the end sentinel

    def test_keep_prob_zero_masks_all(self, tokenizer):
        rng = np.random.default_rng(2)
        mapping = get_sentinel_to_id_mapping(tokenizer)
        seq = list(range(100, 110))
        inp, tgt = simple_span_masking(seq, mapping, 0.0, rng)
        assert inp == [mapping[1]]
        assert tgt == [mapping[1]] + seq + [mapping[2]]

    def test_chunk_round_trip(self, tokenizer):
        rng = np.random.default_rng(3)
        mapping = get_sentinel_to_id_mapping(tokenizer)
        sentinel_ids = set(mapping.values())
        chunks = [[100, 101], [102], [103, 104, 105], [106]]
        flat = [t for c in chunks for t in c]
        inp, tgt = chunk_span_masking(chunks, mapping, 0.5, rng)
        assert merge_span_masking(inp, tgt, sentinel_ids) == flat


@pytest.fixture
def masker(tokenizer):
    mods = {
        "tok_rgb@224": MODALITY_INFO["tok_rgb@224"],
        "caption": MODALITY_INFO["caption"],
    }
    return UnifiedMasking(
        modality_info=mods,
        text_tokenizer=tokenizer,
        input_tokens_range=(128, 128),
        target_tokens_range=(128, 128),
        input_alphas={"tok_rgb@224": 0.5, "caption": 0.5},
        target_alphas={"tok_rgb@224": 0.5, "caption": 0.5},
        seed=0,
    )


class TestBudgets:
    def test_input_budget_sums(self, masker):
        for _ in range(20):
            b = masker.input_token_budget(128)
            assert sum(b) <= 128
            assert all(x >= 0 for x in b)
            assert b[0] <= 196 and b[1] <= 256

    def test_target_budget_respects_image_remainder(self, masker):
        ib = [150, 0]
        for _ in range(10):
            tb = masker.target_token_budget(ib, 128)
            assert tb[0] <= 196 - 150


class TestImageMask:
    def test_counts_and_disjoint(self, masker):
        d = masker.image_mask(np.zeros(196, np.int32), 196, 60, 50)
        assert (~d["input_mask"]).sum() == 60
        assert (~d["target_mask"]).sum() == 50
        assert not np.any(~d["input_mask"] & ~d["target_mask"])
        # compressed attention mask: single entry = target count at first target pos
        nz = np.nonzero(d["decoder_attention_mask"])[0]
        assert len(nz) == 1
        first_target = np.nonzero(~d["target_mask"])[0][0]
        assert nz[0] == first_target
        assert d["decoder_attention_mask"][nz[0]] == 50


class TestSequenceMask:
    def test_budget_respected(self, masker):
        text = "cat dog tree house sky river sun moon bird fish cat dog"
        for in_b, tgt_b in [(5, 10), (0, 20), (30, 4), (12, 1)]:
            d = masker.sequence_mask(text, 256, in_b, tgt_b, "random")
            assert d["tensor"].shape == (514,)
            assert (~d["input_mask"]).sum() <= in_b
            assert (~d["target_mask"]).sum() <= tgt_b
            # target segment sits at offset input_budget
            tgt_pos = np.nonzero(~d["target_mask"])[0]
            if len(tgt_pos):
                assert tgt_pos[0] == in_b
                assert (d["decoder_attention_mask"][tgt_pos] == 1).all()

    def test_unified_call_end_to_end(self, masker):
        sample = {
            "tok_rgb@224": np.random.randint(0, 16384, size=196).astype(np.int32),
            "caption": "cat dog tree house sky",
        }
        out = masker(sample)
        assert set(out) == {"tok_rgb@224", "caption"}
        total_input = sum(int((~d["input_mask"]).sum()) for d in out.values())
        assert total_input <= 128
        for d in out.values():
            for key in ("tensor", "input_mask", "target_mask", "decoder_attention_mask"):
                assert key in d


class TestSequenceEmbMask:
    def test_shapes(self, masker):
        emb = np.random.randn(20, 64).astype(np.float32)
        d = masker.sequence_emb_mask_span(emb, 77, 30, "all")
        assert d["tensor"].shape == (77, 64)
        assert (~d["input_mask"]).sum() <= 30


class TestTransferMasking:
    def test_split(self, tokenizer):
        mods = {
            "tok_rgb@224": MODALITY_INFO["tok_rgb@224"],
            "caption": MODALITY_INFO["caption"],
        }
        tm = TransferMasking(
            mods, tokenizer, input_modalities=["tok_rgb@224"], target_modalities=["caption"],
            seed=0,
        )
        out = tm({
            "tok_rgb@224": np.zeros(196, np.int32),
            "caption": "cat dog tree",
        })
        assert not out["tok_rgb@224"]["input_mask"].any()
        assert out["tok_rgb@224"]["target_mask"].all()
        assert out["caption"]["input_mask"].all() or (~out["caption"]["input_mask"]).sum() == 1
        assert (~out["caption"]["target_mask"]).sum() > 0


class TestMaskingToModelIntegration:
    def test_masked_batch_feeds_fourm(self, masker):
        """Full path: raw sample -> UnifiedMasking -> batch -> FourM loss."""
        import jax
        import jax.numpy as jnp
        from fourm_tpu.data.batching import batch_mod_dicts
        from fourm_tpu.models import FourM, create_fourm_config

        rng = np.random.RandomState(0)
        samples = []
        for _ in range(2):
            sample = {
                "tok_rgb@224": rng.randint(0, 16384, size=196).astype(np.int32),
                "caption": "cat dog tree house sky river",
            }
            samples.append(masker(sample))
        batch = batch_mod_dicts(samples)
        batch = jax.tree.map(jnp.asarray, batch)

        cfg = create_fourm_config(
            "fm_tiny_6e_6d_gelu",
            encoder_modalities=("tok_rgb@224", "caption"),
            decoder_modalities=("tok_rgb@224", "caption"),
        )
        model = FourM(cfg)
        params = model.init(jax.random.key(0), batch, 128, 128)
        loss, (mod_loss, mod_count) = model.apply(params, batch, 128, 128)
        assert np.isfinite(float(loss))
        total = sum(int(c) for c in mod_count.values())
        assert 0 < total <= 128
