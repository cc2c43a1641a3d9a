"""Side-by-side parity against the LIVE reference implementation (torch CPU).

VERDICT round 1, item 3 / BASELINE.json: "codebook indices matching PyTorch
exactly" + logits within fp32 tolerance. Imports /root/reference/fourm (via
tests/_reference_stubs.py shims), random-inits tiny models on BOTH sides with
the SAME weights (through export_fourm_torch_state — so the converter itself is
under test), runs the SAME batch, and compares:

  * FourM: per-modality logits (reference fm.py:640-692 return_logits path) and
    mod/token losses.
  * VectorQuantize: nearest-code indices EXACT (euclidean + cosine, reference
    quantize_lucid.py:264-301) and quantized outputs.

The reference shuffles decoder modality order per forward (fm.py:308); we patch
random.sample to the identity order, which is the order our deterministic
implementation uses.
"""

import pathlib
import sys
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from _reference_stubs import import_reference_fm, import_reference_quantizer  # noqa: E402

torch = pytest.importorskip("torch")

MODS = ("tok_rgb@224", "caption")


def _build_reference_model(ref_fm, mods):
    from fourm.data.modality_info import MODALITY_INFO as REF_INFO

    enc, dec = {}, {}
    for mod in mods:
        info = REF_INFO[mod]
        if info.get("encoder_embedding") is not None:
            if info["type"] == "img":
                enc[mod] = info["encoder_embedding"](
                    patch_size=info.get("patch_size", 16),
                    image_size=info.get("input_size", 224),
                )
            else:
                enc[mod] = info["encoder_embedding"]()
        if info.get("decoder_embedding") is not None:
            if info["type"] == "img":
                dec[mod] = info["decoder_embedding"](
                    patch_size=info.get("patch_size", 16),
                    image_size=info.get("input_size", 224),
                )
            else:
                dec[mod] = info["decoder_embedding"]()
    model = ref_fm.fm_tiny_6e_6d_gelu(
        encoder_embeddings=enc,
        decoder_embeddings=dec,
        modality_info={m: REF_INFO[m] for m in mods},
    )
    model.eval()
    return model


def _torch_mod_dict(batch_np, mods):
    out = {}
    for mod in mods:
        d = batch_np[mod]
        out[mod] = {
            "tensor": torch.from_numpy(np.asarray(d["tensor"])).long(),
            "input_mask": torch.from_numpy(np.asarray(d["input_mask"])),
            "target_mask": torch.from_numpy(np.asarray(d["target_mask"])),
            "decoder_attention_mask": torch.from_numpy(
                np.asarray(d["decoder_attention_mask"])
            ).long(),
        }
    return out


@pytest.fixture(scope="module")
def fourm_pair():
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.utils.checkpoint import export_fourm_torch_state
    from fourm_tpu.utils.synthetic import synthetic_mod_batch

    ref_fm = import_reference_fm()
    cfg = create_fourm_config("fm_tiny_6e_6d_gelu", MODS, MODS)
    model = FourM(cfg)
    batch_np = synthetic_mod_batch(MODS, batch_size=2, num_input_tokens=48,
                                   num_target_tokens=48, seed=3)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = model.init(jax.random.key(0), batch, 48, 48)

    tmodel = _build_reference_model(ref_fm, MODS)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_fourm_torch_state(variables, cfg).items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    # every remaining key must be a recomputed buffer (sincos pos_emb) or a
    # weight-tied logits projection
    for k in missing:
        assert "pos_emb" in k or "to_logits" in k, f"unmapped reference param: {k}"
    assert not unexpected, f"exported keys unknown to the reference: {unexpected}"
    # tied to_logits follows token_emb automatically (decoder_embeddings.py:89-91)

    tbatch = _torch_mod_dict(batch_np, MODS)
    return model, variables, cfg, batch, tmodel, tbatch, ref_fm


def test_fourm_logits_match_reference(fourm_pair):
    model, variables, cfg, batch, tmodel, tbatch, ref_fm = fourm_pair

    ours = model.apply(variables, batch, 48, 48, return_logits=True)

    with mock.patch.object(ref_fm.random, "sample", lambda pop, k: list(pop)):
        with torch.no_grad():
            theirs = tmodel(tbatch, num_encoder_tokens=48, num_decoder_tokens=48,
                            return_logits=True)

    for mod in MODS:
        a = np.asarray(ours[mod], dtype=np.float32)
        b = theirs[mod].float().numpy()
        assert a.shape == b.shape, f"{mod}: {a.shape} vs {b.shape}"
        diff = np.max(np.abs(a - b))
        assert diff < 2e-4, f"{mod} logits diverge: max abs diff {diff}"


def test_fourm_loss_matches_reference(fourm_pair):
    model, variables, cfg, batch, tmodel, tbatch, ref_fm = fourm_pair

    with mock.patch.object(ref_fm.random, "sample", lambda pop, k: list(pop)):
        with torch.no_grad():
            t_loss_mod, t_per_mod = tmodel(tbatch, 48, 48, loss_type="mod")
            t_loss_tok, _ = tmodel(tbatch, 48, 48, loss_type="token")

    loss_mod, (per_mod, _) = model.apply(variables, batch, 48, 48, loss_type="mod")
    loss_tok, _ = model.apply(variables, batch, 48, 48, loss_type="token")

    assert abs(float(loss_mod) - float(t_loss_mod)) < 1e-4
    assert abs(float(loss_tok) - float(t_loss_tok)) < 1e-4
    for mod in MODS:
        assert abs(float(per_mod[mod]) - float(t_per_mod[mod])) < 2e-4, mod


@pytest.mark.parametrize("cosine", [False, True])
def test_codebook_indices_exact(cosine):
    from fourm_tpu.vq.quantizer import VectorQuantize

    ql = import_reference_quantizer()
    torch.manual_seed(7)
    dim, K, B, N = 32, 256, 4, 97
    tq = ql.VectorQuantize(
        dim=dim, codebook_size=K, use_cosine_sim=cosine,
        accept_image_fmap=False, channel_last=True,
    )
    tq.eval()
    codebook = tq._codebook.embed.detach().numpy().copy()

    x = np.random.RandomState(11).randn(B, N, dim).astype(np.float32)
    with torch.no_grad():
        t_quant, _, t_ind = tq(torch.from_numpy(x))

    ours = VectorQuantize(dim=dim, codebook_size=K, use_cosine_sim=cosine)
    variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    variables = jax.tree.map(lambda v: v, variables)  # unfreeze-safe copy
    variables["codebook"]["embed"] = jnp.asarray(codebook)
    variables["codebook"]["embed_avg"] = jnp.asarray(codebook)

    quant, ind, _ = ours.apply(variables, jnp.asarray(x))

    np.testing.assert_array_equal(np.asarray(ind), t_ind.numpy(),
                                  err_msg="codebook indices must match EXACTLY")
    np.testing.assert_allclose(np.asarray(quant), t_quant.numpy(), atol=1e-5)


def test_codebook_indices_exact_large_fp32_ties():
    """16k-codebook euclidean search at realistic scale (BASELINE north star)."""
    from fourm_tpu.vq.quantizer import VectorQuantize

    ql = import_reference_quantizer()
    torch.manual_seed(3)
    dim, K = 16, 4096
    tq = ql.VectorQuantize(dim=dim, codebook_size=K,
                           accept_image_fmap=False, channel_last=True)
    tq.eval()
    codebook = tq._codebook.embed.detach().numpy().copy()
    x = np.random.RandomState(5).randn(2, 512, dim).astype(np.float32)
    with torch.no_grad():
        _, _, t_ind = tq(torch.from_numpy(x))

    ours = VectorQuantize(dim=dim, codebook_size=K)
    variables = ours.init({"params": jax.random.key(0)}, jnp.asarray(x))
    variables["codebook"]["embed"] = jnp.asarray(codebook)
    variables["codebook"]["embed_avg"] = jnp.asarray(codebook)
    _, ind, _ = ours.apply(variables, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(ind), t_ind.numpy())


def test_pndm_sampling_matches_reference_scheduler():
    """Full PLMS loop (incl. the skip_prk first-step Heun correction the SD
    config uses) against the live reference PNDMScheduler (weak #6 round 1)."""
    from _reference_stubs import import_reference_scheduler

    from fourm_tpu.vq.scheduling import DiffusionScheduler, pndm_sample

    sp = import_reference_scheduler("pndm")
    sched_t = sp.PNDMScheduler(
        num_train_timesteps=100, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, skip_prk_steps=True,
        prediction_type="epsilon", enforce_zero_terminal_snr=False)
    sched_t.set_timesteps(10, mode="leading")

    def tmodel(x, t):
        return 0.1 * x + float(t) / 100.0

    x = torch.from_numpy(np.random.RandomState(0).randn(1, 3, 8, 8).astype(np.float32))
    xt = x.clone()
    for t in sched_t.timesteps:
        xt = sched_t.step(tmodel(xt, t), int(t), xt).prev_sample

    sched_j = DiffusionScheduler(
        kind="ddim", num_train_timesteps=100, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, prediction_type="epsilon",
        zero_terminal_snr=False, clip_sample=False, thresholding=False)

    def jmodel_fn(xj, t, cond):
        return 0.1 * xj + t.astype(jnp.float32) / 100.0

    x0 = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    orig_normal = jax.random.normal
    jax.random.normal = lambda rng, shape, dtype=jnp.float32: x0.astype(dtype)
    try:
        out = pndm_sample(jmodel_fn, sched_j, jax.random.key(0), None, x0.shape,
                          timesteps=10)
    finally:
        jax.random.normal = orig_normal
    out_t = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_t, xt.numpy(), atol=5e-6)


def test_clip_teacher_matches_vendored_reference():
    """ViTTeacher(CLIP-B16) vs the reference's vendored CLIP VisionTransformer,
    same (random) weights -> same dense features (save_vq_tokens.py:270-276)."""
    import importlib.util

    from fourm_tpu.vq.teachers import TEACHER_PRESETS, ViTTeacher, import_clip_visual_state

    spec = importlib.util.spec_from_file_location(
        "_ref_clip_model", "/root/reference/fourm/utils/clip/model.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    # tiny CLIP geometry to keep the test fast
    tvit = ref.VisionTransformer(input_resolution=32, patch_size=8, width=64,
                                 layers=2, heads=2, output_dim=16)
    tvit.eval()
    state = {f"visual.{k}": v.detach().numpy() for k, v in tvit.state_dict().items()}

    model = ViTTeacher(image_size=32, patch_size=8, width=64, depth=2, num_heads=2,
                       act_name="quick_gelu", pre_norm=True, patch_bias=False,
                       output_dim=16)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x0)
    variables = import_clip_visual_state(state, variables)

    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_feats = tvit(torch.from_numpy(x), return_final_tokens_no_cls=True)
    ref_feats = ref_feats.numpy().reshape(2, 4, 4, 16)
    ours = np.asarray(model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(ours, ref_feats, atol=2e-5)
