"""SAM-instance mask decoding + human-pose skeleton rendering (VERDICT round 1,
item 7): decode_dict must return ARRAYS for these modalities, not raw token
strings (reference plotting_utils.py:512-672, :934-1040)."""

import numpy as np
import pytest

from fourm_tpu.utils.decoding import (
    SMPL_PARENTS,
    SMPL_REST_JOINTS,
    _smpl_forward_kinematics,
    decode_sam_instances,
    parse_human_pose_instances,
    visualize_human_poses,
)


class StubBundle:
    """Duck-typed TokenizerBundle returning deterministic decodes."""

    def __init__(self, out_shape, scale=8.0, seed=0):
        self.out_shape = out_shape
        self.scale = scale
        self.seed = seed

    def decode_tokens(self, tokens, **kw):
        n = np.asarray(tokens).shape[0]
        rng = np.random.RandomState(self.seed)
        out = rng.randn(n, *self.out_shape).astype(np.float32) * self.scale
        # make a blobby mask: strongly positive center, negative border
        if len(self.out_shape) >= 2 and self.out_shape[0] >= 16:
            out[:] = -8.0
            h, w = self.out_shape[:2]
            out[:, h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 8.0
        return out


def _sam_string():
    # one point group with one complete polygon: 4 bbox coords + 16 tokens.
    # bbox coords are used directly as pixel positions clipped to the image
    # (reference plotting_utils.py:605-668)
    bbox = "v0=30 v1=30 v0=130 v1=130"
    toks = " ".join(f"v{i % 2}={i * 13 % 512}" for i in range(16))
    return f"point v0=80 v1=80 polygon {bbox} {toks} [EOS]"


def _fake_text_mod_dict(text, text_tokenizer, key):
    ids = text_tokenizer.encode(text).ids
    import jax.numpy as jnp

    arr = jnp.asarray(np.array(ids)[None])
    L = arr.shape[1]
    return {
        key: {
            "tensor": arr,
            "input_mask": jnp.zeros((1, L), bool),
            "target_mask": jnp.ones((1, L), bool),
            "decoder_attention_mask": jnp.zeros((1, L), np.int32),
        }
    }


@pytest.fixture(scope="module")
def text_tokenizer(tmp_path_factory):
    from fourm_tpu.utils.text_tokenizer import (
        generate_coord_tokens,
        generate_sentinel_tokens,
        train_unified_wordpiece_tokenizer,
    )

    corpus = tmp_path_factory.mktemp("dec") / "c.txt"
    corpus.write_text("point polygon none camera shape global pose inst\n" * 50)
    return train_unified_wordpiece_tokenizer(
        str(corpus), vocab_size=500,
        sentinel_tokens=generate_sentinel_tokens(num=10),
        coord_tokens=generate_coord_tokens(bins=1000),
        show_progress=False,
    )


def test_decode_sam_instances_returns_mask_image(text_tokenizer):
    mod_dict = _fake_text_mod_dict(_sam_string(), text_tokenizer, "sam_instance")
    bundle = StubBundle(out_shape=(64, 64))
    out = decode_sam_instances(mod_dict, {"sam_instance": bundle}, text_tokenizer)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.uint8
    assert out.sum() > 0, "no instance painted"
    # painted pixels confined to the decoded bbox (px 30..130)
    ys, xs = np.nonzero(out.sum(-1))
    assert ys.min() >= 30 and ys.max() <= 130
    assert xs.min() >= 30 and xs.max() <= 130


def test_decode_sam_instances_empty_on_none(text_tokenizer):
    mod_dict = _fake_text_mod_dict("point polygon none", text_tokenizer, "sam_instance")
    out = decode_sam_instances(mod_dict, {"sam_instance": StubBundle((64, 64))},
                               text_tokenizer)
    assert out.shape == (224, 224, 3)
    assert out.sum() == 0


def _pose_string():
    words = ["inst"]
    words += [f"v0={v}" for v in (100, 100, 800, 900)]  # bbox
    words += ["camera"] + [f"v0={v}" for v in (60, 50, 45)]
    words += ["shape"] + [f"v0={v}" for v in range(500, 510)]
    # identity-ish global orient: diag(999,.,999)/499.5 - 1 ~ identity
    g = [999, 499, 499, 499, 999, 499, 499, 499, 999]
    words += ["global"] + [f"v0={v}" for v in g]
    words += ["pose"] + [f"v{i % 2}={100 + i}" for i in range(8)]
    assert len(words) == 39
    return " ".join(words)


def test_parse_human_pose_instances():
    insts = parse_human_pose_instances(_pose_string() + " " + _pose_string())
    assert len(insts) == 2
    inst = insts[0]
    assert inst["bbox_xyxy"] == pytest.approx(
        np.array([100, 100, 800, 900]) / 999 * 224, abs=1e-6)
    assert inst["pred_cam"].shape == (3,)
    assert inst["betas"].shape == (10,)
    np.testing.assert_allclose(inst["global_orient"],
                               np.eye(3), atol=0.01)
    assert inst["pose_token_ids"].shape == (8,)
    assert inst["pose_token_ids"][1] >= 512  # v1 offset


def test_forward_kinematics_identity_is_rest_pose():
    joints = _smpl_forward_kinematics(np.eye(3), np.stack([np.eye(3)] * 23))
    np.testing.assert_allclose(joints, SMPL_REST_JOINTS, atol=1e-6)


def test_forward_kinematics_rotation_moves_children():
    rots = np.stack([np.eye(3)] * 23)
    # rotate left elbow (joint 18 local index 17) by 90 deg around z
    rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    rots[17] = rz
    joints = _smpl_forward_kinematics(np.eye(3), rots)
    assert not np.allclose(joints[20], SMPL_REST_JOINTS[20])
    assert np.allclose(joints[:17], SMPL_REST_JOINTS[:17], atol=1e-6)


def test_visualize_human_poses_renders_skeleton():
    # pose tokenizer decodes 8 tokens to >= 207 dims
    bundle = StubBundle(out_shape=(8, 1, 27), scale=0.2, seed=1)
    img = visualize_human_poses(_pose_string(), bundle, background=None)
    assert img.shape == (224, 224, 3)
    assert img.max() <= 1.0 and img.min() >= 0.0
    assert img.sum() > 0, "nothing rendered"


def test_visualize_human_poses_tolerates_garbage():
    bundle = StubBundle(out_shape=(8, 1, 27))
    img = visualize_human_poses("not a pose string at all", bundle)
    assert img.shape == (224, 224, 3)
    assert img.sum() == 0
