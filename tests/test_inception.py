"""InceptionV3 (FID variant) parity tests.

The flax InceptionV3 (fourm_tpu/vq/inception.py) must match a live torch
forward of the same architecture with SHARED RANDOM WEIGHTS — the torch mirror
below is built functionally from the state dict with F.conv2d / F.batch_norm /
F.avg_pool2d(count_include_pad=...) / F.max_pool2d, i.e. the exact ops the
reference eval stack (torchmetrics FID over pt_inception weights,
run_training_vqvae.py:47-53,1427-1640) executes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fourm_tpu.vq.inception import (
    InceptionV3,
    import_inception_state,
    inception_features_and_probs,
    load_inception,
    preprocess,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


# ------------------------------------------------------------------ torch mirror

def _bc(x, sd, prefix, stride=1, padding=0):
    """BasicConv2d: conv(no bias) + eval BatchNorm(eps=1e-3) + relu."""
    x = F.conv2d(x, sd[f"{prefix}.conv.weight"], stride=stride, padding=padding)
    x = F.batch_norm(
        x, sd[f"{prefix}.bn.running_mean"], sd[f"{prefix}.bn.running_var"],
        sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
        training=False, eps=1e-3,
    )
    return F.relu(x)


def _avg3(x, fid):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=not fid)


def _inc_a(x, sd, p, fid):
    b1 = _bc(x, sd, f"{p}.branch1x1")
    b5 = _bc(_bc(x, sd, f"{p}.branch5x5_1"), sd, f"{p}.branch5x5_2", padding=2)
    bd = _bc(x, sd, f"{p}.branch3x3dbl_1")
    bd = _bc(bd, sd, f"{p}.branch3x3dbl_2", padding=1)
    bd = _bc(bd, sd, f"{p}.branch3x3dbl_3", padding=1)
    bp = _bc(_avg3(x, fid), sd, f"{p}.branch_pool")
    return torch.cat([b1, b5, bd, bp], 1)


def _inc_b(x, sd, p):
    b3 = _bc(x, sd, f"{p}.branch3x3", stride=2)
    bd = _bc(x, sd, f"{p}.branch3x3dbl_1")
    bd = _bc(bd, sd, f"{p}.branch3x3dbl_2", padding=1)
    bd = _bc(bd, sd, f"{p}.branch3x3dbl_3", stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _inc_c(x, sd, p, fid):
    b1 = _bc(x, sd, f"{p}.branch1x1")
    b7 = _bc(x, sd, f"{p}.branch7x7_1")
    b7 = _bc(b7, sd, f"{p}.branch7x7_2", padding=(0, 3))
    b7 = _bc(b7, sd, f"{p}.branch7x7_3", padding=(3, 0))
    bd = _bc(x, sd, f"{p}.branch7x7dbl_1")
    bd = _bc(bd, sd, f"{p}.branch7x7dbl_2", padding=(3, 0))
    bd = _bc(bd, sd, f"{p}.branch7x7dbl_3", padding=(0, 3))
    bd = _bc(bd, sd, f"{p}.branch7x7dbl_4", padding=(3, 0))
    bd = _bc(bd, sd, f"{p}.branch7x7dbl_5", padding=(0, 3))
    bp = _bc(_avg3(x, fid), sd, f"{p}.branch_pool")
    return torch.cat([b1, b7, bd, bp], 1)


def _inc_d(x, sd, p):
    b3 = _bc(_bc(x, sd, f"{p}.branch3x3_1"), sd, f"{p}.branch3x3_2", stride=2)
    b7 = _bc(x, sd, f"{p}.branch7x7x3_1")
    b7 = _bc(b7, sd, f"{p}.branch7x7x3_2", padding=(0, 3))
    b7 = _bc(b7, sd, f"{p}.branch7x7x3_3", padding=(3, 0))
    b7 = _bc(b7, sd, f"{p}.branch7x7x3_4", stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _inc_e(x, sd, p, fid, pool_mode):
    b1 = _bc(x, sd, f"{p}.branch1x1")
    b3 = _bc(x, sd, f"{p}.branch3x3_1")
    b3 = torch.cat([
        _bc(b3, sd, f"{p}.branch3x3_2a", padding=(0, 1)),
        _bc(b3, sd, f"{p}.branch3x3_2b", padding=(1, 0)),
    ], 1)
    bd = _bc(x, sd, f"{p}.branch3x3dbl_1")
    bd = _bc(bd, sd, f"{p}.branch3x3dbl_2", padding=1)
    bd = torch.cat([
        _bc(bd, sd, f"{p}.branch3x3dbl_3a", padding=(0, 1)),
        _bc(bd, sd, f"{p}.branch3x3dbl_3b", padding=(1, 0)),
    ], 1)
    if pool_mode == "max" and fid:
        bp = F.max_pool2d(x, 3, stride=1, padding=1)
    else:
        bp = _avg3(x, fid)
    bp = _bc(bp, sd, f"{p}.branch_pool")
    return torch.cat([b1, b3, bd, bp], 1)


def torch_inception_forward(x_nchw, sd, fid=True):
    x = _bc(x_nchw, sd, "Conv2d_1a_3x3", stride=2)
    x = _bc(x, sd, "Conv2d_2a_3x3")
    x = _bc(x, sd, "Conv2d_2b_3x3", padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = _bc(x, sd, "Conv2d_3b_1x1")
    x = _bc(x, sd, "Conv2d_4a_3x3")
    x = F.max_pool2d(x, 3, 2)
    x = _inc_a(x, sd, "Mixed_5b", fid)
    x = _inc_a(x, sd, "Mixed_5c", fid)
    x = _inc_a(x, sd, "Mixed_5d", fid)
    x = _inc_b(x, sd, "Mixed_6a")
    x = _inc_c(x, sd, "Mixed_6b", fid)
    x = _inc_c(x, sd, "Mixed_6c", fid)
    x = _inc_c(x, sd, "Mixed_6d", fid)
    x = _inc_c(x, sd, "Mixed_6e", fid)
    x = _inc_d(x, sd, "Mixed_7a")
    x = _inc_e(x, sd, "Mixed_7b", fid, "avg")
    x = _inc_e(x, sd, "Mixed_7c", fid, "max")
    feats = x.mean(dim=(2, 3))
    logits = feats @ sd["fc.weight"].T + sd["fc.bias"]
    return feats, logits


# ----------------------------------------------------------- state-dict synth

def random_state_dict(variables, num_classes=1008, seed=0):
    """Random torch state dict with shapes derived from the flax variables."""
    rng = np.random.RandomState(seed)
    sd = {}

    def walk(tree, prefix=""):
        for name, sub in tree.items():
            full = f"{prefix}.{name}" if prefix else name
            if isinstance(sub, dict) and "bn_scale" in sub:
                kh, kw, ci, co = sub["conv"]["kernel"].shape
                sd[f"{full}.conv.weight"] = rng.randn(co, ci, kh, kw).astype(np.float32) * 0.05
                sd[f"{full}.bn.weight"] = rng.rand(co).astype(np.float32) + 0.5
                sd[f"{full}.bn.bias"] = rng.randn(co).astype(np.float32) * 0.1
                sd[f"{full}.bn.running_mean"] = rng.randn(co).astype(np.float32) * 0.1
                sd[f"{full}.bn.running_var"] = rng.rand(co).astype(np.float32) + 0.5
            elif isinstance(sub, dict) and name != "fc":
                walk(sub, full)

    walk(variables["params"])
    d = variables["params"]["fc"]["kernel"].shape[0]
    sd["fc.weight"] = rng.randn(num_classes, d).astype(np.float32) * 0.02
    sd["fc.bias"] = np.zeros(num_classes, np.float32)
    return sd


# 75px input (the architecture minimum): the parity math is size-
# independent — a 299px compile dominates suite wall-clock on the 1-core box
PARITY_SIZE = 75


@pytest.fixture(scope="module", params=[True, False], ids=["fid", "torchvision"])
def shared(request):
    fid = request.param
    model = InceptionV3(fid_variant=fid)
    variables = model.init(jax.random.key(0), jnp.zeros((1, PARITY_SIZE, PARITY_SIZE, 3)))
    sd = random_state_dict(variables)
    variables = import_inception_state(sd, variables)
    return model, variables, sd, fid


class TestInceptionParity:
    def test_features_and_logits_match_torch(self, shared):
        model, variables, sd, fid = shared
        rng = np.random.RandomState(1)
        x = rng.rand(2, PARITY_SIZE, PARITY_SIZE, 3).astype(np.float32) * 2 - 1
        feats_j, logits_j = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            sd_t = {k: torch.from_numpy(v) for k, v in sd.items()}
            feats_t, logits_t = torch_inception_forward(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), sd_t, fid=fid)
        np.testing.assert_allclose(
            np.asarray(feats_j), feats_t.numpy(), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(logits_j), logits_t.numpy(), rtol=2e-3, atol=2e-3)

    def test_variant_flag_changes_output(self):
        """fid_variant must actually change pooling behavior."""
        m_fid = InceptionV3(fid_variant=True)
        v = m_fid.init(jax.random.key(0), jnp.zeros((1, PARITY_SIZE, PARITY_SIZE, 3)))
        sd = random_state_dict(v)
        v = import_inception_state(sd, v)
        m_tv = InceptionV3(fid_variant=False)
        x = jnp.asarray(np.random.RandomState(2).rand(1, PARITY_SIZE, PARITY_SIZE, 3).astype(np.float32))
        f1, _ = m_fid.apply(v, x)
        f2, _ = m_tv.apply(v, x)
        assert not np.allclose(np.asarray(f1), np.asarray(f2))


class TestInceptionEval:
    def test_load_and_feature_helper(self, tmp_path):
        model, variables = load_inception(None)
        imgs = np.random.RandomState(0).rand(5, 64, 64, 3).astype(np.float32)
        feats, probs = inception_features_and_probs(model, variables, imgs, batch_size=3)
        assert feats.shape == (5, 2048)
        assert probs.shape == (5, 1008)
        np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-4)

    def test_preprocess_range(self):
        x = jnp.ones((1, 64, 64, 3)) * 0.5
        y = preprocess(x)
        assert y.shape == (1, 299, 299, 3)
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-5)

    def test_torch_pth_roundtrip(self, tmp_path):
        """The pt_inception .pth load path (torch.save -> load_inception)."""
        model = InceptionV3()
        v = model.init(jax.random.key(0), jnp.zeros((1, PARITY_SIZE, PARITY_SIZE, 3)))
        sd = random_state_dict(v)
        path = tmp_path / "pt_inception.pth"
        torch.save({k: torch.from_numpy(np.array(val)) for k, val in sd.items()}, path)
        model2, v2 = load_inception(str(path))
        x = jnp.asarray(np.random.RandomState(3).rand(1, PARITY_SIZE, PARITY_SIZE, 3).astype(np.float32))
        f_a, _ = model.apply(import_inception_state(sd, v), x)
        f_b, _ = model2.apply(v2, x)
        np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_b), atol=1e-6)
