"""Tensor parallelism beyond sharding rules (VERDICT round 1, item 10):
activation constraints compile+execute, per-device param bytes shrink with the
tensor axis, and the TP forward matches the unsharded forward numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourm_tpu.models import FourM, create_fourm_config
from fourm_tpu.ops.transformer import (
    reset_activation_sharder,
    set_activation_sharder,
)
from fourm_tpu.parallel.mesh import (
    activation_sharder,
    make_mesh,
    model_shardings,
    replicated,
)
from fourm_tpu.utils.synthetic import synthetic_mod_batch

MODS = ("tok_rgb@224", "caption")


@pytest.fixture(scope="module")
def tp_setup():
    cfg = create_fourm_config("fm_tiny_6e_6d_gelu", MODS, MODS, encoder_depth=2,
                              decoder_depth=2, dim=64, num_heads=4)
    model = FourM(cfg)
    batch = jax.tree.map(jnp.asarray, synthetic_mod_batch(MODS, 2, 32, 32, seed=0))
    example = jax.tree.map(lambda x: x[:1], batch)
    params = model.init(jax.random.key(0), example, 32, 32)
    return cfg, model, batch, params


def _per_device_bytes(params):
    return sum(p.addressable_shards[0].data.nbytes
               for p in jax.tree_util.tree_leaves(params))


def test_param_bytes_shrink_with_tensor_axis(tp_setup):
    cfg, model, batch, params = tp_setup
    mesh = make_mesh(data=1, fsdp=1, tensor=4, devices=jax.devices()[:4])
    shardings = model_shardings(mesh, params)
    sharded = jax.device_put(params, shardings)
    full = sum(np.prod(p.shape) * p.dtype.itemsize
               for p in jax.tree_util.tree_leaves(params))
    per_dev = _per_device_bytes(sharded)
    # qkv/mlp/proj/embedding weights dominate -> expect close to 1/4
    assert per_dev < 0.5 * full, (per_dev, full)
    # a qkv kernel is definitely tensor-sharded
    qkv = sharded["params"]["encoder_0"]["attn"]["qkv"]["kernel"]
    assert "tensor" in str(qkv.sharding.spec)


def test_tp_forward_matches_unsharded(tp_setup):
    cfg, model, batch, params = tp_setup
    loss_ref, _ = jax.jit(
        lambda p, b: model.apply(p, b, 32, 32)
    )(params, batch)

    mesh = make_mesh(data=1, fsdp=1, tensor=4, devices=jax.devices()[:4])
    shardings = model_shardings(mesh, params)
    sharded = jax.device_put(params, shardings)
    token = set_activation_sharder(activation_sharder(mesh))
    try:
        loss_tp, _ = jax.jit(
            lambda p, b: model.apply(p, b, 32, 32),
            in_shardings=(shardings, replicated(mesh)),
            out_shardings=replicated(mesh),
        )(sharded, batch)
    finally:
        reset_activation_sharder(token)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=2e-5)


def test_tp_serving_bench_script_runs(tp_setup):
    """The committed XL-serving microbench must execute on the virtual mesh."""
    import json
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "benchmarks/tp_serving_bench.py", "--cpu", "4",
         "--model", "fm_tiny_6e_6d_gelu", "--iters", "2", "--batch_size", "1"],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["value"] > 0
    assert out["shrink_factor"] > 1.5, out