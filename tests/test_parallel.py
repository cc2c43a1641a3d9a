"""SPMD training tests on a virtual 8-device CPU mesh (SURVEY.md §4:
single-host multi-device tests replace the reference's "real torchrun only"
distributed testing)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourm_tpu.models import FourM, create_fourm_config
from fourm_tpu.parallel import (
    build_train_step,
    fsdp_sharding_for,
    init_train_state,
    make_mesh,
)
from fourm_tpu.utils.optim import (
    cosine_schedule,
    create_optimizer,
    make_schedule,
    weight_decay_mask,
)


def tiny_batch(B, rng):
    n = 196
    cap = 64
    return {
        "tok_rgb@224": {
            "tensor": jnp.asarray(rng.randint(0, 16384, (B, n)).astype(np.int32)),
            "input_mask": jnp.asarray(rng.rand(B, n) > 0.5),
            "target_mask": jnp.asarray(rng.rand(B, n) > 0.5),
            "decoder_attention_mask": jnp.zeros((B, n), jnp.int32),
        },
        "caption": {
            "tensor": jnp.asarray(rng.randint(1, 30000, (B, cap)).astype(np.int32)),
            "input_mask": jnp.asarray(np.tile(np.arange(cap) >= 8, (B, 1))),
            "target_mask": jnp.asarray(np.tile((np.arange(cap) < 8) | (np.arange(cap) >= 24), (B, 1))),
            "decoder_attention_mask": jnp.ones((B, cap), jnp.int32),
        },
    }


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "tests require the 8-device CPU mesh"
    return make_mesh(data=4, fsdp=2)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = create_fourm_config(
        "fm_tiny_6e_6d_gelu",
        encoder_modalities=("tok_rgb@224", "caption"),
        decoder_modalities=("tok_rgb@224", "caption"),
        dim=128, encoder_depth=2, decoder_depth=2, num_heads=4,
    )
    return FourM(cfg)


def test_schedules():
    sched = cosine_schedule(1.0, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1.0, atol=1e-6)
    assert float(sched(100)) < 0.01
    isq = make_schedule("inverse_sqrt", 1.0, 100, 10, cooldown_steps=10)
    assert float(isq(5)) == 0.5
    assert float(isq(50)) < 1.0


def test_weight_decay_mask(tiny_setup):
    model = tiny_setup
    rng = np.random.RandomState(0)
    batch = tiny_batch(2, rng)
    params = model.init(jax.random.key(0), batch, 32, 32)
    mask = weight_decay_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    decayed = {".".join(str(k) for k in path): v for path, v in flat}
    # embeddings / norms / biases excluded, attention+mlp kernels included
    for name, v in decayed.items():
        if "token_emb" in name or "mask_token" in name or "mod_emb" in name:
            assert v is False or v == False, name  # noqa: E712
        if "kernel" in name and ("qkv" in name or "fc1" in name):
            assert v, name


def test_fsdp_sharding_rule(mesh):
    s = fsdp_sharding_for(mesh, jax.ShapeDtypeStruct((768, 768), jnp.float32))
    assert "fsdp" in str(s.spec)
    s2 = fsdp_sharding_for(mesh, jax.ShapeDtypeStruct((3,), jnp.float32))
    assert s2.spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_runs_and_learns(mesh, tiny_setup):
    model = tiny_setup
    rng = np.random.RandomState(0)
    batch = tiny_batch(8, rng)

    sched = cosine_schedule(1e-3, 100, 0)
    example = jax.tree.map(lambda x: x[:1], batch)
    params_shape = jax.eval_shape(
        lambda r: model.init(r, example, 32, 32), jax.random.key(0)
    )
    tx = create_optimizer(params_shape, sched, weight_decay=0.05, clip_grad=1.0)

    state, shardings = init_train_state(
        model, tx, example, 32, 32, jax.random.key(0), mesh=mesh
    )
    step = build_train_step(
        model, tx, 32, 32, mesh=mesh, state_shardings=shardings, donate=False
    )
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_grad_accumulation(mesh, tiny_setup):
    model = tiny_setup
    rng = np.random.RandomState(1)
    batch = tiny_batch(8, rng)
    accum_batch = jax.tree.map(lambda x: x.reshape((2, 4) + x.shape[1:]), batch)

    sched = cosine_schedule(1e-3, 100, 0)
    example = jax.tree.map(lambda x: x[:1], batch)
    params_shape = jax.eval_shape(
        lambda r: model.init(r, example, 32, 32), jax.random.key(0)
    )
    tx = create_optimizer(params_shape, sched)
    state, _ = init_train_state(model, tx, example, 32, 32, jax.random.key(0))
    step = build_train_step(model, tx, 32, 32, grad_accum_steps=2, donate=False)
    new_state, metrics = step(state, accum_batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_tensor_parallel_train_step(tiny_setup):
    """(data=2, fsdp=2, tensor=2) mesh: megatron-style qkv/mlp sharding + ZeRO."""
    from fourm_tpu.parallel import model_shardings
    from jax.sharding import PartitionSpec

    mesh3 = make_mesh(data=2, fsdp=2, tensor=2)
    model = tiny_setup
    rng = np.random.RandomState(0)
    batch = tiny_batch(8, rng)
    example = jax.tree.map(lambda x: x[:1], batch)
    params_shape = jax.eval_shape(
        lambda r: model.init(r, example, 32, 32), jax.random.key(0)
    )
    shardings = model_shardings(mesh3, params_shape)
    # qkv kernels must be tensor-sharded on the output axis
    qkv = shardings["params"]["encoder_0"]["attn"]["qkv"]["kernel"]
    assert "tensor" in str(qkv.spec)

    sched = cosine_schedule(1e-3, 100, 0)
    tx = create_optimizer(params_shape, sched)
    state, st_shard = init_train_state(model, tx, example, 32, 32, jax.random.key(0), mesh=mesh3)
    step = build_train_step(model, tx, 32, 32, mesh=mesh3, state_shardings=st_shard, donate=False)
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


class TestMultiDeviceVQ:
    """Multi-device evidence for the codebook EMA/dead-code machinery: the
    reference's only nontrivial collective (quantize_lucid.py:91-125 all_gather/
    broadcast + sync_codebook, vqvae.py:93) is replaced here by global
    reductions under SPMD jit. These tests PROVE a batch-sharded VQ train step
    produces the same codebook state and indices as the single-device run on
    the same global batch."""

    def _make_vq(self):
        from fourm_tpu.vq import VQ

        return VQ(image_size=32, patch_size=4, enc_type="vit_t_enc",
                  codebook_size=32, latent_dim=8, ema_decay=0.5,
                  threshold_ema_dead_code=0.5, kmeans_init=False)

    def test_sharded_vq_train_step_matches_single_device(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        model = self._make_vq()
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
        variables = model.init(
            {"params": jax.random.key(0), "rng": jax.random.key(1)}, x[:1])

        def train_step(v, x, r):
            (_q, loss, ind), mut = model.apply(
                v, x, train=True, mutable=["codebook"], rngs={"rng": r},
                method="encode")
            return ind, loss, mut["codebook"]["quantize"]

        # single device
        ind1, loss1, cb1 = jax.jit(train_step)(variables, x, jax.random.key(2))

        # 8-device mesh, batch sharded over 'data', params replicated
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        ind8, loss8, cb8 = jax.jit(train_step)(vs, xs, jax.random.key(2))

        np.testing.assert_array_equal(np.asarray(ind1), np.asarray(ind8))
        np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
        for k in ("embed", "embed_avg", "cluster_size"):
            np.testing.assert_allclose(
                np.asarray(cb1[k]), np.asarray(cb8[k]), rtol=1e-5, atol=1e-6,
                err_msg=f"codebook[{k}] diverged under batch sharding")

    def test_dead_code_expiry_consistent_under_sharding(self):
        """Force dead codes (huge threshold) and check the replacement gather
        is identical under the sharded run (explicit PRNG, global batch)."""
        from fourm_tpu.vq import VQ
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        model = VQ(image_size=32, patch_size=4, enc_type="vit_t_enc",
                   codebook_size=32, latent_dim=8, ema_decay=0.5,
                   threshold_ema_dead_code=100.0, kmeans_init=False)
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
        variables = model.init(
            {"params": jax.random.key(0), "rng": jax.random.key(1)}, x[:1])

        def step(v, x, r):
            _out, mut = model.apply(
                v, x, train=True, mutable=["codebook"], rngs={"rng": r})
            return mut["codebook"]["quantize"]["embed"]

        e1 = jax.jit(step)(variables, x, jax.random.key(7))
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        e8 = jax.jit(step)(vs, xs, jax.random.key(7))
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e8),
                                   rtol=1e-5, atol=1e-6)


class TestMultiDeviceGeneration:
    """One MaskGIT generation step under a data-sharded mesh equals the
    single-device step (generation under SPMD — serving-style sharding)."""

    def test_maskgit_step_batch_sharded(self, tiny_setup):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        model = tiny_setup
        rng = np.random.RandomState(1)
        B, n = 8, 196
        mod_dict = {
            "tok_rgb@224": {
                "tensor": jnp.asarray(rng.randint(0, 16384, (B, n)).astype(np.int32)),
                "input_mask": jnp.ones((B, n), bool),
                "target_mask": jnp.zeros((B, n), bool),
                "decoder_attention_mask": jnp.zeros((B, n), jnp.int32),
            },
            "caption": {
                "tensor": jnp.asarray(rng.randint(1, 30000, (B, 64)).astype(np.int32)),
                "input_mask": jnp.asarray(np.tile(np.arange(64) >= 8, (B, 1))),
                "target_mask": jnp.ones((B, 64), bool),
                "decoder_attention_mask": jnp.zeros((B, 64), jnp.int32),
            },
        }
        params = model.init(jax.random.key(0), tiny_batch(1, rng), 32, 32)
        sa_valid = ~np.asarray(mod_dict["tok_rgb@224"]["target_mask"])

        def fwd(p, md, sa):
            return model.apply(p, md, "tok_rgb@224", sa, 256,
                               method="forward_generation_img")

        logits1 = jax.jit(fwd)(params, mod_dict, jnp.asarray(sa_valid))

        mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
        shard_b = NamedSharding(mesh, P("data"))
        md_s = jax.tree.map(lambda x: jax.device_put(x, shard_b), mod_dict)
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        logits8 = jax.jit(fwd)(ps, md_s, jax.device_put(jnp.asarray(sa_valid), shard_b))
        np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits8),
                                   rtol=2e-4, atol=2e-4)
