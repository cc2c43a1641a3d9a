"""Benchmark: 4M-B (mod-7) training-step throughput, samples/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. Runs on whatever
jax.devices() provides (one real TPU chip under the driver). The reference
publishes no throughput numbers (SURVEY.md §6), so vs_baseline is reported
against an A100 DDP estimate once measured; until then it is null.

Will be upgraded to the BASELINE.json headline metric (RGB-to-all generation
samples/sec/chip) once the generation engine lands.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.parallel import build_train_step, init_train_state, make_mesh
    from fourm_tpu.utils.optim import cosine_schedule, create_optimizer
    from fourm_tpu.utils.synthetic import (
        MOD7_DECODER_MODALITIES,
        MOD7_MODALITIES,
        synthetic_mod_batch,
    )

    B = 32  # per-chip batch
    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, fsdp=1)

    cfg = create_fourm_config(
        "fm_base_12e_12d_swiglu_nobias",
        encoder_modalities=MOD7_MODALITIES,
        decoder_modalities=MOD7_DECODER_MODALITIES,
        dtype="bfloat16",
    )
    model = FourM(cfg)
    batch = jax.tree.map(
        jnp.asarray, synthetic_mod_batch(MOD7_MODALITIES, batch_size=B * n_dev, seed=0)
    )
    example = jax.tree.map(lambda x: x[:1], batch)
    params_shape = jax.eval_shape(lambda r: model.init(r, example, 128, 128), jax.random.key(0))
    tx = create_optimizer(params_shape, cosine_schedule(1e-4, 1000, 10), clip_grad=1.0)
    state, shardings = init_train_state(
        model, tx, example, 128, 128, jax.random.key(0), mesh=mesh
    )
    step = build_train_step(model, tx, 128, 128, mesh=mesh, state_shardings=shardings)

    # warmup / compile. NOTE: under the axon tunnel block_until_ready does not
    # wait for remote completion — a host fetch (float()) is the reliable fence.
    state, metrics = step(state, batch, jax.random.key(1))
    _ = float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.key(2 + i))
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    samples_per_sec_chip = B * n_dev * iters / dt / n_dev
    print(json.dumps({
        "metric": "4M-B mod7 train-step samples/sec/chip (bf16, 128in/128out tokens)",
        "value": round(samples_per_sec_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
