#!/usr/bin/env python
"""Tensor-parallel serving microbenchmark (VERDICT round 1, item 10 / ROUND_NOTES
gap #7): shard a 4M model over a (data=1, fsdp=1, tensor=N) mesh with megatron
qkv/mlp rules + activation sharding constraints, and measure the MaskGIT-style
full-grid decode step (forward_generation_img — the serving hot loop).

Run on real chips:      python benchmarks/tp_serving_bench.py --model fm_xlarge_24e_24d_swiglu_qknorm_nobias
Validate on CPU mesh:   python benchmarks/tp_serving_bench.py --cpu 8 --model fm_tiny_6e_6d_gelu
Prints one JSON line: tokens/sec + per-device parameter bytes (must shrink ~1/N).
"""

import argparse
import json
import os
import sys
import time

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="fm_xlarge_24e_24d_swiglu_qknorm_nobias")
    ap.add_argument("--tensor", type=int, default=-1, help="tensor axis size (default: all devices)")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", type=int, default=0, help="use N virtual CPU devices")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    import jax.numpy as jnp
    import numpy as np

    from fourm_tpu.models import FourM, create_fourm_config
    from fourm_tpu.ops.transformer import set_activation_sharder
    from fourm_tpu.parallel.mesh import activation_sharder, make_mesh, model_shardings, replicated
    from fourm_tpu.utils.synthetic import synthetic_mod_batch

    n_dev = len(jax.devices())
    tensor = args.tensor if args.tensor > 0 else n_dev
    mesh = make_mesh(data=1, fsdp=n_dev // tensor, tensor=tensor)
    mods = ("tok_rgb@224", "caption")
    cfg = create_fourm_config(args.model, mods, mods,
                              dtype="bfloat16" if not args.cpu else "float32")
    model = FourM(cfg)

    batch = jax.tree.map(
        jnp.asarray, synthetic_mod_batch(mods, args.batch_size, 196, 196, seed=0))
    example = jax.tree.map(lambda x: x[:1], batch)
    shapes = jax.eval_shape(lambda r: model.init(r, example, 196, 196), jax.random.key(0))
    shardings = model_shardings(mesh, shapes)
    params = jax.jit(
        lambda r: model.init(r, example, 196, 196), out_shardings=shardings
    )(jax.random.key(0))

    # per-device parameter bytes: with the tensor axis active this must be
    # ~1/tensor of the replicated footprint for the sharded matrices
    total_bytes = sum(np.prod(p.shape) * p.dtype.itemsize
                      for p in jax.tree_util.tree_leaves(params))
    per_dev = sum(p.addressable_shards[0].data.nbytes
                  for p in jax.tree_util.tree_leaves(params))
    target = mods[0]
    sa_valid = jnp.ones((args.batch_size, 196), bool)

    def fwd(params, batch):
        return model.apply(params, batch, target, sa_valid,
                           method="forward_generation_img")

    token = set_activation_sharder(activation_sharder(mesh))
    jfwd = jax.jit(fwd, in_shardings=(shardings, replicated(mesh)),
                   out_shardings=replicated(mesh))
    out = jfwd(params, batch)
    _ = np.asarray(out)  # fence (block_until_ready unreliable under axon tunnel)
    t0 = time.time()
    for _ in range(args.iters):
        out = jfwd(params, batch)
    _ = np.asarray(out)
    dt = (time.time() - t0) / args.iters

    tokens_per_sec = args.batch_size * 196 / dt
    print(json.dumps({
        "metric": f"TP serving decode step tokens/sec ({args.model}, tensor={tensor})",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/sec",
        "step_ms": round(dt * 1000, 2),
        "param_bytes_total": int(total_bytes),
        "param_bytes_per_device": int(per_dev),
        "shrink_factor": round(total_bytes / max(per_dev, 1), 2),
    }))


if __name__ == "__main__":
    main()
