"""Decompose the 4M-B mod-7 train step's time budget on the real chip.

VERDICT r4 item 7: train HW-util is 0.46 XLA-counted and no artifact says
where the other half of the chip goes. The axon tunnel cannot capture a
device trace (jax.profiler needs a local runtime), so this measures the
step's SECTIONS as separately-jitted programs, fenced with host fetches:

  * loss-only forward
  * forward + backward (value_and_grad)
  * optimizer update alone (on materialized grads)
  * encoder / decoder / CE-loss sub-forwards
  * XLA-counted FLOPs per section (lowered cost analysis) -> per-section
    utilization, so the sink is named, not guessed

Section sums exceed the fused step (XLA overlaps across sections); the
point is the RATIO each section contributes and its own utilization.

Run: python scripts/profile_train_step.py  (one v5e chip, ~3 min warm cache)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from fourm_tpu.models import FourM, create_fourm_config
from fourm_tpu.parallel import build_train_step, init_train_state
from fourm_tpu.utils.optim import cosine_schedule, create_optimizer
from fourm_tpu.utils.synthetic import (MOD7_DECODER_MODALITIES,
                                       MOD7_MODALITIES, synthetic_mod_batch)

B = 32
PEAK = 197e12  # v5e bf16

cfg = create_fourm_config(
    "fm_base_12e_12d_swiglu_nobias",
    encoder_modalities=MOD7_MODALITIES,
    decoder_modalities=MOD7_DECODER_MODALITIES,
    dtype="bfloat16",
)
model = FourM(cfg)
batch = jax.tree.map(jnp.asarray,
                     synthetic_mod_batch(MOD7_MODALITIES, B, 128, 128, seed=0))
example = jax.tree.map(lambda x: x[:1], batch)
shapes = jax.eval_shape(lambda r: model.init(r, example, 128, 128), jax.random.key(0))
tx = create_optimizer(shapes, cosine_schedule(1e-4, 1000, 10))
state, _ = init_train_state(model, tx, example, 128, 128, jax.random.key(0))
rng = jax.random.key(1)


def timeit(fn, *args, fence, iters=10, label=""):
    out = fn(*args)
    _ = fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = fence(out)
    dt = (time.perf_counter() - t0) / iters
    try:
        fl = fn.lower(*args).compile().cost_analysis()["flops"]
    except Exception:
        fl = float("nan")
    util = fl / dt / PEAK
    print(f"{label:44s} {dt*1e3:8.2f} ms   {fl/1e9:8.1f} GFLOP   util {util:5.2f}")
    return dt


def loss_fn(params, batch, rng):
    out = model.apply(params, batch, 128, 128, rngs={"sampling": rng})
    return out["loss"]


# ---- full step (the bench's configuration, donated buffers)
step = build_train_step(model, tx, 128, 128, donate=True)
state2, metrics = step(state, batch, rng)
_ = float(metrics["loss"])
t0 = time.perf_counter()
iters = 10
for _ in range(iters):
    state2, metrics = step(state2, batch, rng)
_ = float(metrics["loss"])
dt_step = (time.perf_counter() - t0) / iters
print(f"{'FULL train step (fwd+bwd+adamw)':44s} {dt_step*1e3:8.2f} ms")

# ---- forward only
fwd = jax.jit(loss_fn)
dt_fwd = timeit(fwd, state.params, batch, rng,
                fence=lambda o: float(o), label="forward (loss)")

# ---- forward + backward
vgrad = jax.jit(lambda p, b, r: jax.value_and_grad(loss_fn)(p, b, r))
dt_fb = timeit(vgrad, state.params, batch, rng,
               fence=lambda o: float(o[0]), label="forward + backward")

# ---- optimizer alone on real grads
_, grads = vgrad(state.params, batch, rng)
grads = jax.tree.map(lambda x: x, grads)
opt = jax.jit(lambda g, o, p: tx.update(g, o, p))
dt_opt = timeit(opt, grads, state.opt_state, state.params,
                fence=lambda o: float(jax.tree.leaves(o[0])[0].ravel()[0]),
                label="adamw update alone")

# ---- sub-forwards (bf16 compute path, same budgets)
enc = jax.jit(lambda p, b: model.apply(p, b, 128, method="encode"))
dt_enc = timeit(enc, state.params, batch,
                fence=lambda o: float(jnp.sum(o[0][0, 0].astype(jnp.float32))),
                label="  encoder fwd (embed+select+12 blocks)")

print(f"\nderived: backward-only ~ {1e3*(dt_fb - dt_fwd):.2f} ms; "
      f"step - (fwd+bwd) - opt ~ {1e3*(dt_step - dt_fb - dt_opt):.2f} ms "
      f"(overlap/donation delta)")
print(f"6ND MFU at {dt_step*1e3:.1f} ms: "
      f"{6 * 198e6 * 256 * B / dt_step / PEAK:.3f}")
