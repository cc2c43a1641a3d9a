"""SPMD training step builder.

TPU-native replacement for the reference DDP/FSDP training loops
(run_training_4m.py:676-795, run_training_4m_fsdp.py:516-555): one jitted function
over a (data, fsdp, tensor) mesh. Gradient all-reduce, parameter all-gather and
optimizer-state sharding are all expressed as shardings; XLA inserts the ICI/DCN
collectives (no NCCL analogue needed). Gradient accumulation is a `lax.scan` over
microbatches (the pjit analogue of DDP no_sync accumulation, run_training_4m.py:721).

bf16 policy: params and optimizer state stay fp32; the model computes in bf16 when
configured (FourMConfig.dtype), gradients are accumulated in fp32 — matching the
reference's AMP-with-fp32-master-weights setup without a loss scaler (bf16 needs none).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, params_shardings, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_train_state(
    model,
    tx: optax.GradientTransformation,
    example_batch,
    num_encoder_tokens: int,
    num_decoder_tokens: int,
    rng: jax.Array,
    mesh: Optional[Mesh] = None,
) -> Tuple[TrainState, Optional[Any]]:
    """Initialize params + optimizer state, optionally sharded over a mesh.

    With a mesh, init runs inside jit with output shardings so the fp32 master
    params are *born sharded* (no host-memory spike for XL-scale models).
    """
    def _init(rng):
        params = model.init(rng, example_batch, num_encoder_tokens, num_decoder_tokens)
        opt_state = tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

    if mesh is None:
        return _init(rng), None

    from .mesh import model_shardings

    shapes = jax.eval_shape(_init, rng)
    shardings = model_shardings(mesh, shapes)
    state = jax.jit(_init, out_shardings=shardings)(rng)
    return state, shardings


def frozen_trunk_mask(params) -> Any:
    """Trainable mask for the frozen-trunk warm-start phase (reference
    run_training_4m.py:522-529 + fm.py:762-776 freeze_shared_params): encoder/
    decoder blocks and final norms are frozen; embeddings, modality embeddings,
    mask token, and decoder context projection stay trainable.

    Returns a pytree of float32 {0., 1.} matching `params`.
    """
    import re

    def is_frozen(path) -> bool:
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "params" and len(path) > 1:
            top = path[1].key if hasattr(path[1], "key") else str(path[1])
        return bool(re.fullmatch(r"(encoder|decoder)_\d+", top)) or top in (
            "encoder_norm", "decoder_norm",
        )

    return jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.zeros((), jnp.float32) if is_frozen(path) else jnp.ones((), jnp.float32),
        params,
    )


def build_train_step(
    model,
    tx: optax.GradientTransformation,
    num_encoder_tokens: int,
    num_decoder_tokens: int,
    loss_type: str = "mod",
    grad_accum_steps: int = 1,
    mesh: Optional[Mesh] = None,
    state_shardings=None,
    donate: bool = True,
    trainable_mask=None,
    fused_attention: Optional[bool] = None,
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Build the jitted train step.

    batch layout: {mod: {key: array}} with leading batch axis; when
    grad_accum_steps > 1, the leading axis is (accum, micro_batch, ...).

    trainable_mask: optional pytree of {0., 1.} matching params. Frozen params
    (0.) receive zero gradient AND zero update, so their values, Adam moments
    and weight decay are all untouched — exactly torch's requires_grad=False
    behavior in the reference's frozen warm-start phase.

    fused_attention: route attention through the differentiable fused Pallas
    pair (kernels/attention_bwd.py; loss/grad parity vs the XLA path is
    tested). Default OFF: at the 4M training shapes (N=128-256) XLA's fused
    attention is faster than the custom-call pair (measured 78.9 vs 86.5
    ms/step on v5e — the (B, H, N, Dh) custom-call operands force layout
    materializations XLA otherwise fuses away); the kernels remain available
    for long-sequence fine-tuning where the (N, M) logits no longer fit
    registers/VMEM via XLA fusion. Never used under a mesh (pallas custom
    calls are not auto-partitioned by pjit).
    """
    if fused_attention is None:
        fused_attention = False
    if mesh is not None:
        fused_attention = False
    # Fused single-pass AdamW (kernels/fused_adamw.py): one in-place Pallas
    # pass per leaf instead of the optax update()/apply_updates() pair.
    # Single-chip only (pallas custom calls aren't auto-partitioned by pjit)
    # and bit-matches optax, so the frozen-mask path keeps the explicit chain.
    use_fused_opt = (mesh is None and trainable_mask is None
                     and hasattr(tx, "fused_apply"))

    def loss_fn(params, batch, rng):
        from ..ops.transformer import use_fused_train_attention

        with use_fused_train_attention(fused_attention):
            loss, (mod_loss, mod_count) = model.apply(
                params, batch, num_encoder_tokens, num_decoder_tokens,
                loss_type=loss_type, deterministic=False, rngs={"dropout": rng},
            )
        return loss, (mod_loss, mod_count)

    def step_fn(state: TrainState, batch, rng: jax.Array):
        if grad_accum_steps == 1:
            (loss, (mod_loss, mod_count)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
        else:
            def micro(carry, xs):
                grads_acc, loss_acc = carry
                mb, r = xs
                (l, _aux), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params, mb, r)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, loss_acc + l), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, grad_accum_steps)
            (grads, loss), _ = jax.lax.scan(micro, (zero_grads, 0.0), (batch, rngs))
            grads = jax.tree.map(lambda g: g / grad_accum_steps, grads)
            loss = loss / grad_accum_steps
            mod_loss, mod_count = {}, {}

        if trainable_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, trainable_mask)
        if use_fused_opt:
            new_params, new_opt_state = tx.fused_apply(
                grads, state.opt_state, state.params)
        else:
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            if trainable_mask is not None:
                updates = jax.tree.map(lambda u, m: u * m, updates, trainable_mask)
            new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            **{f"loss_{m}": v for m, v in mod_loss.items()},
        }
        return TrainState(step=state.step + 1, params=new_params, opt_state=new_opt_state), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_shardings, bsh, rep),
        out_shardings=(state_shardings, rep),
        donate_argnums=(0,) if donate else (),
    )
    if mesh.shape.get("tensor", 1) > 1:
        # install the tensor-parallel activation constraints while tracing
        from ..ops.transformer import reset_activation_sharder, set_activation_sharder
        from .mesh import activation_sharder

        sharder = activation_sharder(mesh)

        def wrapped(state, batch, rng):
            token = set_activation_sharder(sharder)
            try:
                return jitted(state, batch, rng)
            finally:
                reset_activation_sharder(token)

        return wrapped
    return jitted
