"""Pretrained image-tokenizer loader (reference fourm/vq/__init__.py:8-79).

Loads a tokenizer checkpoint from any of:
  * a legacy torch ``.pth`` file (``{'model': state_dict, 'args': Namespace}``)
    — torch is only needed for this path,
  * a ``.safetensors`` file with the config embedded as YAML metadata
    (the release format, reference utils/checkpoint.py:176-192),
  * an orbax directory containing ``config.json`` + ``checkpoints/step_*``,

applies the reference's legacy argument renames (encoder_type -> enc_type,
input_size -> image_size, ...), infers the model class from the state dict
('controlnet' keys -> VQControlNet, beta_schedule -> DiVAE, else VQVAE), and
returns ``(model, variables)`` ready for ``decode_tokens`` / ``tokenize``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vqvae import VQ, DiVAE, VQVAE, VQControlNet

_RENAMES = {
    "encoder_type": "enc_type",
    "decoder_type": "dec_type",
    "quantizer_ema_decay": "ema_decay",
    "input_size_enc": "image_size_enc",
    "input_size_dec": "image_size_dec",
    "input_size_sd": "image_size_sd",
}


def _remap_args(args: Dict[str, Any], state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference vq/__init__.py:37-60 legacy arg handling, dict-based."""
    args = dict(args)
    domain = str(args.get("domain", ""))
    if any(s in domain for s in ("CLIP", "DINO", "ImageBind")):
        args["patch_proj"] = False
    elif "sam" in domain and "mask_size" in args:
        args["input_size"] = args["mask_size"]
        args["input_size_min"] = args["input_size_max"] = args["mask_size"]
    for old, new in _RENAMES.items():
        if old in args and args.get(new) is None:
            args[new] = args[old]
    if args.get("image_size") is None:
        args["image_size"] = args.get("input_size") or args.get("input_size_max")
    # channel/label inference from the state dict (reference :54-59)
    if "cls_emb.weight" in state:
        args["n_labels"], args["n_channels"] = state["cls_emb.weight"].shape
    elif "encoder.linear_in.weight" in state:
        args["n_channels"] = state["encoder.linear_in.weight"].shape[1]
    elif "encoder.proj.weight" in state:
        args["n_channels"] = state["encoder.proj.weight"].shape[1]
    return args


def _infer_model_type(args: Dict[str, Any], state: Dict[str, np.ndarray],
                      encoder_only: bool):
    if encoder_only:
        return VQ
    if any("controlnet" in k for k in state):
        return VQControlNet
    if args.get("beta_schedule") is not None:
        return DiVAE
    return VQVAE


def _filter_fields(cls, args: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    out = {}
    for k, v in args.items():
        if k in names and v is not None:
            f = next(f for f in dataclasses.fields(cls) if f.name == k)
            if "Tuple" in str(f.type) and isinstance(v, list):
                v = tuple(v)
            out[k] = v
    return out


def _init_variables(model, rngs=None):
    rngs = rngs or {"params": jax.random.key(0), "rng": jax.random.key(1)}
    S = model.image_size
    if model.n_labels is not None:
        x = jnp.zeros((1, S, S), jnp.int32)
    else:
        x = jnp.zeros((1, S, S, model.n_channels))
    if isinstance(model, VQControlNet):
        vae_down = 2 ** (len(model.vae_ch_mult) - 1)
        Sl = (model.image_size_sd or S) // vae_down
        z = jnp.zeros((1, Sl, Sl, model.latent_channels))
        t = jnp.zeros((1,), jnp.int32)
        return model.init(rngs, x, z, t, method="init_all")
    if isinstance(model, DiVAE):
        noised = jnp.zeros((1, model.image_size_dec or S, model.image_size_dec or S,
                            model.n_channels))
        t = jnp.zeros((1,), jnp.int32)
        return model.init(rngs, x, noised, t)
    return model.init(rngs, x)


def get_image_tokenizer(
    path: str,
    encoder_only: bool = False,
    verbose: bool = True,
    return_none_on_fail: bool = False,
    config_override: Optional[Dict[str, Any]] = None,
) -> Optional[Tuple[Any, Any]]:
    """Load a tokenizer checkpoint -> (flax model, variables)."""
    if return_none_on_fail and not os.path.exists(path):
        return None
    if verbose:
        print(f"Loading tokenizer {path} ... ", end="")

    state: Dict[str, np.ndarray] = {}
    args: Dict[str, Any] = {}
    orbax_dir = None
    if path.endswith(".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        args = dict(vars(ckpt["args"])) if not isinstance(ckpt["args"], dict) else dict(ckpt["args"])
        state = {k: v.float().numpy() for k, v in ckpt["model"].items()}
    elif path.endswith(".safetensors"):
        from ..utils.checkpoint import load_safetensors

        state, metadata = load_safetensors(path)
        cfg = metadata.get("config", {})
        args = dict(cfg) if isinstance(cfg, dict) else {}
    elif os.path.isdir(path):
        cfg_path = os.path.join(path, "config.json")
        with open(cfg_path) as f:
            args = json.load(f)
        orbax_dir = path
    else:
        raise ValueError(f"unsupported tokenizer checkpoint: {path}")
    if config_override:
        args.update(config_override)

    args = _remap_args(args, state)
    cls = _infer_model_type(args, state, encoder_only)
    if encoder_only:
        state = {k: v for k, v in state.items()
                 if "decoder" not in k and "post_quant_proj" not in k and "vae." not in k}
    model = cls(**_filter_fields(cls, args))
    variables = _init_variables(model)

    if orbax_dir is not None:
        from ..utils.checkpoint import latest_checkpoint_steps, load_checkpoint

        steps = latest_checkpoint_steps(os.path.join(orbax_dir, "checkpoints"))
        restored = load_checkpoint(os.path.join(orbax_dir, "checkpoints"), steps[-1],
                                   {"params": variables["params"],
                                    "codebook": variables.get("codebook")})
        variables = {**variables, **{k: v for k, v in restored.items() if v is not None}}
    elif state:
        from ..utils.checkpoint import import_vq_state_dict

        variables = import_vq_state_dict(state, variables)
    if verbose:
        print(f"done ({cls.__name__}).")
    return model, variables
