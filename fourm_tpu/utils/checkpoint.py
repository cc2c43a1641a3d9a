"""Checkpointing: Orbax for native training state, safetensors import for released
4M weights.

Native checkpoints (reference utils/checkpoint.py:91-157 + fsdp_utils.py — here a
single Orbax path covers both the DDP and FSDP cases since state is a sharded
pytree either way):
  * save_checkpoint / load_checkpoint / auto_resume (scans for the latest step)

Released-weights import (reference utils/checkpoint.py:176-192: safetensors with
the model config embedded as YAML metadata):
  * load_fourm_safetensors(path) -> (FourMConfig, flax variables)
  * torch->flax tensor conversion rules (Linear/Conv transposes, NCHW->NHWC)
  * export_fourm_torch_state(params) — the inverse mapping (round-trip tested,
    and usable for exporting back to the reference format)
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------- orbax (native)


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 3):
    """Save a training-state pytree (sharded arrays supported) at `step`."""
    import orbax.checkpoint as ocp

    path = os.path.join(ckpt_dir, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    _prune_checkpoints(ckpt_dir, keep)


def _prune_checkpoints(ckpt_dir: str, keep: int):
    steps = sorted(latest_checkpoint_steps(ckpt_dir))
    for s in steps[:-keep] if keep > 0 else []:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)


def latest_checkpoint_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def load_checkpoint(ckpt_dir: str, step: int, abstract_state):
    """Restore a checkpoint into the structure/shardings of `abstract_state`."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(
        os.path.abspath(os.path.join(ckpt_dir, f"step_{step}")), abstract_state
    )


def auto_resume(ckpt_dir: str, abstract_state):
    """Load the highest-step checkpoint if any (reference checkpoint.py:126-136
    scans for checkpoint-*.pth). Returns (state, step) or (None, 0)."""
    steps = latest_checkpoint_steps(ckpt_dir)
    if not steps:
        return None, 0
    step = steps[-1]
    return load_checkpoint(ckpt_dir, step, abstract_state), step


# ------------------------------------------------ torch <-> flax conversion


def t2j_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def t2j_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t2j_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, out, in),
    for nn.ConvTranspose(transpose_kernel=True) (gradient-of-conv semantics,
    verified against torch)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _assign(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


# FourM name mapping -----------------------------------------------------------

_BLOCK_LINEAR = {"qkv", "proj", "q", "kv", "fc1", "fc2", "fc3"}
_NORMS = {"norm1", "norm2", "query_norm", "context_norm", "q_norm", "k_norm",
          "norm_mlp"}


def _convert_block_param(parts, value):
    """Convert one parameter inside a transformer block. parts like
    ['attn', 'qkv', 'weight'] -> (('attn', 'qkv', 'kernel'), transposed)."""
    sub, leaf = parts[:-1], parts[-1]
    name = sub[-1] if sub else ""
    if leaf == "weight":
        if name in _BLOCK_LINEAR or (len(sub) >= 2 and sub[-2] == "mlp"):
            return tuple(sub) + ("kernel",), t2j_linear(value)
        if name in _NORMS or name.endswith("norm"):
            return tuple(sub) + ("weight",), value
        return tuple(sub) + ("kernel",), t2j_linear(value)
    return tuple(sub) + (leaf,), value


def import_fourm_state_dict(state_dict: Dict[str, Any], config) -> Dict:
    """Map a reference FourM torch state dict into our flax params tree.

    Handles: encoder/decoder blocks, embeddings (token/image/seq-emb), shared and
    unshared modality embeddings, mask/register tokens, tied/untied logits.
    Sin-cos positional buffers are skipped (recomputed). Returns {'params': ...}.
    """
    params: Dict = {}
    share = config.share_modality_embeddings
    for key, t in state_dict.items():
        value = _np(t)
        parts = key.split(".")
        top = parts[0]

        if top in ("encoder", "decoder") and parts[1].isdigit():
            layer = f"{top}_{parts[1]}"
            new_path, v = _convert_block_param(parts[2:], value)
            _assign(params, (layer,) + new_path, v)
        elif top in ("encoder_norm", "decoder_norm"):
            _assign(params, (top, parts[1]), value)
        elif top == "decoder_proj_context":
            v = t2j_linear(value) if parts[1] == "weight" else value
            _assign(params, (top, "kernel" if parts[1] == "weight" else parts[1]), v)
        elif top == "mask_token":
            _assign(params, ("mask_token",), value.reshape(-1))
        elif top == "register_tokens":
            _assign(params, ("register_tokens",), value.reshape(value.shape[-2], value.shape[-1]))
        elif top in ("encoder_embeddings", "decoder_embeddings"):
            mod = parts[1]
            rest = parts[2:]
            prefix = f"{top}_{mod}"
            if rest[0] == "mod_emb":
                if top == "encoder_embeddings" or share:
                    _assign(params, (f"mod_emb_{mod}",), value.reshape(-1))
                else:
                    _assign(params, (f"dec_mod_emb_{mod}",), value.reshape(-1))
            elif rest[0] == "token_emb":
                _assign(params, (prefix, "token_emb", "embedding"), value)
            elif rest[0] == "to_logits":
                _assign(params, (prefix, "to_logits", "kernel"), t2j_linear(value))
            elif rest[0] == "pos_emb":
                # learnable pos emb (1, N, D) -> (N, D); sincos buffers absent
                _assign(params, (prefix, "pos_emb"), value.reshape(value.shape[-2], value.shape[-1]))
            elif rest[0] == "proj":
                v = t2j_linear(value) if rest[1] == "weight" else value
                _assign(params, (prefix, "proj", "kernel" if rest[1] == "weight" else rest[1]), v)
            elif rest[0] == "emb_proj":
                if len(rest) == 3 and rest[1].isdigit():  # bottleneck Sequential
                    v = t2j_linear(value) if rest[2] == "weight" else value
                    _assign(params, (prefix, f"emb_proj_{rest[1]}",
                                     "kernel" if rest[2] == "weight" else rest[2]), v)
                else:
                    v = t2j_linear(value) if rest[1] == "weight" else value
                    _assign(params, (prefix, "emb_proj",
                                     "kernel" if rest[1] == "weight" else rest[1]), v)
            else:
                raise KeyError(f"unhandled embedding param {key}")
        else:
            raise KeyError(f"unhandled FourM param {key}")
    return {"params": params}


def export_fourm_torch_state(variables, config) -> Dict[str, np.ndarray]:
    """Inverse of import_fourm_state_dict (reference-format torch state dict)."""
    out: Dict[str, np.ndarray] = {}
    params = variables["params"]

    def j2t_linear(k):
        return np.ascontiguousarray(np.asarray(k).T)

    def walk_block(prefix_t, tree):
        for name, sub in tree.items():
            if isinstance(sub, dict):
                walk_block(f"{prefix_t}.{name}", sub)
            else:
                arr = np.asarray(sub)
                if name == "kernel":
                    out[f"{prefix_t}.weight"] = j2t_linear(arr)
                elif name == "embedding":
                    out[f"{prefix_t}.weight"] = arr
                else:
                    out[f"{prefix_t}.{name}"] = arr

    for key, val in params.items():
        if re.fullmatch(r"(encoder|decoder)_\d+", key):
            top, idx = key.rsplit("_", 1)
            walk_block(f"{top}.{idx}", val)
        elif key in ("encoder_norm", "decoder_norm", "decoder_proj_context"):
            walk_block(key, val)
        elif key == "mask_token":
            out["mask_token"] = np.asarray(val).reshape(1, 1, -1)
        elif key == "register_tokens":
            out["register_tokens"] = np.asarray(val)[None]
        elif key.startswith("mod_emb_"):
            mod = key[len("mod_emb_"):]
            arr = np.asarray(val).reshape(1, 1, -1)
            if mod in config.encoder_modalities:
                out[f"encoder_embeddings.{mod}.mod_emb"] = arr
            if config.share_modality_embeddings and mod in config.decoder_modalities:
                out[f"decoder_embeddings.{mod}.mod_emb"] = arr
        elif key.startswith("dec_mod_emb_"):
            mod = key[len("dec_mod_emb_"):]
            out[f"decoder_embeddings.{mod}.mod_emb"] = np.asarray(val).reshape(1, 1, -1)
        elif key.startswith("encoder_embeddings_") or key.startswith("decoder_embeddings_"):
            top = "encoder_embeddings" if key.startswith("encoder_embeddings_") else "decoder_embeddings"
            mod = key[len(top) + 1:]
            for name, sub in val.items():
                if name == "pos_emb":
                    out[f"{top}.{mod}.pos_emb"] = np.asarray(sub)[None]
                elif isinstance(sub, dict):
                    walk_block(f"{top}.{mod}.{name}", sub)
                else:
                    out[f"{top}.{mod}.{name}"] = np.asarray(sub)
        else:
            raise KeyError(f"unhandled export param {key}")
    return out


# ----------------------------------------------------------- safetensors load


def load_safetensors(path: str, return_metadata: bool = True):
    """Load a safetensors file + its parsed YAML metadata header
    (reference checkpoint.py:176-192)."""
    from safetensors.numpy import load_file
    import yaml

    tensors = load_file(path)
    if not return_metadata:
        return tensors
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n))
    metadata = header.get("__metadata__", {})
    parsed = {}
    for k, v in metadata.items():
        if isinstance(v, str) and len(v) < 10_000:
            try:
                parsed[k] = yaml.safe_load(v.replace("None", "null"))
            except yaml.YAMLError:
                parsed[k] = v
        else:
            parsed[k] = v
    return tensors, parsed


_ACT_MAP = {"GELU": "gelu", "SiLU": "silu", "ReLU": "relu"}


def fourm_config_from_metadata(cfg: Dict[str, Any]):
    """Build a FourMConfig from the reference FM config dict (reference
    fm.py:783-831: domains_in/domains_out + architecture keys)."""
    from ..models.fourm import FourMConfig

    return FourMConfig(
        encoder_modalities=tuple(cfg["domains_in"]),
        decoder_modalities=tuple(cfg["domains_out"]),
        dim=cfg.get("dim", 768),
        encoder_depth=cfg.get("encoder_depth", 12),
        decoder_depth=cfg.get("decoder_depth", 12),
        num_heads=cfg.get("num_heads", 12),
        mlp_ratio=cfg.get("mlp_ratio", 4.0),
        qkv_bias=cfg.get("qkv_bias", True),
        proj_bias=cfg.get("proj_bias", True),
        mlp_bias=cfg.get("mlp_bias", True),
        norm_bias=cfg.get("norm_bias", True),
        act=_ACT_MAP.get(cfg.get("act_layer", "GELU"), "gelu"),
        gated_mlp=cfg.get("gated_mlp", False),
        qk_norm=cfg.get("qk_norm", False),
        decoder_sep_mask=cfg.get("decoder_sep_mask", True),
        decoder_causal_mask=cfg.get("decoder_causal_mask", False),
        num_register_tokens=cfg.get("num_register_tokens", 0),
        share_modality_embeddings=cfg.get("share_modality_embeddings", True),
        decoder_share_embedding=False,  # HF releases untie logits (fm.py:813-815)
    )


def load_fourm_safetensors(path: str, config_override: Optional[Dict] = None):
    """Load a released 4M safetensors checkpoint -> (FourMConfig, variables).

    `path` may also be a Hugging Face Hub id (e.g. "EPFL-VILAB/4M-21_B"): the
    model.safetensors file is downloaded via huggingface_hub (the reference FM
    wrapper inherits PyTorchModelHubMixin for the same purpose, fm.py:783-831).
    Requires network access; local files need none.
    """
    if not os.path.exists(path) and not path.endswith(".safetensors") and "/" in path:
        from huggingface_hub import hf_hub_download

        path = hf_hub_download(repo_id=path, filename="model.safetensors")
    tensors, metadata = load_safetensors(path)
    cfg_dict = dict(metadata.get("config", {}))
    if config_override:
        cfg_dict.update(config_override)
    config = fourm_config_from_metadata(cfg_dict)
    variables = import_fourm_state_dict(tensors, config)
    return config, variables


# ------------------------------------------------ VQ tokenizer import/export

_VQ_SEG_MAP = [
    (re.compile(r"^blocks_(\d+)$"), lambda m: f"blocks.{m.group(1)}"),
    (re.compile(r"^mid_block_(\d+)$"), lambda m: f"mid_block.{m.group(1)}"),
    (re.compile(r"^down_(\d+)_resnet_(\d+)$"), lambda m: f"down_blocks.{m.group(1)}.resnets.{m.group(2)}"),
    (re.compile(r"^down_(\d+)_downsample$"), lambda m: f"down_blocks.{m.group(1)}.downsamplers.0"),
    (re.compile(r"^up_(\d+)_resnet_(\d+)$"), lambda m: f"up_blocks.{m.group(1)}.resnets.{m.group(2)}"),
    (re.compile(r"^up_(\d+)_upsample$"), lambda m: f"up_blocks.{m.group(1)}.upsamplers.0"),
    (re.compile(r"^out_conv_(\d+)$"), lambda m: f"out_conv.{m.group(1)}"),
    (re.compile(r"^mlp_fc(\d)$"), lambda m: f"mlp.fc{m.group(1)}"),
    (re.compile(r"^xattn_(q|kv|proj)$"), lambda m: f"cross_attn.{m.group(1)}"),
    (re.compile(r"^emb_proj_(\d)$"), lambda m: f"emb_proj.{m.group(1)}"),
    (re.compile(r"^block_(\d)$"), lambda m: f"block.{m.group(1)}"),
    (re.compile(r"^blocks_(\d+)\b"), lambda m: f"blocks.{m.group(1)}"),
    (re.compile(r"^layernorms_(\d+)$"), lambda m: f"layernorms.{m.group(1)}"),
    (re.compile(r"^layers_(\d+)$"), lambda m: f"layers.{m.group(1)}"),
]


def _vq_torch_name(flax_path: list) -> str:
    """Map a flax VQ param path to the reference torch dotted name."""
    segs = []
    for seg in flax_path:
        for pat, repl in _VQ_SEG_MAP:
            m = pat.match(seg)
            if m:
                seg = repl(m)
                break
        segs.append(seg)
    name = ".".join(segs)
    # leaf renames
    name = re.sub(r"\.kernel$", ".weight", name)
    name = re.sub(r"\.embedding$", ".weight", name)
    name = re.sub(r"\.scale$", ".weight", name)  # flax nn.LayerNorm/GroupNorm
    return name


def export_vq_torch_state(variables) -> Dict[str, np.ndarray]:
    """Export a VQ/VQVAE/DiVAE variables tree to a reference-format torch state
    dict (inverse-mapped names, transposed kernels)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k])
                continue
            arr = np.asarray(v, dtype=np.float32)
            name = _vq_torch_name(path + [k])
            if k == "kernel":
                if arr.ndim == 2:
                    arr = np.ascontiguousarray(arr.T)
                elif arr.ndim == 4 and path[-1] == "conv_out":
                    # ConvTranspose (kh, kw, out, in) -> (in, out, kh, kw)
                    arr = np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
                elif arr.ndim == 4:
                    arr = np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
            out[name] = arr

    walk(variables["params"], [])
    cb = variables.get("codebook", {})
    # nested module path: quantize codebook state (reference quantize._codebook.*)
    def walk_cb(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk_cb(v, path + [k])
            else:
                prefix = ".".join(path) if path else "quantize"
                out[f"{prefix}._codebook.{k}"] = np.asarray(v, dtype=np.float32)

    walk_cb(cb, [])
    return out


def import_vq_state_dict(state_dict: Dict[str, Any], variables) -> Dict:
    """Import a reference VQ torch state dict into the structure of `variables`
    (from model.init). Keys absent from the state dict (e.g. sincos pos_emb
    buffers) keep their initialized values."""
    state = {k: _np(v) for k, v in state_dict.items()}
    missing = []

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + [k])
                continue
            name = _vq_torch_name(path + [k])
            if name not in state:
                if "pos_emb" in name or name.endswith("initted"):
                    out[k] = v
                    continue
                missing.append(name)
                out[k] = v
                continue
            arr = state[name]
            if k == "kernel":
                if np.ndim(arr) == 2:
                    arr = np.ascontiguousarray(arr.T)
                elif np.ndim(arr) == 4:
                    # both Conv (out,in,kh,kw)->(kh,kw,in,out) and ConvTranspose
                    # (in,out,kh,kw)->(kh,kw,out,in) are the same permutation
                    arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
            out[k] = jnp.asarray(arr).astype(v.dtype).reshape(v.shape)
        return out

    params = walk(variables["params"], [])
    result = {"params": params}
    if "codebook" in variables:
        cb = {}
        def walk_cb(tree, path):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = walk_cb(v, path + [k])
                    continue
                prefix = ".".join(path) if path else "quantize"
                name = f"{prefix}._codebook.{k}"
                out[k] = jnp.asarray(state[name]).reshape(v.shape) if name in state else v
            return out
        result["codebook"] = walk_cb(variables["codebook"], [])
    if missing:
        print(f"[vq import] {len(missing)} params not found in state dict, kept init: "
              f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
    return result


def export_vq_safetensors(variables, config: Dict[str, Any], path: str):
    """Write a tokenizer checkpoint in the release format: reference-style torch
    names + the model config embedded as YAML metadata (reference
    checkpoint.py:176-192). Loadable by vq.get_image_tokenizer."""
    import yaml
    from safetensors.numpy import save_file

    tensors = export_vq_torch_state(variables)
    save_file(tensors, path, metadata={"config": yaml.safe_dump(dict(config))})


def load_vq_safetensors(path: str, model, example_input, rngs=None):
    """Load a released tokenizer safetensors checkpoint into a VQ/VQVAE/DiVAE model.
    Returns (config_metadata, variables)."""
    import jax

    tensors, metadata = load_safetensors(path)
    rngs = rngs or {"params": jax.random.key(0), "rng": jax.random.key(1)}
    variables = model.init(rngs, example_input)
    return metadata.get("config", {}), import_vq_state_dict(tensors, variables)
