"""FourMSampler: the one-class public generation API (Demo4MSampler equivalent).

Re-implements reference fourm/demo_4M_sampler.py:29-447: holds a 4M model (+
optional super-resolution model), all tokenizers and the text tokenizer, builds
chained generation schedules from per-modality defaults, generates, and decodes.

Usage:
    sampler = FourMSampler(fm=(model, variables), tokenizers=..., text_tokenizer=...)
    out = sampler(sample={'rgb@224': img_nhwc}, cond_domains=['rgb@224'],
                  target_domains=['tok_rgb@224', 'caption'], seed=0)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from .data.modality_info import MODALITY_INFO
from .generate import (
    GenerationSampler,
    build_chained_generation_schedules,
    custom_text,
    expand_to_batch,
    init_empty_target_modality,
    init_full_input_modality,
)
from .generate.schedules import continue_token_schedule
from .utils.decoding import TokenizerBundle, decode_dict

# Default chained generation order (reference demo_4M_sampler.py:29-39)
DEFAULT_ORDER = [
    "tok_clip@224", "tok_dinov2@224", "tok_imagebind@224", "tok_depth@224",
    "tok_normal@224", "tok_semseg@224", "tok_canny_edge@224", "tok_sam_edge@224",
    "tok_rgb@224", "caption", "det", "human_poses", "sam_instance",
    "color_palette", "metadata",
]
DEFAULT_ORDER_SR = [
    "tok_clip@448", "tok_depth@448", "tok_normal@448", "tok_semseg@448", "tok_rgb@448",
]


def _expand_defaults(d: Dict[str, Dict]) -> Dict[str, Dict]:
    out = {}
    for ks, v in d.items():
        for k in ks.split("/"):
            out[k] = v
    return out


# (reference demo_4M_sampler.py:42-136)
DEFAULTS_RGB2X = _expand_defaults({
    "tok_clip@224/tok_depth@224/tok_normal@224/tok_semseg@224/tok_canny_edge@224/tok_sam_edge@224": {
        "tokens_per_target": 196, "autoregression_scheme": "roar", "decoding_steps": 1,
        "token_decoding_schedule": "linear", "temp": 0.01, "temp_schedule": "constant",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
    "tok_dinov2@224/tok_imagebind@224": {
        "tokens_per_target": 256, "autoregression_scheme": "roar", "decoding_steps": 1,
        "token_decoding_schedule": "linear", "temp": 0.01, "temp_schedule": "constant",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
    # global-embedding tokens (retrieval, reference notebooks/retrieval_4M-21)
    "tok_dinov2_global/tok_imagebind_global": {
        "tokens_per_target": 16, "autoregression_scheme": "roar", "decoding_steps": 1,
        "token_decoding_schedule": "linear", "temp": 0.01, "temp_schedule": "constant",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
    "caption/det": {
        "tokens_per_target": 256, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.3,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "human_poses": {
        "tokens_per_target": 275, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.1,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "sam_instance": {
        "tokens_per_target": 256, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.01,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "color_palette": {
        "tokens_per_target": 23, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.1,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "metadata": {
        "tokens_per_target": 40, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.1,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
})

DEFAULTS_X2RGB = _expand_defaults({
    "tok_clip@224": {
        "tokens_per_target": 196, "autoregression_scheme": "roar", "decoding_steps": 50,
        "token_decoding_schedule": "linear", "temp": 5.0, "temp_schedule": "onex:0.5:0.5",
        "cfg_scale": 3.0, "cfg_schedule": "constant",
    },
    "tok_dinov2@224/tok_imagebind@224": {
        "tokens_per_target": 256, "autoregression_scheme": "roar", "decoding_steps": 8,
        "token_decoding_schedule": "linear", "temp": 0.01, "temp_schedule": "constant",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
    "tok_dinov2_global/tok_imagebind_global": {
        "tokens_per_target": 16, "autoregression_scheme": "roar", "decoding_steps": 1,
        "token_decoding_schedule": "linear", "temp": 0.01, "temp_schedule": "constant",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
    "tok_depth@224/tok_normal@224/tok_semseg@224/tok_canny_edge@224/tok_sam_edge@224": {
        "tokens_per_target": 196, "autoregression_scheme": "roar", "decoding_steps": 8,
        "token_decoding_schedule": "linear", "temp": 3.0, "temp_schedule": "onex:0.5:0.5",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
    "tok_rgb@224": {
        "tokens_per_target": 196, "autoregression_scheme": "roar", "decoding_steps": 25,
        "token_decoding_schedule": "linear", "temp": 3.0, "temp_schedule": "onex:0.5:0.5",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
    "caption/det": {
        "tokens_per_target": 256, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.3,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "human_poses": {
        "tokens_per_target": 275, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.1,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "sam_instance": {
        "tokens_per_target": 256, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.01,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "color_palette": {
        "tokens_per_target": 23, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.1,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
    "metadata": {
        "tokens_per_target": 40, "autoregression_scheme": "autoregressive",
        "decoding_steps": None, "token_decoding_schedule": None, "temp": 0.1,
        "temp_schedule": "constant", "cfg_scale": 1.0, "cfg_schedule": "constant",
    },
})

DEFAULTS_SR = _expand_defaults({
    "tok_clip@448/tok_depth@448/tok_normal@448/tok_semseg@448/tok_rgb@448": {
        "tokens_per_target": 784, "autoregression_scheme": "maskgit", "decoding_steps": 8,
        "token_decoding_schedule": "cosine", "temp": 1.0, "temp_schedule": "constant",
        "cfg_scale": 2.0, "cfg_schedule": "constant",
    },
})


class FourMSampler:
    """High-level chained any-to-any generation (reference Demo4MSampler,
    demo_4M_sampler.py:202-447)."""

    def __init__(
        self,
        fm: Tuple[Any, Any],  # (FourM model, variables)
        fm_sr: Optional[Tuple[Any, Any]] = None,
        tokenizers: Optional[Dict[str, TokenizerBundle]] = None,
        text_tokenizer=None,
        mods: Optional[List[str]] = None,
        mods_sr: Optional[List[str]] = None,
        top_k: float = 0.0,
        top_p: float = 0.0,
        kv_quant: Optional[str] = None,
    ):
        self.model, self.variables = fm
        self.sampler = GenerationSampler(
            self.model, self.variables, text_tokenizer, top_k=top_k, top_p=top_p,
            kv_quant=kv_quant,
        )
        if fm_sr is not None:
            self.model_sr, self.variables_sr = fm_sr
            self.sampler_sr = GenerationSampler(
                self.model_sr, self.variables_sr, text_tokenizer, top_k=top_k,
                top_p=top_p, kv_quant=kv_quant,
            )
        else:
            self.sampler_sr = None
        self.tokenizers = tokenizers or {}
        self.text_tokenizer = text_tokenizer
        self.mods = mods
        self.mods_sr = mods_sr

    # ------------------------------------------------------------- schedules

    def _ordered_targets(self, target_domains, order):
        """Stable default ordering; targets outside the default order (e.g. the
        global-embedding retrieval tokens) are kept, appended at the end."""
        ordered = [m for m in order if m in target_domains]
        return ordered + [m for m in target_domains if m not in ordered]

    def resolve_defaults(self, cond_domains: List[str]) -> Dict[str, Dict]:
        """Per-modality schedule defaults for this conditioning side
        (demo_4M_sampler.py:42-136), with the @448 SR entries merged in."""
        defaults = (
            DEFAULTS_RGB2X
            if any(d.startswith("rgb") or d.startswith("tok_rgb") for d in cond_domains)
            else DEFAULTS_X2RGB
        )
        return {**defaults, **DEFAULTS_SR}

    def build_schedule(self, cond_domains: List[str], target_domains: List[str],
                       defaults: Optional[Dict] = None, cfg_grow_conditioning: bool = True):
        """Assemble a chained schedule from per-modality defaults
        (reference __setup_sample_and_schedule, demo_4M_sampler.py:304-404)."""
        if defaults is None:
            defaults = self.resolve_defaults(cond_domains)
        targets = self._ordered_targets(target_domains, DEFAULT_ORDER + DEFAULT_ORDER_SR)
        cols = {k: [] for k in [
            "tokens_per_target", "autoregression_scheme", "decoding_steps",
            "token_decoding_schedule", "temp", "temp_schedule", "cfg_scale", "cfg_schedule",
        ]}
        for t in targets:
            d = defaults[t]
            for k in cols:
                cols[k].append(d[k])
        return build_chained_generation_schedules(
            cond_domains=list(cond_domains), target_domains=targets,
            tokens_per_target=cols["tokens_per_target"],
            autoregression_schemes=cols["autoregression_scheme"],
            decoding_steps=cols["decoding_steps"],
            token_decoding_schedules=cols["token_decoding_schedule"],
            temps=cols["temp"], temp_schedules=cols["temp_schedule"],
            cfg_scales=cols["cfg_scale"], cfg_schedules=cols["cfg_schedule"],
            cfg_grow_conditioning=cfg_grow_conditioning,
            modality_info=MODALITY_INFO,
        )

    # ------------------------------------------------------------- sampling

    def prepare_sample(self, sample: Dict[str, Any], cond_domains: List[str],
                       target_domains: List[str], batch_size: int = 1,
                       text_prompts: Optional[Dict[str, str]] = None) -> Dict:
        """Wrap raw conditioning values into full mod dicts + empty targets."""
        mod_dict: Dict[str, Dict] = {}
        for mod in cond_domains:
            value = sample[mod]
            if isinstance(value, dict):
                mod_dict[mod] = dict(value)
            elif MODALITY_INFO[mod].type in ("seq", "seq_token") and isinstance(value, str):
                custom_text(mod_dict, value, "[EOS]", mod, self.text_tokenizer)
                # conditioning-only: whole sequence is input
                init_full_input_modality(mod_dict, mod)
                continue
            else:
                arr = np.array(value)  # copy: init helpers mutate in place
                if arr.ndim == 3:  # unbatched image / tokens
                    arr = arr[None]
                elif arr.ndim == 1:
                    arr = arr[None]
                mod_dict[mod] = {"tensor": arr}
            init_full_input_modality(mod_dict, mod)
        for mod in self._ordered_targets(target_domains, DEFAULT_ORDER + DEFAULT_ORDER_SR):
            init_empty_target_modality(
                mod_dict, mod, batch_size, MODALITY_INFO[mod].resolved_max_tokens()
            )
        return expand_to_batch(mod_dict, batch_size)

    def generate(self, mod_dict, schedule, seed: Optional[int] = None):
        return self.sampler.generate(mod_dict, schedule, seed=seed,
                                     text_tokenizer=self.text_tokenizer)

    def decode(self, mod_dict, image_size: int = 224, decoding_steps: int = 25,
               seed: Optional[int] = None, keys: Optional[Sequence[str]] = None):
        sub = {k: v for k, v in mod_dict.items() if keys is None or k in keys}
        return decode_dict(
            sub, self.tokenizers, self.text_tokenizer, image_size=image_size,
            decoding_steps=decoding_steps, seed=seed,
        )

    def __call__(self, sample: Dict[str, Any], cond_domains: List[str],
                 target_domains: List[str], seed: Optional[int] = None,
                 batch_size: int = 1, decoding_steps: int = 25,
                 perform_sr: bool = False):
        """Condition -> chained generation -> decoded outputs
        (reference Demo4MSampler.forward, demo_4M_sampler.py:405-447)."""
        mod_dict = self.prepare_sample(sample, cond_domains, target_domains, batch_size)
        schedule = self.build_schedule(cond_domains, target_domains)
        out = self.generate(mod_dict, schedule, seed=seed)

        if perform_sr and self.sampler_sr is not None:
            out = self.super_resolve(out, seed=seed)
        return self.decode(out, decoding_steps=decoding_steps, seed=seed,
                           keys=[m for m in out if m in target_domains or perform_sr])

    def super_resolve(self, mod_dict, seed: Optional[int] = None):
        """224 -> 448 super-resolution chaining (reference demo_4M_sampler.py:426-439):
        the 224 tokens condition the SR model to produce @448 tokens."""
        sr_conds = [m for m in mod_dict if m.endswith("@224")]
        sr_targets = [m for m in DEFAULT_ORDER_SR if m.replace("@448", "@224") in mod_dict]
        # init helpers mutate numpy arrays in place
        sr_dict = {m: {k: np.array(v) for k, v in mod_dict[m].items()} for m in sr_conds}
        B = next(iter(sr_dict.values()))["tensor"].shape[0]
        for mod in sr_targets:
            init_empty_target_modality(sr_dict, mod, B, MODALITY_INFO[mod].resolved_max_tokens())
        for mod in sr_conds:
            init_full_input_modality(sr_dict, mod)
        targets = [m for m in DEFAULT_ORDER_SR if m in sr_targets]
        cols = {k: [] for k in [
            "tokens_per_target", "autoregression_scheme", "decoding_steps",
            "token_decoding_schedule", "temp", "temp_schedule", "cfg_scale", "cfg_schedule",
        ]}
        for t in targets:
            d = DEFAULTS_SR[t]
            for k in cols:
                cols[k].append(d[k])
        schedule = build_chained_generation_schedules(
            cond_domains=sr_conds, target_domains=targets,
            tokens_per_target=cols["tokens_per_target"],
            autoregression_schemes=cols["autoregression_scheme"],
            decoding_steps=cols["decoding_steps"],
            token_decoding_schedules=cols["token_decoding_schedule"],
            temps=cols["temp"], temp_schedules=cols["temp_schedule"],
            cfg_scales=cols["cfg_scale"], cfg_schedules=cols["cfg_schedule"],
            cfg_grow_conditioning=True, modality_info=MODALITY_INFO,
        )
        return self.sampler_sr.generate(sr_dict, schedule, seed=seed,
                                        text_tokenizer=self.text_tokenizer)
