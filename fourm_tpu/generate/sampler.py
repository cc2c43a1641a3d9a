"""GenerationSampler: chained any-to-any generation, fully jit-compiled.

TPU-native redesign of the reference sampler (fourm/models/generate.py:323-1273):

  * every step function is ONE jitted program with fixed shapes, compiled once per
    (target modality, scheme, CFG on/off) — num_select, temperature and cfg_scale
    are traced scalars, so all MaskGIT/ROAR steps of a schedule share a compile;
  * MaskGIT/ROAR decode over the target's FULL token grid with key-restricted
    self-attention instead of gathering the (dynamically-shaped) masked subset —
    bitwise-equal logits, zero recompiles (see FourM.forward_generation_img);
  * classifier-free guidance runs cond & uncond in one batch-doubled forward
    (the reference runs two sequential passes, generate.py:665-703);
  * autoregressive decoding uses per-layer KV caches + cross-attention K/V
    computed once at prefill, inside a lax.while_loop with per-sample EOS early
    exit (the reference re-runs the full decoder per token with a growing causal
    mask and no cache, generate.py:888-918);
  * multi-condition weighted guidance stacks all conditions into one forward.

Host-side work is limited to schedule iteration and span-merge of finished
sequences (tokenizer round-trip, inherently host work).
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.modality_info import MODALITY_INFO
from ..ops.sampling import NEG_INF, top_k_top_p_filtering, top_k_top_p_filtering_dynamic
from ..utils.text_tokenizer import get_sentinel_to_id_mapping, merge_span_masking
from .init_helpers import EOS_ID, PAD_ID, S1_ID

IMG = "img"
SEQ = ("seq", "seq_token")


def _sample_traced_temp(rng, logits, temperature):
    """Sample with a *traced* temperature; temperature < 1e-9 falls back to argmax
    with probability 1 (reference sample_tokens, generate.py:361-370)."""
    logits = logits.astype(jnp.float32)
    safe_t = jnp.maximum(temperature, 1e-9)
    scaled = logits / safe_t
    cat = jax.random.categorical(rng, scaled, axis=-1)
    greedy_tok = jnp.argmax(logits, axis=-1)
    greedy = temperature < 1e-9
    samples = jnp.where(greedy, greedy_tok, cat)
    probs = jax.nn.softmax(scaled, axis=-1)
    p = jnp.take_along_axis(probs, samples[..., None], axis=-1)[..., 0]
    p = jnp.where(greedy, 1.0, p)
    return samples, p


def _ranks_desc(scores: jnp.ndarray) -> jnp.ndarray:
    """ranks[i] = how many entries (with index tie-break) precede i in descending
    score order. Fixed-shape replacement for topk with traced k."""
    order = jnp.argsort(-scores, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1)
    return ranks


def _empty_cond_tree(mod_dict, cond_mods: Sequence[str]):
    """jnp version of the empty-modality transforms (generate.py:30-80), applied to
    conditioning modalities to build the CFG unconditional branch."""
    out = {m: dict(d) for m, d in mod_dict.items()}
    for mod in cond_mods:
        spec = MODALITY_INFO[mod]
        d = out[mod]
        if spec.type == "img":
            d["input_mask"] = jnp.ones_like(d["input_mask"])
        elif spec.type in SEQ:
            t = jnp.zeros_like(d["tensor"])
            t = t.at[:, 0].set(S1_ID).at[:, 1].set(S1_ID).at[:, -1].set(S1_ID + 1)
            d["tensor"] = t
            im = jnp.ones_like(d["input_mask"])
            d["input_mask"] = im.at[:, 0].set(False)
        elif spec.type == "seq_emb":
            d["tensor"] = jnp.zeros_like(d["tensor"])
            im = jnp.ones_like(d["input_mask"])
            d["input_mask"] = im.at[:, 0].set(False)
        else:
            raise ValueError(f"cannot empty modality type {spec.type}")
        out[mod] = d
    return out


def _tree_concat(dicts):
    """Concatenate a list of mod dicts along the batch axis."""
    out = {}
    for mod in dicts[0]:
        out[mod] = {
            k: jnp.concatenate([d[mod][k] for d in dicts], axis=0)
            for k in dicts[0][mod]
        }
    return out


class GenerationSampler:
    """Wraps a FourM model + params for chained generation.

    Usage:
      sampler = GenerationSampler(model, variables, text_tokenizer)
      out = sampler.generate(mod_dict, schedule, rng=jax.random.key(0))
    """

    def __init__(self, model, variables, text_tokenizer=None,
                 top_k: float = 0.0, top_p: float = 0.0,
                 kv_quant: Optional[str] = None):
        """kv_quant='int8': quantize the per-layer cross-attention K/V to
        int8 with per-(batch, head, channel) scales after each AR prefill —
        halves the BYTES of the dominant per-token HBM read (the cross-KV
        stream, 113 MB/layer at 4M-B chain shapes), but on the current
        toolchain the int8 kernel path measures SLOWER end-to-end than bf16
        (bench.py ar_decode_ms_per_token_int8kv ~4.99 vs 4.06 xla,
        2026-08-19) — treat as a parity-tested oracle until a toolchain
        makes it win. Opt-in: output tokens can differ from the bf16 path
        within quantization error (kernels/decode_step.py:quantize_kv_decode)."""
        if kv_quant not in (None, "int8"):
            raise ValueError(f"unsupported kv_quant {kv_quant!r}")
        self.model = model
        self.variables = variables
        self.text_tokenizer = text_tokenizer
        self.top_k = top_k
        self.top_p = top_p
        self.kv_quant = kv_quant
        self._jit_cache: Dict = {}

    def _init_valid_counts(self, mod_dict) -> Dict[str, int]:
        """Host-side bookkeeping for the encoder-compaction budget: per-modality
        max (over batch) count of VALID encoder tokens, computed ONCE at the
        start of `generate`. Subsequent steps update these counts analytically
        (img steps accept exactly `num_select` tokens; sequence merges rebuild
        the input_mask on host), so the per-step budget costs ZERO device->host
        transfers — on a tunneled/remote device each np.asarray(sync) is
        tens of ms, and the previous per-step recount (21 modality masks, every
        step) dominated the whole chain wall-clock."""
        enc_mods = getattr(self.model.config, "encoder_modalities", ())
        counts: Dict[str, int] = {}
        for mod in enc_mods:
            if mod in mod_dict:
                m = np.asarray(mod_dict[mod]["input_mask"])
                counts[mod] = int((~m).sum(axis=1).max())
        return counts

    def _encoder_budget(self, counts: Dict[str, int], mod_dict) -> int | None:
        """Static encoder-token budget: valid count rounded up to 256.
        Compacting the 3024-token mod-21 stream to this bucket cuts encoder and
        cross-attention cost ~stream/budget with identical logits (all valid
        tokens are kept; see FourM.forward_generation_img). Returns None when
        compaction wouldn't help (budget >= stream length). The stream length
        is recomputed from (host-known) shapes because sequence merges change
        a modality's layout to (max_tokens+1)*2."""
        enc_mods = getattr(self.model.config, "encoder_modalities", ())
        total = sum(
            mod_dict[mod]["input_mask"].shape[1] for mod in enc_mods if mod in mod_dict
        )
        if not counts or total == 0:
            return None
        need = max(sum(counts.values()), 1)
        bucket = min(-(-need // 256) * 256, total)
        return None if bucket >= total else bucket

    # ------------------------------------------------------------- img steps

    def _img_step_fn(self, target_mod: str, scheme: str, cond_mods: Tuple[str, ...],
                     use_cfg: bool, num_weights: int = 0, use_filter: bool = False,
                     enc_budget=None):
        """Build/cache the jitted MaskGIT/ROAR step for this configuration."""
        key = ("img", target_mod, scheme, cond_mods, use_cfg, num_weights, use_filter,
               enc_budget)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model = self.model

        def fn(variables, mod_dict, num_select, temperature, cfg_scale, top_k, top_p, rng):
            d_t = mod_dict[target_mod]
            B = d_t["tensor"].shape[0]
            still = ~d_t["target_mask"]  # True = still to decode
            rng_sel, rng_samp = jax.random.split(rng)

            if scheme == "roar":
                # random subset of still-masked positions, this step only
                noise = jax.random.uniform(rng_sel, still.shape)
                sel_ranks = _ranks_desc(jnp.where(still, noise, -jnp.inf))
                sa_valid = (sel_ranks < num_select) & still
            else:  # maskgit: all still-masked positions are decoder tokens
                sa_valid = still

            if use_cfg:
                uncond = _empty_cond_tree(mod_dict, cond_mods)
                md = _tree_concat([mod_dict, uncond])
                sa = jnp.concatenate([sa_valid, sa_valid], axis=0)
            else:
                md, sa = mod_dict, sa_valid

            logits = model.apply(
                variables, md, target_mod, sa, enc_budget,
                method="forward_generation_img",
            ).astype(jnp.float32)
            if use_cfg:
                lc, lu = logits[:B], logits[B:]
                logits = lu + cfg_scale * (lc - lu)

            if use_filter:
                logits = top_k_top_p_filtering_dynamic(logits, top_k, top_p)
            samples, probs = _sample_traced_temp(rng_samp, logits, temperature)
            samples = samples.astype(d_t["tensor"].dtype)

            if scheme == "roar":
                accept = sa_valid
            else:
                conf = jnp.where(still, probs, -jnp.inf)
                ranks = _ranks_desc(conf)
                accept = (ranks < num_select) & still

            tensor = jnp.where(accept, samples, d_t["tensor"])
            input_mask = d_t["input_mask"] & ~accept
            target_mask = d_t["target_mask"] | accept
            return tensor, input_mask, target_mask

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _multi_guided_img_step_fn(self, target_mod: str, scheme: str, n_conds: int,
                                  use_filter: bool = False):
        """Multi-condition weighted guidance (generate.py:705-848):
        logits = l_uncond + sum_i w_i (l_cond_i - l_uncond)."""
        key = ("img_multi", target_mod, scheme, n_conds, use_filter)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.model

        def fn(variables, uncond_dict, cond_dicts, weights, num_select, temperature,
               top_k, top_p, rng):
            d_t = uncond_dict[target_mod]
            B = d_t["tensor"].shape[0]
            still = ~d_t["target_mask"]
            rng_sel, rng_samp = jax.random.split(rng)
            if scheme == "roar":
                noise = jax.random.uniform(rng_sel, still.shape)
                sel_ranks = _ranks_desc(jnp.where(still, noise, -jnp.inf))
                sa_valid = (sel_ranks < num_select) & still
            else:
                sa_valid = still

            md = _tree_concat(list(cond_dicts) + [uncond_dict])
            sa = jnp.concatenate([sa_valid] * (n_conds + 1), axis=0)
            logits = model.apply(
                variables, md, target_mod, sa, method="forward_generation_img"
            ).astype(jnp.float32)
            lu = logits[n_conds * B :]
            guided = lu
            for i in range(n_conds):
                guided = guided + weights[i] * (logits[i * B : (i + 1) * B] - lu)

            if use_filter:
                guided = top_k_top_p_filtering_dynamic(guided, top_k, top_p)
            samples, probs = _sample_traced_temp(rng_samp, guided, temperature)
            samples = samples.astype(d_t["tensor"].dtype)
            if scheme == "roar":
                accept = sa_valid
            else:
                conf = jnp.where(still, probs, -jnp.inf)
                accept = (_ranks_desc(conf) < num_select) & still
            tensor = jnp.where(accept, samples, d_t["tensor"])
            input_mask = d_t["input_mask"] & ~accept
            target_mask = d_t["target_mask"] | accept
            return tensor, input_mask, target_mask

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _img_target_fn(self, target_mod: str, scheme: str, cond_mods: Tuple[str, ...],
                       use_cfg: bool, n_steps: int, use_filter: bool = False,
                       enc_budget=None):
        """All `n_steps` MaskGIT/ROAR steps of ONE target modality fused into a
        single jitted lax.scan. One dispatch instead of n_steps — on a
        tunneled/remote device each dispatch costs a ~30 ms round trip, which
        dominates the 25-step X2RGB and 8-step 448px-SR schedules. Per-step
        num_select / temperature / cfg_scale are scanned arrays (same compile
        for every schedule of the same length)."""
        key = ("img_scan", target_mod, scheme, cond_mods, use_cfg, n_steps,
               use_filter, enc_budget)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model = self.model

        def fn(variables, mod_dict, num_selects, temps, cfg_scales, top_k, top_p, rng):
            d_t0 = mod_dict[target_mod]
            B = d_t0["tensor"].shape[0]
            others = {m: d for m, d in mod_dict.items() if m != target_mod}

            def one_step(carry, xs):
                tensor, input_mask, target_mask, rng = carry
                num_select, temperature, cfg_scale = xs
                d_t = dict(d_t0)
                d_t.update(tensor=tensor, input_mask=input_mask, target_mask=target_mask)
                md_step = {**others, target_mod: d_t}
                still = ~target_mask
                rng, rng_sel, rng_samp = jax.random.split(rng, 3)

                if scheme == "roar":
                    noise = jax.random.uniform(rng_sel, still.shape)
                    sel_ranks = _ranks_desc(jnp.where(still, noise, -jnp.inf))
                    sa_valid = (sel_ranks < num_select) & still
                else:
                    sa_valid = still

                if use_cfg:
                    uncond = _empty_cond_tree(md_step, cond_mods)
                    md = _tree_concat([md_step, uncond])
                    sa = jnp.concatenate([sa_valid, sa_valid], axis=0)
                else:
                    md, sa = md_step, sa_valid

                logits = model.apply(
                    variables, md, target_mod, sa, enc_budget,
                    method="forward_generation_img",
                ).astype(jnp.float32)
                if use_cfg:
                    lc, lu = logits[:B], logits[B:]
                    logits = lu + cfg_scale * (lc - lu)
                if use_filter:
                    logits = top_k_top_p_filtering_dynamic(logits, top_k, top_p)
                samples, probs = _sample_traced_temp(rng_samp, logits, temperature)
                samples = samples.astype(tensor.dtype)

                if scheme == "roar":
                    accept = sa_valid
                else:
                    conf = jnp.where(still, probs, -jnp.inf)
                    accept = (_ranks_desc(conf) < num_select) & still

                tensor = jnp.where(accept, samples, tensor)
                input_mask = input_mask & ~accept
                target_mask = target_mask | accept
                return (tensor, input_mask, target_mask, rng), None

            init = (d_t0["tensor"], d_t0["input_mask"], d_t0["target_mask"], rng)
            (tensor, input_mask, target_mask, _), _ = jax.lax.scan(
                one_step, init, (num_selects, temps, cfg_scales))
            return tensor, input_mask, target_mask

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    # -------------------------------------------------------------- AR steps

    def _ar_step_fn(self, target_mod: str, cond_mods: Tuple[str, ...], use_cfg: bool,
                    max_len: int, use_filter: bool = False, enc_budget=None):
        """KV-cached autoregressive decoding of a sequence modality."""
        kv_quant = self.kv_quant
        key = ("ar", target_mod, cond_mods, use_cfg, max_len, use_filter,
               enc_budget, kv_quant)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model = self.model

        def fn(variables, mod_dict, temperature, cfg_scale, top_k, top_p, rng):
            d_t = mod_dict[target_mod]
            B = d_t["tensor"].shape[0]

            # start token = first target-region token ([S_1]); eos = last one.
            from ..ops.token_select import select_tokens

            tgt_idx = select_tokens(d_t["target_mask"], min(max_len, d_t["tensor"].shape[1]))
            tgt_ids = jnp.take_along_axis(d_t["tensor"], tgt_idx, axis=1)
            n_valid = jnp.sum(~d_t["target_mask"], axis=1)  # (B,)
            start = tgt_ids[:, :1].astype(jnp.int32)  # (B, 1)
            eos_tok = jnp.take_along_axis(
                tgt_ids, jnp.maximum(n_valid[:, None] - 1, 0).astype(jnp.int32), axis=1
            )[:, 0]  # (B,)

            if use_cfg:
                uncond = _empty_cond_tree(mod_dict, cond_mods)
                md = _tree_concat([mod_dict, uncond])
            else:
                md = mod_dict
            Bf = (2 if use_cfg else 1) * B

            cross_kvs, enc_mask, y_emb = model.apply(
                variables, md, target_mod, max_len, enc_budget, method="ar_prefill"
            )
            if kv_quant == "int8":
                from ..kernels.decode_step import quantize_kv_decode

                def _q(kv):
                    k_i8, ks, v_i8, vs = quantize_kv_decode(*kv)
                    return ((k_i8, ks), (v_i8, vs))

                cross_kvs = [_q(kv) for kv in cross_kvs]
            caches = model.apply(
                variables, Bf, max_len, method="init_kv_caches"
            )

            out_ids = jnp.zeros((B, max_len), jnp.int32)
            out_ids = out_ids.at[:, 0].set(start[:, 0])
            done = start[:, 0] == eos_tok
            # generate at most as many tokens as the target region holds
            # (reference loops seq_len = gathered-target-length times, :888)
            bound = jnp.minimum(jnp.max(n_valid), max_len - 1)

            def cond(carry):
                t, _tok, _caches, _out, done, _rng = carry
                return (t < bound) & ~jnp.all(done)

            def body(carry):
                t, tok, caches, out, done, rng = carry
                rng, rng_s = jax.random.split(rng)
                tok_f = jnp.concatenate([tok, tok], axis=0) if use_cfg else tok
                y_t = model.apply(variables, target_mod, tok_f, method="embed_target_token")
                y_t = y_t + jax.lax.dynamic_slice_in_dim(y_emb, t, 1, axis=1)
                y_out, caches = model.apply(
                    variables, y_t, caches, cross_kvs, enc_mask, t,
                    method="decode_one_token",
                )
                logits = model.apply(
                    variables, target_mod, y_out, method="mod_logits"
                )[:, 0].astype(jnp.float32)
                if use_cfg:
                    lc, lu = logits[:B], logits[B:]
                    logits = lu + cfg_scale * (lc - lu)
                if use_filter:
                    logits = top_k_top_p_filtering_dynamic(logits, top_k, top_p)
                sample, _ = _sample_traced_temp(rng_s, logits, temperature)
                sample = sample.astype(jnp.int32)
                sample = jnp.where(done, PAD_ID, sample)  # freeze finished rows
                out = jax.lax.dynamic_update_slice_in_dim(out, sample[:, None], t + 1, axis=1)
                done = done | (sample == eos_tok)
                return (t + 1, sample[:, None], caches, out, done, rng)

            init = (jnp.int32(0), start, caches, out_ids, done, rng)
            t_final, _, _, out_ids, done, _ = jax.lax.while_loop(cond, body, init)
            length = t_final + 1
            return out_ids, length

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    # ---------------------------------------------------------- merge (host)

    def _merge_empty_fn(self, target_mod: str, L: int, sentinels: Tuple[int, ...],
                        span_sentinel: int):
        """Device-side sequence merge for the chain case: the target modality
        started EMPTY (input was just [S_1]), so merge_span_masking reduces to
        "non-PAD tokens of every segment headed by [S_1]" (split_by_sentinel
        APPENDS on a repeated sentinel, so a re-generated [S_1] continues the
        span — the segment-head cummax reproduces that). Matches
        merge_sequences bit-for-bit for empty inputs (tested); runs as ONE
        jitted program so the chain never round-trips token tensors through
        the host — on a tunneled device each np.asarray sync is ~26 ms and the
        host merge cost ~5 of them per AR target."""
        key = ("merge_empty", target_mod, L, sentinels, span_sentinel)
        if key in self._jit_cache:
            return self._jit_cache[key]

        sent_arr = jnp.asarray(sentinels, jnp.int32)

        @jax.jit
        def fn(out_ids):
            from ..ops.token_select import select_tokens

            B, T = out_ids.shape
            toks = out_ids[:, 1:]  # segment 0 is headed by the start marker
            start = out_ids[:, 0:1]  # (B, 1), the [S_k] the span belongs to
            is_sent = jnp.any(toks[..., None] == sent_arr[None, None, :], axis=-1)
            is_pad = toks == PAD_ID
            # head sentinel governing each position: value of the most recent
            # sentinel at or before it (the start marker before any)
            pos = jnp.arange(toks.shape[1], dtype=jnp.int32)[None, :]
            last_pos = jax.lax.cummax(jnp.where(is_sent, pos, -1), axis=1)
            head = jnp.where(
                last_pos >= 0,
                jnp.take_along_axis(toks, jnp.maximum(last_pos, 0), axis=1),
                start,
            )
            keep = (~is_pad) & (~is_sent) & (head == span_sentinel)
            n_keep = jnp.sum(keep, axis=1)  # (B,)
            idx = select_tokens(~keep, min(L, toks.shape[1]))
            gathered = jnp.take_along_axis(toks, idx, axis=1)
            pos = jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :]
            valid = pos < n_keep[:, None]
            merged = jnp.where(valid, gathered, PAD_ID).astype(jnp.int32)
            pad_cols = L - merged.shape[1]
            if pad_cols > 0:
                merged = jnp.pad(merged, ((0, 0), (0, pad_cols)),
                                 constant_values=PAD_ID)
                valid = jnp.pad(valid, ((0, 0), (0, pad_cols)))
            return merged, ~valid, jnp.max(n_keep)

        self._jit_cache[key] = fn
        return fn

    def _merge_general_fn(self, target_mod: str, L: int, T_in: int, T_dec: int,
                          sentinels: Tuple[int, ...], default_sentinel: int):
        """Device-side sequence merge for the GENERAL span-splice case
        (non-empty inputs, i.e. transfer-style conditioning): reproduces
        merge_span_masking exactly — walk the input tokens, copy non-sentinels,
        and expand each sentinel into the ordered decoder tokens whose most
        recent preceding sentinel (head) equals it. split_by_sentinel's
        defaultdict append-on-repeat semantics fall out of the head-cummax:
        all segments headed by the same sentinel concatenate in decoder order,
        and an input sentinel with no decoder segment expands to nothing.
        Fixed shapes throughout; one jitted program, one scalar fetch.
        Bit-equality vs the host merge_sequences oracle is tested
        (tests/test_generation.py). Reference host loop: generate.py:550-626."""
        key = ("merge_gen", target_mod, L, T_in, T_dec, sentinels, default_sentinel)
        if key in self._jit_cache:
            return self._jit_cache[key]

        sent_arr = jnp.asarray(sentinels, jnp.int32)  # (S,)

        @jax.jit
        def fn(in_tensor, in_mask, out_ids):
            from ..ops.token_select import select_tokens

            B = in_tensor.shape[0]
            # -- compact the input tokens (valid first, original order) --
            idx = select_tokens(in_mask, T_in)
            in_tok = jnp.take_along_axis(in_tensor, idx, axis=1).astype(jnp.int32)
            n_in = jnp.sum(~in_mask, axis=1).astype(jnp.int32)  # (B,)
            # empty input behaves as [default_sentinel] (host: inp or [S_1])
            empty = n_in == 0
            first_col = jnp.arange(T_in, dtype=jnp.int32)[None, :] == 0
            in_tok = jnp.where(empty[:, None] & first_col,
                               jnp.int32(default_sentinel), in_tok)
            n_in = jnp.maximum(n_in, 1)
            valid_in = jnp.arange(T_in, dtype=jnp.int32)[None, :] < n_in[:, None]

            # -- decoder stream: head sentinel per position --
            toks = out_ids.astype(jnp.int32)  # (B, T_dec)
            is_pad_d = toks == PAD_ID
            is_sent_d = jnp.any(toks[..., None] == sent_arr[None, None, :],
                                axis=-1) & ~is_pad_d
            pos_d = jnp.arange(T_dec, dtype=jnp.int32)[None, :]
            last_pos = jax.lax.cummax(jnp.where(is_sent_d, pos_d, -1), axis=1)
            head = jnp.where(
                last_pos >= 0,
                jnp.take_along_axis(toks, jnp.maximum(last_pos, 0), axis=1),
                -1,
            )
            keep_d = (~is_pad_d) & (~is_sent_d) & (head >= 0)

            # -- per-sentinel ordered token tables + counts --
            def per_sent(s):
                not_mine = ~(keep_d & (head == s))
                order = select_tokens(not_mine, T_dec)
                return (jnp.take_along_axis(toks, order, axis=1),
                        jnp.sum(~not_mine, axis=1).astype(jnp.int32))

            dec_tab, dec_cnt = jax.vmap(per_sent)(sent_arr)  # (S,B,Td),(S,B)
            dec_tab = jnp.moveaxis(dec_tab, 0, 1)  # (B, S, T_dec)
            dec_cnt = jnp.moveaxis(dec_cnt, 0, 1)  # (B, S)

            # -- run length + exclusive start per input position --
            sent_match = in_tok[..., None] == sent_arr[None, None, :]  # (B,T_in,S)
            is_sent_i = jnp.any(sent_match, axis=-1) & valid_in
            sent_j = jnp.argmax(sent_match, axis=-1).astype(jnp.int32)  # (B,T_in)
            len_i = jnp.where(
                valid_in,
                jnp.where(is_sent_i,
                          jnp.take_along_axis(dec_cnt, sent_j, axis=1), 1),
                0,
            ).astype(jnp.int32)
            start_i = jnp.cumsum(len_i, axis=1) - len_i  # exclusive prefix
            n_out = jnp.sum(len_i, axis=1)  # (B,)

            # -- gather each output slot from the run containing it --
            o = jnp.arange(L, dtype=jnp.int32)[None, None, :]  # (1,1,L)
            contains = ((start_i[:, :, None] <= o)
                        & (o < (start_i + len_i)[:, :, None]))  # (B,T_in,L)
            found = jnp.any(contains, axis=1)  # (B, L)
            i_of_o = jnp.argmax(contains, axis=1).astype(jnp.int32)  # (B, L)
            tok_i = jnp.take_along_axis(in_tok, i_of_o, axis=1)
            js = jnp.take_along_axis(sent_j, i_of_o, axis=1)
            k = jnp.arange(L, dtype=jnp.int32)[None, :] - jnp.take_along_axis(
                start_i, i_of_o, axis=1)
            is_s = jnp.take_along_axis(is_sent_i, i_of_o, axis=1)
            dec_val = dec_tab[jnp.arange(B)[:, None], js, jnp.clip(k, 0, T_dec - 1)]
            val = jnp.where(is_s, dec_val, tok_i)
            valid = found  # contains already bounds o < n_out
            merged = jnp.where(valid, val, PAD_ID).astype(jnp.int32)
            return merged, ~valid, jnp.max(jnp.minimum(n_out, L))

        self._jit_cache[key] = fn
        return fn

    def merge_sequences_device(self, mod_dict, out_ids, target_mod: str,
                               text_tokenizer=None) -> Dict:
        """Empty-input fast path of merge_sequences: splice on-device, fetch
        only one scalar (the max valid length) for budget bookkeeping."""
        tok = text_tokenizer or self.text_tokenizer
        sentinels = tuple(sorted(get_sentinel_to_id_mapping(tok).values()))
        default_sentinel = tok.token_to_id("[S_1]")
        spec = MODALITY_INFO[target_mod]
        L = (spec.resolved_max_tokens() + 1) * 2
        B = out_ids.shape[0]
        fn = self._merge_empty_fn(target_mod, L, sentinels, default_sentinel)
        tensor, input_mask, n_valid = fn(out_ids)
        self._last_merge_valid = int(n_valid)
        mod_dict[target_mod] = {
            "tensor": tensor,
            "input_mask": input_mask,
            "target_mask": jnp.ones((B, L), dtype=bool),
            "decoder_attention_mask": jnp.zeros((B, L), jnp.int32),
        }
        return mod_dict

    def merge_sequences_device_general(self, mod_dict, out_ids, target_mod: str,
                                       text_tokenizer=None) -> Dict:
        """General (non-empty-input / transfer-style) device-side merge: splice
        generated spans into the existing input sequence entirely on-device
        (see _merge_general_fn), fetching one scalar for budget bookkeeping."""
        tok = text_tokenizer or self.text_tokenizer
        sentinels = tuple(sorted(get_sentinel_to_id_mapping(tok).values()))
        default_sentinel = tok.token_to_id("[S_1]")
        spec = MODALITY_INFO[target_mod]
        L = (spec.resolved_max_tokens() + 1) * 2
        d = mod_dict[target_mod]
        B, T_in = d["tensor"].shape
        fn = self._merge_general_fn(target_mod, L, T_in, out_ids.shape[1],
                                    sentinels, default_sentinel)
        tensor, input_mask, n_valid = fn(d["tensor"], d["input_mask"], out_ids)
        self._last_merge_valid = int(n_valid)
        mod_dict[target_mod] = {
            "tensor": tensor,
            "input_mask": input_mask,
            "target_mask": jnp.ones((B, L), dtype=bool),
            "decoder_attention_mask": jnp.zeros((B, L), jnp.int32),
        }
        return mod_dict

    def merge_sequences(self, mod_dict, out_ids: np.ndarray, target_mod: str,
                        text_tokenizer=None) -> Dict:
        """Splice the generated span tokens back into the input sequence and
        re-register the modality as a full input (reference generate.py:550-626).
        Host-side; output arrays use the fixed (max_tokens+1)*2 layout."""
        tok = text_tokenizer or self.text_tokenizer
        sentinel_ids = set(get_sentinel_to_id_mapping(tok).values())
        default_sentinel = tok.token_to_id("[S_1]")
        d = jax.tree.map(np.asarray, mod_dict[target_mod])
        B = d["tensor"].shape[0]
        spec = MODALITY_INFO[target_mod]
        L = (spec.resolved_max_tokens() + 1) * 2

        tensors = np.full((B, L), PAD_ID, dtype=np.int32)
        input_mask = np.ones((B, L), dtype=bool)
        for b in range(B):
            inp = d["tensor"][b][~d["input_mask"][b]].tolist()
            if len(inp) == 0:
                inp = [default_sentinel]
            preds = [int(t) for t in out_ids[b] if t != PAD_ID]
            merged = merge_span_masking(inp, preds, sentinel_ids)[:L]
            tensors[b, : len(merged)] = merged
            input_mask[b, : len(merged)] = False
        self._last_merge_valid = int((~input_mask).sum(axis=1).max())
        mod_dict[target_mod] = {
            "tensor": jnp.asarray(tensors),
            "input_mask": jnp.asarray(input_mask),
            "target_mask": jnp.ones((B, L), dtype=bool),
            "decoder_attention_mask": jnp.zeros((B, L), dtype=np.int32),
        }
        return mod_dict

    # ------------------------------------------------------------- generate

    def generate(self, mod_dict, schedule: List[dict], rng=None, text_tokenizer=None,
                 verbose: bool = False, seed: Optional[int] = None,
                 top_k: Optional[float] = None, top_p: Optional[float] = None):
        """Run a chained generation schedule (reference generate.py:1028-1095).
        top_k/top_p override the constructor defaults per call (reference
        semantics) without recompiling — they are traced scalars."""
        if rng is None:
            rng = jax.random.key(seed if seed is not None else 0)
        counts = self._init_valid_counts(mod_dict)
        mod_dict = {m: dict(jax.tree.map(jnp.asarray, d)) for m, d in mod_dict.items()}

        for group in self._group_schedule(schedule):
            rng, rng_step = jax.random.split(rng)
            if len(group) > 1:
                mod_dict = self._generate_img_target(mod_dict, group, rng_step,
                                                     top_k, top_p, counts=counts)
            else:
                mod_dict = self._generate_one_step(mod_dict, group[0], rng_step,
                                                   text_tokenizer, top_k, top_p,
                                                   counts=counts)
        return mod_dict

    @staticmethod
    def _group_schedule(schedule: List[dict]) -> List[List[dict]]:
        """Group consecutive img-target steps of the same (target, scheme, CFG
        config) so each group runs as ONE fused lax.scan program."""
        groups: List[List[dict]] = []
        for step_info in schedule:
            spec = MODALITY_INFO[step_info["target_domain"]]
            # list-valued cfg_scale (weighted multi-cond CFG) is not supported
            # by the fused scan program: leave those steps ungrouped so they
            # take the single-step path, which degrades to use_cfg=False
            # (generate_multi_guided is the weighted-CFG entry point).
            is_list = isinstance(step_info.get("cfg_scale", 1.0), (list, tuple))
            key = (step_info["target_domain"], step_info.get("scheme"),
                   tuple(step_info.get("cfg_cond_domains", ())))
            if (spec.type == "img" and not is_list and groups and groups[-1] and
                    groups[-1][0].get("_group_key") == key):
                groups[-1].append(step_info)
            elif spec.type == "img" and not is_list:
                groups.append([{**step_info, "_group_key": key}])
            else:
                groups.append([step_info])
        return groups

    def _generate_img_target(self, mod_dict, group: List[dict], rng_step,
                             top_k: Optional[float] = None,
                             top_p: Optional[float] = None,
                             counts: Optional[Dict[str, int]] = None):
        """Run all steps of one img target via the fused scan program."""
        top_k = self.top_k if top_k is None else top_k
        top_p = self.top_p if top_p is None else top_p
        use_filter = bool(top_k or top_p)
        first = group[0]
        target_mod = first["target_domain"]
        scheme = first["scheme"].lower()
        conds = tuple(first.get("cfg_cond_domains", ()))
        cfg_scales = [float(s.get("cfg_scale", 1.0)) for s in group]
        use_cfg = any(c != 1.0 for c in cfg_scales) and len(conds) > 0
        num_selects = np.asarray([int(s["num_tokens"]) for s in group], np.int32)
        temps = np.asarray([float(s["temperature"]) for s in group], np.float32)

        if counts is None:
            counts = self._init_valid_counts(mod_dict)
        # budget must cover the LAST step, when all this target's accepted
        # tokens are already encoder inputs
        end_counts = dict(counts)
        if target_mod in end_counts:
            cap = int(np.prod(mod_dict[target_mod]["input_mask"].shape[1:]))
            end_counts[target_mod] = min(
                end_counts[target_mod] + int(num_selects.sum()), cap)
        enc_budget = self._encoder_budget(end_counts, mod_dict)

        fn = self._img_target_fn(target_mod, scheme, conds if use_cfg else (),
                                 use_cfg, len(group), use_filter=use_filter,
                                 enc_budget=enc_budget)
        tensor, input_mask, target_mask = fn(
            self.variables, mod_dict, jnp.asarray(num_selects), jnp.asarray(temps),
            jnp.asarray(cfg_scales, jnp.float32) if use_cfg
            else jnp.ones(len(group), jnp.float32),
            jnp.float32(top_k), jnp.float32(top_p), rng_step,
        )
        d = dict(mod_dict[target_mod])
        d.update(tensor=tensor, input_mask=input_mask, target_mask=target_mask)
        mod_dict[target_mod] = d
        if target_mod in counts:
            counts[target_mod] = end_counts[target_mod]
        return mod_dict

    def generate_iter(self, mod_dict, schedule, rng=None, text_tokenizer=None,
                      seed: Optional[int] = None,
                      top_k: Optional[float] = None, top_p: Optional[float] = None):
        """Step-by-step iterator variant (reference generate.py:1098-1166)."""
        if rng is None:
            rng = jax.random.key(seed if seed is not None else 0)
        counts = self._init_valid_counts(mod_dict)
        mod_dict = {m: dict(jax.tree.map(jnp.asarray, d)) for m, d in mod_dict.items()}
        for step_info in schedule:
            rng, rng_step = jax.random.split(rng)
            mod_dict = self._generate_one_step(mod_dict, step_info, rng_step,
                                               text_tokenizer, top_k, top_p,
                                               counts=counts)
            yield mod_dict

    def _generate_one_step(self, mod_dict, step_info, rng_step, text_tokenizer=None,
                           top_k: Optional[float] = None, top_p: Optional[float] = None,
                           counts: Optional[Dict[str, int]] = None):
        top_k = self.top_k if top_k is None else top_k
        top_p = self.top_p if top_p is None else top_p
        use_filter = bool(top_k or top_p)
        target_mod = step_info["target_domain"]
        temp = float(step_info["temperature"])
        cfg_scale = step_info.get("cfg_scale", 1.0)
        conds = tuple(step_info.get("cfg_cond_domains", ()))
        use_cfg = (not isinstance(cfg_scale, (list, tuple))) and cfg_scale != 1.0 and len(conds) > 0
        spec = MODALITY_INFO[target_mod]
        if counts is None:  # direct single-step callers (tests) pay one sync
            counts = self._init_valid_counts(mod_dict)
        enc_budget = self._encoder_budget(counts, mod_dict)

        if spec.type == "img":
            scheme = step_info["scheme"].lower()
            num_select = int(step_info["num_tokens"])
            fn = self._img_step_fn(target_mod, scheme, conds if use_cfg else (), use_cfg,
                                   use_filter=use_filter, enc_budget=enc_budget)
            tensor, input_mask, target_mask = fn(
                self.variables, mod_dict,
                jnp.int32(num_select), jnp.float32(temp), jnp.float32(cfg_scale if use_cfg else 1.0),
                jnp.float32(top_k), jnp.float32(top_p), rng_step,
            )
            d = dict(mod_dict[target_mod])
            d.update(tensor=tensor, input_mask=input_mask, target_mask=target_mask)
            mod_dict[target_mod] = d
            if target_mod in counts:
                # accepted tokens become encoder inputs for subsequent steps;
                # exactly num_select are accepted (schedules sum to the grid size)
                cap = int(np.prod(d["input_mask"].shape[1:]))
                counts[target_mod] = min(counts[target_mod] + num_select, cap)
        elif spec.type in SEQ:
            max_len = min(
                spec.resolved_max_tokens(), int(mod_dict[target_mod]["tensor"].shape[1])
            )
            fn = self._ar_step_fn(target_mod, conds if use_cfg else (), use_cfg, max_len,
                                  use_filter=use_filter, enc_budget=enc_budget)
            out_ids, _length = fn(
                self.variables, mod_dict, jnp.float32(temp),
                jnp.float32(cfg_scale if use_cfg else 1.0),
                jnp.float32(top_k), jnp.float32(top_p), rng_step,
            )
            if (text_tokenizer or self.text_tokenizer) is not None:
                # splice on-device, no host round trip of the token tensors:
                # cheap cummax-segment program when the target started empty
                # (chain case), general span-splice program otherwise
                # (transfer-style non-empty conditioning). The host
                # merge_sequences below stays as the tested oracle.
                if counts.get(target_mod, None) == 0:
                    mod_dict = self.merge_sequences_device(
                        mod_dict, out_ids, target_mod, text_tokenizer)
                else:
                    mod_dict = self.merge_sequences_device_general(
                        mod_dict, out_ids, target_mod, text_tokenizer)
            else:
                mod_dict = self.merge_sequences(
                    mod_dict, np.asarray(out_ids), target_mod, text_tokenizer
                )
            if target_mod in counts:
                counts[target_mod] = self._last_merge_valid
        else:
            raise ValueError(f"invalid target modality type {spec.type}")
        return mod_dict

    def generate_sam_dense(self, mod_dict, schedule, text_tokenizer=None,
                           batch_size: int = 16, key: str = "sam_instance",
                           seed: Optional[int] = None):
        """Dense SAM instance prediction (reference generate.py:1229-1273): run the
        sam_instance schedule over `batch_size` replicas (each samples different
        random query points via the AR sampler) and concatenate all merged
        sequences into one dense instance list."""
        from .init_helpers import expand_to_batch as _expand

        tok = text_tokenizer or self.text_tokenizer
        sentinel_ids = set(get_sentinel_to_id_mapping(tok).values())
        batch = {m: {k: np.asarray(v) for k, v in d.items()} for m, d in mod_dict.items()}
        batch = _expand(batch, batch_size)
        schedule = [s for s in schedule if s["target_domain"] == key]
        out = self.generate(batch, schedule, seed=seed, text_tokenizer=tok)

        merged_all: list = []
        tensor = np.asarray(out[key]["tensor"])
        input_mask = np.asarray(out[key]["input_mask"])
        target_mask = np.asarray(out[key]["target_mask"])
        for i in range(batch_size):
            in_seq = tensor[i][~input_mask[i]].tolist()
            tgt_seq = tensor[i][~target_mask[i]].tolist()
            merged_all.extend(merge_span_masking(in_seq, tgt_seq, sentinel_ids))
        merged = jnp.asarray(merged_all, jnp.int32)[None]
        result = {m: dict(d) for m, d in mod_dict.items()}
        result[key] = {
            "tensor": merged,
            "input_mask": jnp.zeros(merged.shape, bool),
            "target_mask": jnp.ones(merged.shape, bool),
            "decoder_attention_mask": jnp.zeros(merged.shape, jnp.int32),
        }
        return result

    def generate_multi_guided(self, uncond_dict, cond_dicts, schedule, rng=None,
                              text_tokenizer=None, seed: Optional[int] = None,
                              top_k: Optional[float] = None,
                              top_p: Optional[float] = None):
        """Multi-condition weighted guidance over img targets
        (reference generate.py:1168-1227). cfg_scale in each step must be a list of
        per-condition weights."""
        if rng is None:
            rng = jax.random.key(seed if seed is not None else 0)
        uncond_dict = {m: dict(jax.tree.map(jnp.asarray, d)) for m, d in uncond_dict.items()}
        cond_dicts = [
            {m: dict(jax.tree.map(jnp.asarray, d)) for m, d in cd.items()} for cd in cond_dicts
        ]
        n = len(cond_dicts)
        top_k = self.top_k if top_k is None else top_k
        top_p = self.top_p if top_p is None else top_p
        use_filter = bool(top_k or top_p)
        for step_info in schedule:
            rng, rng_step = jax.random.split(rng)
            target_mod = step_info["target_domain"]
            spec = MODALITY_INFO[target_mod]
            if spec.type != "img":
                raise ValueError("multi-guided generation currently supports img targets")
            scheme = step_info["scheme"].lower()
            weights = jnp.asarray(step_info["cfg_scale"], jnp.float32)
            fn = self._multi_guided_img_step_fn(target_mod, scheme, n, use_filter=use_filter)
            tensor, input_mask, target_mask = fn(
                self.variables, uncond_dict, tuple(cond_dicts), weights,
                jnp.int32(step_info["num_tokens"]), jnp.float32(step_info["temperature"]),
                jnp.float32(top_k), jnp.float32(top_p), rng_step,
            )
            upd = dict(tensor=tensor, input_mask=input_mask, target_mask=target_mask)
            for dd in [uncond_dict] + cond_dicts:
                if target_mod in dd:
                    d = dict(dd[target_mod])
                    d.update(upd)
                    dd[target_mod] = d
        return uncond_dict
