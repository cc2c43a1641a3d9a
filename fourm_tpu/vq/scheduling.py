"""Diffusion noise schedulers (DDPM / DDIM) and the conditional sampling pipeline,
in pure JAX.

Functional re-implementation of the reference forked-diffusers schedulers
(fourm/vq/scheduling/scheduling_ddpm.py:49-436, scheduling_ddim.py:51-417,
scheduling_utils.py:19-110, diffusion_pipeline.py:37-133), redesigned for XLA:

  * schedules (alphas_cumprod) are precomputed numpy constants baked into the
    compiled program;
  * `step` takes traced (t, prev_t) scalars so one compiled step serves every
    timestep, and the sampling loop is a single `lax.scan` — the whole T-step
    denoise is ONE device program (the reference host-loops per step);
  * classifier-free guidance runs cond/uncond in one batch-doubled model call;
  * randomness via explicit PRNG keys.

Supports: linear / scaled_linear / squaredcos_cap_v2 / shifted-cosine schedules,
zero-terminal-SNR enforcement, epsilon / sample / v_prediction parameterizations,
fixed_small/large (+log) variances, static/dynamic thresholding, leading /
trailing / linspace timestep spacing, and DDIM eta.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- schedules

def enforce_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the last timestep has zero SNR (arXiv:2305.08891;
    reference scheduling_utils.py:19-49)."""
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas)
    sqrt_ab = np.sqrt(alphas_bar)
    sqrt_ab_0, sqrt_ab_T = sqrt_ab[0].copy(), sqrt_ab[-1].copy()
    sqrt_ab = sqrt_ab - sqrt_ab_T
    sqrt_ab = sqrt_ab * sqrt_ab_0 / (sqrt_ab_0 - sqrt_ab_T)
    ab = sqrt_ab**2
    alphas = np.concatenate([ab[:1], ab[1:] / ab[:-1]])
    return (1.0 - alphas).astype(np.float32)


def betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2 schedule (reference scheduling_utils.py:52-77)."""
    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [
        min(1 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps), max_beta)
        for i in range(num_steps)
    ]
    return np.array(betas, dtype=np.float32)


def scaled_cosine_alphas(num_steps: int, noise_shift: float = 1.0) -> np.ndarray:
    """Cosine schedule shifted in log-SNR space (arXiv:2305.18231; reference
    scheduling_utils.py:80-110). Returns alphas_cumprod directly."""
    t = np.linspace(0, 1, num_steps, dtype=np.float64)
    with np.errstate(divide="ignore"):
        log_snr = -2 * (np.log(np.tan(np.pi * t / 2)) + np.log(noise_shift))
    log_snr = np.clip(log_snr, -15, 15).astype(np.float32)
    acp = 1.0 / (1.0 + np.exp(-log_snr))
    acp[-1] = 0.0
    return acp


def make_alphas_cumprod(
    num_train_timesteps: int,
    beta_schedule: str,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    zero_terminal_snr: bool = True,
) -> np.ndarray:
    if "shifted_cosine:" in beta_schedule:
        noise_shift = float(beta_schedule.split(":")[1])
        return scaled_cosine_alphas(num_train_timesteps, noise_shift)
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float32)
    elif beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                            dtype=np.float32) ** 2
    elif beta_schedule == "squaredcos_cap_v2":
        betas = betas_for_alpha_bar(num_train_timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")
    if zero_terminal_snr:
        betas = enforce_zero_terminal_snr(betas)
    return np.cumprod(1.0 - betas).astype(np.float32)


def spaced_timesteps(num_train: int, num_inference: int, mode: str = "trailing",
                     steps_offset: int = 0) -> np.ndarray:
    """Inference timesteps, descending (reference scheduling_ddim.py:218-250)."""
    ratio = num_train // num_inference
    if mode == "leading":
        ts = (np.arange(0, num_inference) * ratio).round()[::-1].astype(np.int64)
    elif mode == "trailing":
        ts = np.arange(num_train, 0, -ratio).round().astype(np.int64) - 1
    elif mode == "linspace":
        ts = np.linspace(num_train, 1, num_inference).round().astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep mode {mode}")
    return ts + steps_offset


def _threshold_sample(sample: jnp.ndarray, ratio: float, max_value: float) -> jnp.ndarray:
    """Imagen dynamic thresholding (reference scheduling_ddpm.py:262-294)."""
    B = sample.shape[0]
    flat = jnp.abs(sample.astype(jnp.float32)).reshape(B, -1)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value).reshape((B,) + (1,) * (sample.ndim - 1))
    return jnp.clip(sample, -s, s) / s


def _expand(x, ndim):
    return x.reshape((-1,) + (1,) * (ndim - 1))


@dataclass(frozen=True)
class DiffusionScheduler:
    """Shared scheduler math. `kind` selects the DDPM (ancestral) or DDIM update."""

    kind: str = "ddpm"  # ddpm | ddim
    num_train_timesteps: int = 1000
    beta_schedule: str = "linear"
    beta_start: float = 0.0001
    beta_end: float = 0.02
    prediction_type: str = "v_prediction"
    variance_type: str = "fixed_small"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    zero_terminal_snr: bool = True
    eta: float = 0.0  # DDIM stochasticity

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return make_alphas_cumprod(
            self.num_train_timesteps, self.beta_schedule, self.beta_start,
            self.beta_end, self.zero_terminal_snr,
        )

    # ------------------------------------------------------------- training

    def _alpha_sigma(self, timesteps: jnp.ndarray, ndim: int):
        acp = jnp.asarray(self.alphas_cumprod)
        a = jnp.take(acp, timesteps)
        return _expand(jnp.sqrt(a), ndim), _expand(jnp.sqrt(1.0 - a), ndim)

    def add_noise(self, original: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray):
        sa, ss = self._alpha_sigma(timesteps, original.ndim)
        return sa * original + ss * noise

    def get_velocity(self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray):
        sa, ss = self._alpha_sigma(timesteps, sample.ndim)
        return sa * noise - ss * sample

    def get_noise(self, sample: jnp.ndarray, velocity: jnp.ndarray, timesteps: jnp.ndarray):
        sa, ss = self._alpha_sigma(timesteps, sample.ndim)
        return sa * velocity + ss * sample

    # ------------------------------------------------------------- sampling

    def _pred_x0_eps(self, model_output, sample, alpha_prod_t):
        beta_prod_t = 1.0 - alpha_prod_t
        sa, sb = jnp.sqrt(alpha_prod_t), jnp.sqrt(beta_prod_t)
        if self.prediction_type == "epsilon":
            x0 = (sample - sb * model_output) / sa
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - sa * x0) / sb
        elif self.prediction_type == "v_prediction":
            x0 = sa * sample - sb * model_output
            eps = sa * model_output + sb * sample
        else:
            raise ValueError(f"unknown prediction type {self.prediction_type}")
        if self.thresholding:
            x0 = _threshold_sample(x0, self.dynamic_thresholding_ratio, self.sample_max_value)
        elif self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0, eps

    def step(
        self,
        model_output: jnp.ndarray,
        t: jnp.ndarray,
        prev_t: jnp.ndarray,
        sample: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """One reverse-diffusion step x_t -> x_{prev_t}; t/prev_t are traced scalars
        so one compiled step serves the whole scan. fp32 math (reference
        diffusion_pipeline.py:126-127 forces fp32 too)."""
        model_output = model_output.astype(jnp.float32)
        sample = sample.astype(jnp.float32)
        ndim = sample.ndim
        acp = jnp.asarray(self.alphas_cumprod)
        alpha_prod_t = _expand(jnp.take(acp, t), ndim)
        alpha_prod_prev = _expand(
            jnp.where(prev_t >= 0, jnp.take(acp, jnp.clip(prev_t, 0)), 1.0), ndim
        )
        x0, eps = self._pred_x0_eps(model_output, sample, alpha_prod_t)

        if self.kind == "ddim":
            # reference scheduling_ddim.py:295-366
            beta_prod_t = 1.0 - alpha_prod_t
            var = (1.0 - alpha_prod_prev) / (1.0 - alpha_prod_t) * (
                1.0 - alpha_prod_t / alpha_prod_prev
            )
            std = self.eta * jnp.sqrt(var)
            direction = jnp.sqrt(jnp.maximum(1.0 - alpha_prod_prev - std**2, 0.0)) * eps
            prev = jnp.sqrt(alpha_prod_prev) * x0 + direction
            if self.eta > 0:
                noise = jax.random.normal(rng, model_output.shape, jnp.float32)
                prev = prev + std * noise
            return prev

        # DDPM (reference scheduling_ddpm.py:296-390)
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_prev = 1.0 - alpha_prod_prev
        current_alpha = alpha_prod_t / alpha_prod_prev
        current_beta = 1.0 - current_alpha
        x0_coeff = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
        xt_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
        prev = x0_coeff * x0 + xt_coeff * sample

        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, 1e-20)
        if self.variance_type == "fixed_small":
            std = jnp.sqrt(variance)
        elif self.variance_type == "fixed_small_log":
            std = jnp.exp(0.5 * jnp.log(variance))
        elif self.variance_type == "fixed_large":
            std = jnp.sqrt(current_beta)
        elif self.variance_type == "fixed_large_log":
            std = jnp.exp(0.5 * jnp.log(current_beta))
        else:
            raise ValueError(f"unsupported variance type {self.variance_type}")
        noise = jax.random.normal(rng, model_output.shape, jnp.float32)
        prev = prev + jnp.where(t > 0, std, 0.0) * noise
        return prev


def DDPMScheduler(**kw) -> DiffusionScheduler:
    return DiffusionScheduler(kind="ddpm", **kw)


def PNDMScheduler(**kw) -> DiffusionScheduler:
    """PNDM / PLMS (reference scheduling_pndm.py:74-430, skip_prk_steps mode).

    The pseudo-linear-multistep update keeps a 4-deep epsilon history; use
    `pndm_sample` (the history threads through the scan carry). The reference's
    duplicated-first-timestep refinement is simplified to a first-order step."""
    kw.setdefault("prediction_type", "epsilon")
    return DiffusionScheduler(kind="pndm", **kw)


def DDIMScheduler(**kw) -> DiffusionScheduler:
    return DiffusionScheduler(kind="ddim", **kw)


def pndm_step(scheduler: DiffusionScheduler, eps: jnp.ndarray, t, prev_t,
              sample: jnp.ndarray, ets: jnp.ndarray, n_ets: jnp.ndarray):
    """One PLMS step. ets: (4, ...) epsilon history (newest first), n_ets: count.
    Returns (prev_sample, new_ets, new_n_ets)."""
    sample = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    # convert prediction to epsilon space if needed
    acp = jnp.asarray(scheduler.alphas_cumprod)
    ndim = sample.ndim
    a_t = _expand(jnp.take(acp, t), ndim)
    if scheduler.prediction_type == "v_prediction":
        eps = jnp.sqrt(a_t) * eps + jnp.sqrt(1 - a_t) * sample
    elif scheduler.prediction_type == "sample":
        eps = (sample - jnp.sqrt(a_t) * eps) / jnp.sqrt(1 - a_t)

    new_ets = jnp.concatenate([eps[None], ets[:-1]], axis=0)
    n = jnp.minimum(n_ets + 1, 4)
    e0, e1, e2, e3 = new_ets[0], new_ets[1], new_ets[2], new_ets[3]
    o1 = e0
    o2 = (3 * e0 - e1) / 2
    o3 = (23 * e0 - 16 * e1 + 5 * e2) / 12
    o4 = (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24
    out = jnp.where(n == 1, o1, jnp.where(n == 2, o2, jnp.where(n == 3, o3, o4)))

    a_prev = _expand(jnp.where(prev_t >= 0, jnp.take(acp, jnp.clip(prev_t, 0)), 1.0), ndim)
    b_t, b_prev = 1 - a_t, 1 - a_prev
    sample_coeff = jnp.sqrt(a_prev / a_t)
    denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
    prev = sample_coeff * sample - (a_prev - a_t) * out / denom
    return prev, new_ets, n


def _pndm_prev_sample(scheduler: DiffusionScheduler, sample, t, prev_t, eps):
    """PNDM transfer formula (reference scheduling_pndm.py _get_prev_sample)."""
    acp = jnp.asarray(scheduler.alphas_cumprod)
    ndim = sample.ndim
    a_t = _expand(jnp.take(acp, t), ndim)
    # PNDM final alpha: set_alpha_to_one=False default -> alphas_cumprod[0]
    # (reference scheduling_pndm.py:150-155)
    a_prev = _expand(jnp.where(prev_t >= 0, jnp.take(acp, jnp.clip(prev_t, 0)), acp[0]), ndim)
    b_t, b_prev = 1 - a_t, 1 - a_prev
    sample_coeff = jnp.sqrt(a_prev / a_t)
    denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
    return sample_coeff * sample - (a_prev - a_t) * eps / denom


def _to_epsilon(scheduler: DiffusionScheduler, pred, sample, t):
    acp = jnp.asarray(scheduler.alphas_cumprod)
    a_t = _expand(jnp.take(acp, t), sample.ndim)
    if scheduler.prediction_type == "v_prediction":
        return jnp.sqrt(a_t) * pred + jnp.sqrt(1 - a_t) * sample
    if scheduler.prediction_type == "sample":
        return (sample - jnp.sqrt(a_t) * pred) / jnp.sqrt(1 - a_t)
    return pred


def pndm_sample(model_fn, scheduler: DiffusionScheduler, rng: jax.Array,
                cond: jnp.ndarray, sample_shape, timesteps: Optional[int] = None,
                scheduler_timesteps_mode: str = "leading") -> jnp.ndarray:
    """PLMS sampling loop as one lax.scan, with the crowsonkb first-step Heun
    correction the reference uses via skip_prk_steps (the SD 1.5 scheduler
    config; scheduling_pndm.py:210-222, :359-379): the second-highest timestep
    is visited twice — first to complete a 2nd-order (Heun) version of step 0
    from the saved pre-step sample, then as a regular PLMS step."""
    import numpy as np_

    n_steps = timesteps or scheduler.num_train_timesteps
    delta = scheduler.num_train_timesteps // n_steps
    base = np_.asarray(
        spaced_timesteps(scheduler.num_train_timesteps, n_steps, scheduler_timesteps_mode)
    )  # descending
    if len(base) >= 2:
        t_eval = np_.concatenate([base[:1], base[1:2], base[1:]])
        t_upd = np_.concatenate([base[:1], base[:1], base[1:]])
        is_heun = np_.zeros(len(t_eval), bool)
        is_heun[1] = True
        is_first = np_.zeros(len(t_eval), bool)
        is_first[0] = True
    else:
        t_eval = t_upd = base
        is_heun = np_.zeros(1, bool)
        is_first = np_.ones(1, bool)
    prev_upd = t_upd - delta

    rng, rng_init = jax.random.split(rng)
    image = jax.random.normal(rng_init, sample_shape, jnp.float32)
    ets0 = jnp.zeros((4,) + tuple(sample_shape), jnp.float32)

    def body(carry, xs):
        x, cur, ets, n_ets = carry
        t_e, t_u, p_u, first, heun = xs
        eps = _to_epsilon(scheduler, model_fn(x, t_e, cond).astype(jnp.float32),
                          x, t_e)
        shifted = jnp.concatenate([eps[None], ets[:-1]], axis=0)
        n1 = jnp.minimum(n_ets + 1, 4)
        new_ets = jnp.where(heun, ets, shifted)
        new_n = jnp.where(heun, n_ets, n1)
        e0, e1, e2, e3 = new_ets[0], new_ets[1], new_ets[2], new_ets[3]
        o_ab = jnp.where(
            new_n == 1, e0,
            jnp.where(new_n == 2, (3 * e0 - e1) / 2,
                      jnp.where(new_n == 3, (23 * e0 - 16 * e1 + 5 * e2) / 12,
                                (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24)))
        out = jnp.where(heun, (ets[0] + eps) / 2, o_ab)
        base_sample = jnp.where(heun, cur, x)
        prev = _pndm_prev_sample(scheduler, base_sample, t_u, p_u, out)
        new_cur = jnp.where(first, x, cur)
        return (prev, new_cur, new_ets, new_n), None

    xs = (jnp.asarray(t_eval), jnp.asarray(t_upd), jnp.asarray(prev_upd),
          jnp.asarray(is_first), jnp.asarray(is_heun))
    (image, _, _, _), _ = jax.lax.scan(
        body, (image, jnp.zeros_like(image), ets0, jnp.int32(0)), xs
    )
    return image


# ------------------------------------------------------------------ pipeline

def diffusion_sample(
    model_fn: Callable,
    scheduler: DiffusionScheduler,
    rng: jax.Array,
    cond: jnp.ndarray,
    sample_shape: Tuple[int, ...],
    timesteps: Optional[int] = None,
    guidance_scale: float = 0.0,
    guidance_rescale: float = 0.0,
    scheduler_timesteps_mode: str = "trailing",
    model_fn_uncond: Optional[Callable] = None,
) -> jnp.ndarray:
    """Conditional diffusion sampling as ONE lax.scan (reference PipelineCond,
    diffusion_pipeline.py:37-133).

    model_fn(noisy, t, cond) -> model prediction. With CFG, model_fn_uncond
    provides the unconditional branch; both are evaluated per step.
    """
    n_steps = timesteps or scheduler.num_train_timesteps
    ts = spaced_timesteps(scheduler.num_train_timesteps, n_steps, scheduler_timesteps_mode)
    if scheduler.kind == "ddim":
        prev_ts = ts - scheduler.num_train_timesteps // n_steps
    else:
        prev_ts = np.concatenate([ts[1:], np.array([-1], dtype=ts.dtype)])

    rng, rng_init = jax.random.split(rng)
    image = jax.random.normal(rng_init, sample_shape, jnp.float32)
    do_cfg = guidance_scale > 1.0

    def body(carry, tprev):
        image, rng = carry
        t, prev_t = tprev
        rng, rng_step = jax.random.split(rng)
        out = model_fn(image, t, cond)
        if do_cfg:
            out_uncond = (model_fn_uncond or model_fn)(image, t, cond)
            out_cfg = out_uncond + guidance_scale * (out - out_uncond)
            if guidance_rescale > 0.0:
                # arXiv:2305.08891 eq. 15-16
                std_pos = jnp.std(out, axis=tuple(range(1, out.ndim)), keepdims=True)
                std_cfg = jnp.std(out_cfg, axis=tuple(range(1, out.ndim)), keepdims=True)
                rescaled = out_cfg * (std_pos / (std_cfg + 1e-8))
                out = guidance_rescale * rescaled + (1.0 - guidance_rescale) * out_cfg
            else:
                out = out_cfg
        image = scheduler.step(out, t, prev_t, image, rng_step)
        return (image, rng), None

    (image, _), _ = jax.lax.scan(
        body, (image, rng), (jnp.asarray(ts), jnp.asarray(prev_ts))
    )
    return image
