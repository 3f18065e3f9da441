"""Diffusion samplers as single-jit `lax.scan` loops over precomputed tables.

Replaces the reference's Python-loop pipelines (DDPMPipeline at
train_from_scratch.py:121-125; StableDiffusionPipeline 25-step UniPC+CFG at
train_with_lora_per_class.py:73-78) with compiler-friendly scans: the entire
K-step denoise — including classifier-free guidance via batch doubling — is
one XLA computation, so the UNet is traced once and every step reuses the
same fused program. This loop is THE throughput metric (BASELINE.json).

All samplers share the signature
    sample_fn(model_fn, schedule, shape, key, num_steps, ...) -> x0-like
where `model_fn(x, t_batch) -> model_out` is an already-conditioned denoiser
(use `with_cfg` to wrap a conditional model).

Samplers:
* `ddpm_sample`  — ancestral, fixed-small variance, optional x0 clipping
  (DDPMScheduler/DDPMPipeline parity — the scratch path).
* `ddim_sample`  — DDIM with η∈[0,1]; η=0 is deterministic (the legacy
  `sampling.sample` recovered from reference bytecode, SURVEY C20).
* `dpmpp_2m_sample` — DPM-Solver++(2M) multistep, data prediction.
* `unipc_sample` — UniPC order-2 predictor–corrector (B(h)=expm1(h), "bh2"),
  data prediction — the pretrained path's scheduler
  (train_with_lora_per_class.py:308).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from polyp_tpu.diffusion.schedule import DiffusionSchedule, inference_timesteps

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]


def with_cfg(raw_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
             cond: jax.Array, uncond: jax.Array,
             guidance_scale: float) -> ModelFn:
    """Classifier-free guidance by batch doubling — one fused forward for
    (uncond, cond), mirroring StableDiffusionPipeline's 2× batch trick."""

    def model_fn(x: jax.Array, t: jax.Array) -> jax.Array:
        n = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        emb2 = jnp.concatenate([
            jnp.broadcast_to(uncond, (n,) + uncond.shape[-2:]),
            jnp.broadcast_to(cond, (n,) + cond.shape[-2:]),
        ], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        out = raw_fn(x2, t2, emb2)
        out_u, out_c = jnp.split(out, 2, axis=0)
        return out_u + guidance_scale * (out_c - out_u)

    return model_fn


def _bcast_t(t: jax.Array, n: int) -> jax.Array:
    return jnp.full((n,), t, jnp.int32)


# ---------------------------------------------------------------------------
# DDPM ancestral
# ---------------------------------------------------------------------------

def ddpm_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                shape: tuple[int, ...], key: jax.Array,
                num_steps: int | None = None,
                clip_sample: bool = True) -> jax.Array:
    T = schedule.num_train_timesteps
    num_steps = T if num_steps is None else num_steps
    ts = inference_timesteps(T, num_steps, "leading")  # DDPMScheduler default
    abar = schedule.alphas_cumprod
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, jnp.float32)

    def step(carry, args):
        x, key = carry
        i, t = args
        t_prev = jnp.where(i + 1 < num_steps, ts[jnp.minimum(i + 1, num_steps - 1)], -1)
        abar_t = abar[t]
        abar_prev = jnp.where(t_prev >= 0, abar[jnp.maximum(t_prev, 0)], 1.0)
        alpha_t = abar_t / abar_prev
        beta_t = 1.0 - alpha_t

        out = model_fn(x, _bcast_t(t, shape[0]))
        x0, eps = schedule.to_x0_eps(out, x, t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        # posterior mean q(x_{t-1}|x_t, x0)
        coef_x0 = jnp.sqrt(abar_prev) * beta_t / (1.0 - abar_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - abar_prev) / (1.0 - abar_t)
        mean = coef_x0 * x0 + coef_xt * x
        var = jnp.clip(beta_t * (1.0 - abar_prev) / (1.0 - abar_t), 1e-20)
        key, nkey = jax.random.split(key)
        noise = jax.random.normal(nkey, shape, jnp.float32)
        x = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key),
                             (jnp.arange(num_steps), ts))
    return x


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------

def ddim_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                shape: tuple[int, ...], key: jax.Array,
                num_steps: int = 50, eta: float = 0.0,
                clip_sample: bool = False,
                steps_offset: int = 1) -> jax.Array:
    T = schedule.num_train_timesteps
    # leading spacing with steps_offset=1 — the SD-v1 scheduler-config
    # convention (DDIMScheduler under StableDiffusionPipeline).
    ts = inference_timesteps(T, num_steps, "leading", steps_offset)
    abar = schedule.alphas_cumprod
    key, init_key = jax.random.split(key)
    x = jax.random.normal(init_key, shape, jnp.float32)

    def step(carry, args):
        x, key = carry
        i, t = args
        t_prev = jnp.where(i + 1 < num_steps, ts[jnp.minimum(i + 1, num_steps - 1)], -1)
        abar_t = abar[t]
        abar_prev = jnp.where(t_prev >= 0, abar[jnp.maximum(t_prev, 0)], 1.0)

        out = model_fn(x, _bcast_t(t, shape[0]))
        x0, eps = schedule.to_x0_eps(out, x, t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (x - jnp.sqrt(abar_t) * x0) / jnp.sqrt(1.0 - abar_t)

        sigma = eta * jnp.sqrt((1.0 - abar_prev) / (1.0 - abar_t)) \
            * jnp.sqrt(1.0 - abar_t / abar_prev)
        dir_xt = jnp.sqrt(jnp.clip(1.0 - abar_prev - sigma ** 2, 0.0)) * eps
        key, nkey = jax.random.split(key)
        noise = jax.random.normal(nkey, shape, jnp.float32)
        x = jnp.sqrt(abar_prev) * x0 + dir_xt + sigma * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), (jnp.arange(num_steps), ts))
    return x


# ---------------------------------------------------------------------------
# Multistep solvers in log-SNR space (data prediction)
# ---------------------------------------------------------------------------

def _lambda_tables(schedule: DiffusionSchedule, ts: jax.Array):
    """(α, σ, λ) at each inference timestep plus the final λ at t→0."""
    abar = schedule.alphas_cumprod[ts]
    alpha = jnp.sqrt(abar)
    sigma = jnp.sqrt(1.0 - abar)
    lam = jnp.log(alpha) - jnp.log(sigma)
    return alpha, sigma, lam


def dpmpp_2m_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                    shape: tuple[int, ...], key: jax.Array,
                    num_steps: int = 25) -> jax.Array:
    """DPM-Solver++(2M): second-order multistep, deterministic."""
    # 'linspace' (first eval at t=T-1) — DPMSolverMultistepScheduler default.
    ts = inference_timesteps(schedule.num_train_timesteps, num_steps,
                             "linspace")
    alpha, sigma, lam = _lambda_tables(schedule, ts)
    # target points: ts shifted by one; the last target is t=0 (α=1, σ→0⁺)
    alpha_next = jnp.concatenate([alpha[1:], jnp.ones((1,))])
    sigma_next = jnp.concatenate([sigma[1:], jnp.full((1,), 1e-3)])
    lam_next = jnp.log(alpha_next) - jnp.log(sigma_next)

    x = jax.random.normal(key, shape, jnp.float32)

    def step(carry, i):
        x, x0_prev, lam_prev = carry
        t = ts[i]
        out = model_fn(x, _bcast_t(t, shape[0]))
        x0, _ = schedule.to_x0_eps(out, x, t)

        h = lam_next[i] - lam[i]
        h_last = lam[i] - lam_prev
        r = h_last / jnp.maximum(h, 1e-8)
        denoised = jnp.where(
            i == 0, x0,
            (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev)
        x = (sigma_next[i] / sigma[i]) * x - alpha_next[i] * jnp.expm1(-h) * denoised
        return (x, x0, lam[i]), None

    (x, _, _), _ = jax.lax.scan(step, (x, jnp.zeros(shape, jnp.float32),
                                       lam[0]), jnp.arange(num_steps))
    return x


def unipc_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                 shape: tuple[int, ...], key: jax.Array,
                 num_steps: int = 25, use_corrector: bool = True) -> jax.Array:
    """UniPC order-2, B(h)=expm1(h) ("bh2"), data prediction, with the UniC
    corrector applied to each step using the next model evaluation —
    the default configuration of the pretrained path's scheduler.

    Derivation sketch (UniPC paper eq. 14-16, data-prediction form): with
    λ the log-SNR, h = λ_t − λ_s, history node ratio r = (λ_{s₁} − λ_s)/h,
    D₁ = (x̂₀(s₁) − x̂₀(s))/r:
      predictor: x_t = (σ_t/σ_s)x_s − α_t·φ₁·x̂₀(s) − α_t·B(h)·ρ_p·D₁
      corrector adds the new node at r=1 with D = x̂₀(t) − x̂₀(s).
    where φ₁ = expm1(−h) and the ρ coefficients satisfy the order-2
    condition ρ·B(h) = φ₂ := φ₁/(−h) − 1.
    """
    # 'linspace' (first eval at t=T-1=999) — UniPCMultistepScheduler default,
    # the spacing the reference's pretrained path actually runs
    # (train_with_lora_per_class.py:308).
    ts = inference_timesteps(schedule.num_train_timesteps, num_steps,
                             "linspace")
    alpha, sigma, lam = _lambda_tables(schedule, ts)
    alpha_next = jnp.concatenate([alpha[1:], jnp.ones((1,))])
    sigma_next = jnp.concatenate([sigma[1:], jnp.full((1,), 1e-3)])
    lam_next = jnp.log(alpha_next) - jnp.log(sigma_next)

    x = jax.random.normal(key, shape, jnp.float32)

    def coeffs(h):
        hh = -h
        phi1 = jnp.expm1(hh)
        phi2 = phi1 / hh - 1.0
        b_h = jnp.expm1(hh)  # bh2
        rho = phi2 / b_h
        return phi1, b_h, rho

    def predictor(x_s, x0_s, x0_hist, r, i):
        h = lam_next[i] - lam[i]
        phi1, b_h, rho = coeffs(h)
        d1 = (x0_hist - x0_s) / jnp.where(jnp.abs(r) > 1e-8, r, 1.0)
        second = jnp.where(i == 0, jnp.zeros_like(x_s), b_h * rho * d1)
        return (sigma_next[i] / sigma[i]) * x_s \
            - alpha_next[i] * (phi1 * x0_s + second)

    def corrector(x_s, x0_s, x0_t, x0_hist, r, i):
        # step s=ts[i-1] → t=ts[i]; node at r=1 is the fresh eval x̂₀(t).
        h = lam[i] - lam[i - 1]
        phi1, b_h, rho = coeffs(h)
        # order-2 corrector with the single node r_c = 1:
        d_new = x0_t - x0_s
        return (sigma[i] / sigma[i - 1]) * x_s \
            - alpha[i] * (phi1 * x0_s + b_h * rho * d_new)

    def step(carry, i):
        x, x_last, x0_last, lam_last = carry
        t = ts[i]
        out = model_fn(x, _bcast_t(t, shape[0]))
        x0, _ = schedule.to_x0_eps(out, x, t)

        if use_corrector:
            corrected = corrector(x_last, x0_last, x0,
                                  x0_last, 1.0, jnp.maximum(i, 1))
            x = jnp.where(i > 0, corrected, x)

        r = (lam_last - lam[i]) / jnp.maximum(lam_next[i] - lam[i], 1e-8)
        x_next = predictor(x, x0, x0_last, r, i)
        return (x_next, x, x0, lam[i]), None

    init = (x, x, jnp.zeros(shape, jnp.float32), lam[0])
    (x, _, _, _), _ = jax.lax.scan(step, init, jnp.arange(num_steps))
    return x


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------

SAMPLERS = {
    "ddpm": ddpm_sample,
    "ddim": ddim_sample,
    "dpmpp_2m": dpmpp_2m_sample,
    "unipc": unipc_sample,
}


def sample(name: str, model_fn: ModelFn, schedule: DiffusionSchedule,
           shape: tuple[int, ...], key: jax.Array, num_steps: int,
           **kwargs) -> jax.Array:
    return SAMPLERS[name](model_fn, schedule, shape, key,
                          num_steps=num_steps, **kwargs)
