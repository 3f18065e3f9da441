"""Diffusion samplers as single-jit `lax.scan` loops over precomputed tables.

Replaces the reference's Python-loop pipelines (DDPMPipeline at
train_from_scratch.py:121-125; StableDiffusionPipeline 25-step UniPC+CFG at
train_with_lora_per_class.py:73-78) with compiler-friendly scans: the entire
K-step denoise — including classifier-free guidance via batch doubling — is
one XLA computation, so the UNet is traced once and every step reuses the
same fused program. This loop is THE throughput metric (BASELINE.json).

All samplers share the signature
    sample_fn(model_fn, schedule, shape, key, num_steps, ..., init=None) -> x0-like
where `model_fn(x, t_batch) -> model_out` is an already-conditioned denoiser.
`init` optionally supplies the starting latents x_T (shape `shape`) instead
of drawing them from `key` — the hook for PER-SAMPLE initial noise, which
makes a sample's output independent of what it is batched with under the
deterministic samplers (ddim η=0, dpmpp_2m, unipc): the serving layer's
request-coalescing contract (serve.py). The key chain is split identically
whether or not `init` is given, so the stochastic samplers' per-step noise
is unaffected by the flag. `model_fn` can also be a SEGMENT list
[(num_steps_i, model_fn_i), ...] (use `with_cfg` to wrap a conditional
model) run as consecutive scans with continued step indices (bit-identical
to one scan; see _as_segments), the mechanism behind the hybrid-precision
trajectory (pipeline._precision_split).

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

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from polyp_tpu.diffusion.schedule import DiffusionSchedule, inference_timesteps
from polyp_tpu.ops import dispatch

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]

# (spacing, steps_offset) each sampler uses — the diffusers-parity defaults
# documented on the samplers below. Exposed via `sampler_timesteps` so
# callers (e.g. the hybrid-precision quantization split, pipeline.py) can
# reason about WHICH timestep values a trajectory will visit without
# re-deriving per-sampler conventions.
SAMPLER_SPACING: dict[str, tuple[str, int]] = {
    "ddpm": ("leading", 0),
    "ddim": ("leading", 1),
    "dpmpp_2m": ("linspace", 0),
    "unipc": ("linspace", 0),
}


def sampler_timesteps(name: str, num_train_timesteps: int,
                      num_steps: int) -> jax.Array:
    """The exact descending timestep sequence `sample(name, ...)` visits
    (at the samplers' default spacing arguments)."""
    spacing, offset = SAMPLER_SPACING[name]
    return inference_timesteps(num_train_timesteps, num_steps, spacing,
                               offset)


def _inference_scope(fn):
    """Samplers are gradient-free by construction, so they trace under
    ops/dispatch.inference() — enabling the inference-only fused kernels
    (fused GEGLU) that training must not dispatch (see ops/dispatch.py)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with dispatch.inference():
            return fn(*args, **kwargs)

    return wrapped


def with_cfg(raw_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
             cond: jax.Array, uncond: jax.Array,
             guidance_scale: float | None) -> ModelFn:
    """Classifier-free guidance by batch doubling — one fused forward for
    (uncond, cond), mirroring StableDiffusionPipeline's 2× batch trick.

    guidance_scale=None means guidance is already FOLDED into the model
    (a progressively-distilled student, train/distill.py): the model runs
    cond-only at 1× batch — the throughput payoff of CFG folding."""

    if guidance_scale is None:
        def cond_only(x: jax.Array, t: jax.Array) -> jax.Array:
            n = x.shape[0]
            emb = jnp.broadcast_to(cond, (n,) + cond.shape[-2:])
            return raw_fn(x, t, emb)

        return cond_only

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


# Every sampler accepts either one model_fn or a SEGMENT list
# [(num_steps_i, model_fn_i), ...] summing to num_steps: the scan is run as
# consecutive segments with CONTINUED step indices, which is bit-identical
# to the single scan (each step body depends only on (i, t, carry)) while
# letting every segment trace a different model function. This is how the
# hybrid-precision trajectory (pipeline._precision_split) switches the
# UNet between quantized and full precision WITHOUT a lax.cond in the scan
# body — XLA does not hoist loop-invariant code (e.g. the in-graph int8
# weight quantization, ~860M-param reads per step on the SD UNet) out of a
# conditional branch, but hoists it fine out of each segment's own scan
# (verified on HLO: 58/58 weight-quantize rounds stayed in-loop under
# lax.cond, 0 under segmented scans).

def _as_segments(model_fn, num_steps: int) -> list[tuple[int, ModelFn]]:
    if callable(model_fn):
        return [(num_steps, model_fn)]
    segments = [(int(n), fn) for n, fn in model_fn]
    total = sum(n for n, _ in segments)
    if total != num_steps:
        raise ValueError(f"model_fn segments cover {total} steps, "
                         f"sampler runs {num_steps}")
    return [(n, fn) for n, fn in segments if n > 0]


def _segmented_scan(step_factory, carry, xs_of, model_fn, num_steps: int):
    """Run `step_factory(fn)` over consecutive index ranges, one scan per
    segment. `xs_of(lo, hi)` builds the scan xs for steps [lo, hi)."""
    off = 0
    for n, fn in _as_segments(model_fn, num_steps):
        carry, _ = jax.lax.scan(step_factory(fn), carry, xs_of(off, off + n))
        off += n
    return carry


# ---------------------------------------------------------------------------
# DDPM ancestral
# ---------------------------------------------------------------------------

@_inference_scope
def ddpm_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                shape: tuple[int, ...], key: jax.Array,
                num_steps: int | None = None,
                clip_sample: bool = True,
                init: jax.Array | None = None) -> jax.Array:
    T = schedule.num_train_timesteps
    num_steps = T if num_steps is None else num_steps
    ts = sampler_timesteps("ddpm", T, num_steps)  # DDPMScheduler default
    abar = schedule.alphas_cumprod
    key, init_key = jax.random.split(key)
    x = (jnp.asarray(init, jnp.float32) if init is not None
         else jax.random.normal(init_key, shape, jnp.float32))

    def step_for(fn):
        def step(carry, args):
            x, key = carry
            i, t = args
            t_prev = jnp.where(i + 1 < num_steps,
                               ts[jnp.minimum(i + 1, num_steps - 1)], -1)
            abar_t = abar[t]
            # diffusers DDPMScheduler uses exactly 1.0 past the last step
            abar_prev = jnp.where(t_prev >= 0, abar[jnp.maximum(t_prev, 0)],
                                  1.0)
            alpha_t = abar_t / abar_prev
            beta_t = 1.0 - alpha_t

            out = fn(x, _bcast_t(t, shape[0]))
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
        return step

    x, _ = _segmented_scan(step_for, (x, key),
                           lambda lo, hi: (jnp.arange(lo, hi), ts[lo:hi]),
                           model_fn, num_steps)
    return x


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------

@_inference_scope
def ddim_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                shape: tuple[int, ...], key: jax.Array,
                num_steps: int = 50, eta: float = 0.0,
                clip_sample: bool = False,
                steps_offset: int = 1,
                final_alpha_to_one: bool = False,
                spacing: str = "leading",
                init: jax.Array | None = None) -> jax.Array:
    T = schedule.num_train_timesteps
    # leading spacing with steps_offset=1 — the SD-v1 scheduler-config
    # convention (DDIMScheduler under StableDiffusionPipeline). Likewise
    # final_alpha_to_one=False: SD-v1's scheduler config sets
    # set_alpha_to_one=False, so the last step (prev_t < 0) uses
    # ᾱ₀ = alphas_cumprod[0], not exactly 1.0 (diffusers' plain
    # DDIMScheduler() default is True — flip the flag for that convention).
    # Progressively-distilled students instead sample with
    # spacing="trailing", steps_offset=0 — the grid they were distilled
    # onto (train/distill.py nested-grid invariant).
    ts = inference_timesteps(T, num_steps, spacing, steps_offset)
    abar = schedule.alphas_cumprod
    final_abar = jnp.asarray(1.0) if final_alpha_to_one else abar[0]
    key, init_key = jax.random.split(key)
    x = (jnp.asarray(init, jnp.float32) if init is not None
         else jax.random.normal(init_key, shape, jnp.float32))

    def step_for(fn):
        def step(carry, args):
            x, key = carry
            i, t = args
            t_prev = jnp.where(i + 1 < num_steps,
                               ts[jnp.minimum(i + 1, num_steps - 1)], -1)
            abar_t = abar[t]
            abar_prev = jnp.where(t_prev >= 0, abar[jnp.maximum(t_prev, 0)],
                                  final_abar)

            out = fn(x, _bcast_t(t, shape[0]))
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
        return step

    x, _ = _segmented_scan(step_for, (x, key),
                           lambda lo, hi: (jnp.arange(lo, hi), ts[lo:hi]),
                           model_fn, num_steps)
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


@_inference_scope
def dpmpp_2m_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                    shape: tuple[int, ...], key: jax.Array,
                    num_steps: int = 25,
                    init: jax.Array | None = None) -> jax.Array:
    """DPM-Solver++(2M) (Lu et al. 2022, Algorithm 2; data prediction,
    midpoint solver) with DPMSolverMultistepScheduler's conventions:
    order ramps 1→2, `lower_order_final` drops the last step to order 1
    whose target is σ=0 exactly — so the final output is the last x̂₀
    (with α_t=1, σ_t=0: x = −α_t·φ₁·x̂₀ = x̂₀)."""
    # 'linspace' (first eval at t=T-1) — DPMSolverMultistepScheduler default.
    ts = sampler_timesteps("dpmpp_2m", schedule.num_train_timesteps,
                           num_steps)
    alpha, sigma, lam = _lambda_tables(schedule, ts)
    # target tables; the final σ=0 target is special-cased in the step
    alpha_next = jnp.concatenate([alpha[1:], jnp.ones((1,))])
    sigma_next = jnp.concatenate([sigma[1:], jnp.ones((1,))])  # dummy tail
    lam_next = jnp.log(alpha_next) - jnp.log(sigma_next)

    x = (jnp.asarray(init, jnp.float32) if init is not None
         else jax.random.normal(key, shape, jnp.float32))

    def step_for(fn):
        def step(carry, i):
            x, x0_prev, lam_prev = carry
            t = ts[i]
            out = fn(x, _bcast_t(t, shape[0]))
            x0, _ = schedule.to_x0_eps(out, x, t)

            h = lam_next[i] - lam[i]
            h_last = lam[i] - lam_prev
            r = h_last / jnp.where(jnp.abs(h) > 1e-8, h, 1.0)
            denoised = jnp.where(
                i == 0, x0,  # first step: order 1 (no history yet)
                (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev)
            x_next = (sigma_next[i] / sigma[i]) * x \
                - alpha_next[i] * jnp.expm1(-h) * denoised
            # lower_order_final: last step integrates to σ_t=0 at order 1
            # → x̂₀
            x_next = jnp.where(i == num_steps - 1, x0, x_next)
            return (x_next, x0, lam[i]), None
        return step

    x, _, _ = _segmented_scan(
        step_for, (x, jnp.zeros(shape, jnp.float32), lam[0]),
        lambda lo, hi: jnp.arange(lo, hi), model_fn, num_steps)
    return x


@_inference_scope
def unipc_sample(model_fn: ModelFn, schedule: DiffusionSchedule,
                 shape: tuple[int, ...], key: jax.Array,
                 num_steps: int = 25, use_corrector: bool = True,
                 init: jax.Array | None = None) -> jax.Array:
    """UniPC (Zhao et al. 2023) order 2, B(h)=expm1(h) ("bh2"), data
    prediction — matching UniPCMultistepScheduler's exact step structure,
    the reference's scheduler (train_with_lora_per_class.py:308):

    * step 0: UniP order 1 (no history);
    * step i≥1: UniC corrects the previous transition using the fresh model
      eval — order 1 at i=1 (ρ=1/2 on the new node), order 2 afterwards
      (2×2 Vandermonde solve over the history node r₁=(λ_{s₁}−λ_s)/h and
      the new node r=1) — then UniP order 2 predicts the next sample;
    * `lower_order_final`: the last predictor is order 1 with target σ=0
      exactly, so the final output is the last (uncorrected-eval) x̂₀.

    Coefficients (paper eq. 14-16 / diffusers uni_pc): with hh=−h,
    φ₁=expm1(hh), B(h)=φ₁ (bh2), φ₂=φ₁/hh−1, φ₃'=φ₂/hh−1/2:
      UniP-2: x_t = (σ_t/σ_s)x_s − α_t(φ₁·m₀ + B·ρ_p·D₁),  ρ_p=φ₂/B,
              D₁=(m₁−m₀)/r₁
      UniC-2: solve [[1,1],[r₁,1]]·ρ = [φ₂/B, 2φ₃'/B] over nodes (r₁, 1).
    """
    # 'linspace' (first eval at t=T-1=999) — UniPCMultistepScheduler default.
    ts = sampler_timesteps("unipc", schedule.num_train_timesteps, num_steps)
    alpha, sigma, lam = _lambda_tables(schedule, ts)
    alpha_next = jnp.concatenate([alpha[1:], jnp.ones((1,))])
    sigma_next = jnp.concatenate([sigma[1:], jnp.ones((1,))])  # dummy tail
    lam_next = jnp.log(alpha_next) - jnp.log(sigma_next)

    x = (jnp.asarray(init, jnp.float32) if init is not None
         else jax.random.normal(key, shape, jnp.float32))

    def phis(h):
        hh = -h
        phi1 = jnp.expm1(hh)
        b_h = phi1  # bh2: B(h) = expm1(hh)
        phi2 = phi1 / hh - 1.0
        phi3 = phi2 / hh - 0.5
        return phi1, b_h, phi2, phi3

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) > 1e-10, b, 1.0)

    def step_for(fn):
        def step(carry, i):
            x, x_corr_prev, m_prev, m_prev2 = carry
            t = ts[i]
            out = fn(x, _bcast_t(t, shape[0]))
            m = schedule.to_x0_eps(out, x, t)[0]  # x̂₀ at ts[i], uncorrected x

            # ---- UniC: correct the i-1 → i transition ----------------------
            h_c = lam[i] - lam[i - 1]
            phi1c, bhc, phi2c, phi3c = phis(h_c)
            d1_new = m - m_prev
            # order 1 (used at i == 1): single new node, ρ = 1/2
            x_c1 = (sigma[i] / sigma[i - 1]) * x_corr_prev \
                - alpha[i] * (phi1c * m_prev + bhc * 0.5 * d1_new)
            # order 2: history node r1 + new node 1
            r1c = safe_div(lam[i - 2] - lam[i - 1], h_c)
            d1_hist = safe_div(m_prev2 - m_prev, r1c)
            b1 = phi2c / bhc
            b2 = 2.0 * phi3c / bhc
            rho1 = safe_div(b1 - b2, 1.0 - r1c)
            rho2 = b1 - rho1
            x_c2 = (sigma[i] / sigma[i - 1]) * x_corr_prev \
                - alpha[i] * (phi1c * m_prev
                              + bhc * (rho1 * d1_hist + rho2 * d1_new))
            x_corr = jnp.where(i == 0, x, jnp.where(i == 1, x_c1, x_c2)) \
                if use_corrector else x

            # ---- UniP: predict the i → i+1 sample --------------------------
            h_p = lam_next[i] - lam[i]
            phi1p, bhp, phi2p, _ = phis(h_p)
            x_p1 = (sigma_next[i] / sigma[i]) * x_corr - alpha_next[i] * phi1p * m
            r1p = safe_div(lam[i - 1] - lam[i], h_p)
            d1p = safe_div(m_prev - m, r1p)
            rho_p = phi2p / bhp
            x_p2 = x_p1 - alpha_next[i] * bhp * rho_p * d1p
            x_next = jnp.where(i == 0, x_p1, x_p2)
            # lower_order_final: last step is order 1 with σ_t = 0 → x̂₀ exactly
            x_next = jnp.where(i == num_steps - 1, m, x_next)
            return (x_next, x_corr, m, m_prev), None
        return step

    init = (x, x, jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    x, _, _, _ = _segmented_scan(step_for, init,
                                 lambda lo, hi: jnp.arange(lo, hi),
                                 model_fn, num_steps)
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


def sample(name: str,
           model_fn: ModelFn | list[tuple[int, ModelFn]],
           schedule: DiffusionSchedule,
           shape: tuple[int, ...], key: jax.Array, num_steps: int,
           **kwargs) -> jax.Array:
    return SAMPLERS[name](model_fn, schedule, shape, key,
                          num_steps=num_steps, **kwargs)
