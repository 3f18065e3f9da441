"""Noise schedules: β tables, ᾱ cumulative products, forward-process q-sample.

TPU-native replacement for diffusers' DDPMScheduler/UniPCMultistepScheduler
state (used at train_from_scratch.py:270, train_with_lora_per_class.py:308):
all tables are precomputed jnp arrays gathered by traced timestep indices, so
`add_noise` and the samplers stay inside one jit region with no host sync.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DiffusionSchedule:
    """Immutable pytree of schedule tables (safe to close over or pass
    through jit)."""

    betas: jax.Array            # [T]
    alphas_cumprod: jax.Array   # [T]
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")

    @staticmethod
    def create(num_train_timesteps: int = 1000,
               beta_schedule: str = "linear",
               beta_start: float = 1e-4,
               beta_end: float = 2e-2,
               prediction_type: str = "epsilon") -> "DiffusionSchedule":
        """`linear` matches DDPMScheduler defaults (scratch path);
        `scaled_linear` with (0.00085, 0.012) is the SD-v1 schedule
        (pretrained path)."""
        t = jnp.arange(num_train_timesteps, dtype=jnp.float64)
        if beta_schedule == "linear":
            betas = jnp.linspace(beta_start, beta_end, num_train_timesteps,
                                 dtype=jnp.float64)
        elif beta_schedule == "scaled_linear":
            betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                                 num_train_timesteps, dtype=jnp.float64) ** 2
        elif beta_schedule == "squaredcos_cap_v2":
            def abar(i):
                return jnp.cos((i / num_train_timesteps + 0.008) / 1.008
                               * jnp.pi / 2) ** 2
            betas = jnp.clip(1.0 - abar(t + 1) / abar(t), 0.0, 0.999)
        else:
            raise ValueError(f"unknown beta_schedule: {beta_schedule}")
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return DiffusionSchedule(
            betas=betas.astype(jnp.float32),
            alphas_cumprod=alphas_cumprod.astype(jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
        )

    # -- forward process --------------------------------------------------
    def add_noise(self, x0: jax.Array, noise: jax.Array,
                  timesteps: jax.Array) -> jax.Array:
        """q(x_t | x_0): √ᾱ_t·x₀ + √(1−ᾱ_t)·ε, broadcasting per-sample t
        over NHWC (DDPMScheduler.add_noise parity)."""
        abar = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_abar = jnp.sqrt(abar).reshape(shape).astype(x0.dtype)
        sqrt_1m = jnp.sqrt(1.0 - abar).reshape(shape).astype(x0.dtype)
        return sqrt_abar * x0 + sqrt_1m * noise

    def velocity(self, x0: jax.Array, noise: jax.Array,
                 timesteps: jax.Array) -> jax.Array:
        """v-prediction target: √ᾱ·ε − √(1−ᾱ)·x₀."""
        abar = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_abar = jnp.sqrt(abar).reshape(shape).astype(x0.dtype)
        sqrt_1m = jnp.sqrt(1.0 - abar).reshape(shape).astype(x0.dtype)
        return sqrt_abar * noise - sqrt_1m * x0

    def to_x0_eps(self, model_out: jax.Array, x_t: jax.Array,
                  t: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Convert a model output under `prediction_type` into (x̂₀, ε̂)."""
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x_t.ndim - 1) if jnp.ndim(t) else ()
        sqrt_abar = jnp.sqrt(abar).reshape(shape) if jnp.ndim(t) else jnp.sqrt(abar)
        sqrt_1m = (jnp.sqrt(1.0 - abar).reshape(shape) if jnp.ndim(t)
                   else jnp.sqrt(1.0 - abar))
        if self.prediction_type == "epsilon":
            eps = model_out
            x0 = (x_t - sqrt_1m * eps) / sqrt_abar
        elif self.prediction_type == "v_prediction":
            x0 = sqrt_abar * x_t - sqrt_1m * model_out
            eps = sqrt_abar * model_out + sqrt_1m * x_t
        elif self.prediction_type == "sample":
            x0 = model_out
            eps = (x_t - sqrt_abar * x0) / sqrt_1m
        else:
            raise ValueError(self.prediction_type)
        return x0, eps


def inference_timesteps(num_train_timesteps: int,
                        num_inference_steps: int,
                        spacing: str = "leading",
                        steps_offset: int = 0) -> jax.Array:
    """Descending timestep subset for few-step sampling.

    Spacing conventions match diffusers schedulers exactly:

    * ``"leading"`` — `(arange(S) * (T // S))[::-1] + steps_offset`;
      DDPMScheduler / DDIMScheduler default. SD-v1 pipeline configs set
      `steps_offset=1` so the first eval lands at t=961 for S=25.
    * ``"linspace"`` — `linspace(0, T-1, S+1).round()[::-1][:-1]`; the
      multistep-solver convention (UniPCMultistepScheduler /
      DPMSolverMultistepScheduler defaults): first eval at t=T-1=999 and
      the implicit final integration target is t=0.
    * ``"trailing"`` — `round(arange(T, 0, -T/S)) - 1`; first eval at T-1
      with even strides (used by some SDE/turbo configs).

    The round-1 implementation used 'leading' unconditionally, putting the
    pretrained path's first model eval ~40 timesteps off the reference's
    UniPC scheduler (ADVICE.md round 1).
    """
    import numpy as np  # static (trace-time) computation

    T, S = num_train_timesteps, num_inference_steps
    if spacing == "leading":
        ts = (np.arange(S) * (T // S)).round()[::-1] + steps_offset
    elif spacing == "linspace":
        ts = np.linspace(0, T - 1, S + 1).round()[::-1][:-1]
    elif spacing == "trailing":
        ts = np.round(np.arange(T, 0, -T / S)) - 1
    else:
        raise ValueError(f"unknown timestep spacing: {spacing}")
    return jnp.asarray(ts.astype(np.int32))
