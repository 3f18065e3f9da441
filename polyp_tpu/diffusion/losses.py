"""Diffusion training losses.

The ε-MSE objective of the reference hot loops (train_from_scratch.py:95-101,
train_with_lora_per_class.py:139-140), plus the visual-influence auxiliary
cosine loss (train_with_lora_per_class.py:142-147) used with
`--add_visual_influence`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polyp_tpu.diffusion.schedule import DiffusionSchedule


def epsilon_mse_loss(schedule: DiffusionSchedule, model_out: jax.Array,
                     x0: jax.Array, noise: jax.Array,
                     timesteps: jax.Array) -> jax.Array:
    """MSE between the model output and its target under the schedule's
    prediction type (ε for both reference paths)."""
    if schedule.prediction_type == "epsilon":
        target = noise
    elif schedule.prediction_type == "v_prediction":
        target = schedule.velocity(x0, noise, timesteps)
    elif schedule.prediction_type == "sample":
        target = x0
    else:
        raise ValueError(schedule.prediction_type)
    return jnp.mean(jnp.square(model_out.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def visual_influence_loss(text_hidden_states: jax.Array,
                          latents: jax.Array,
                          proj_kernel: jax.Array,
                          proj_bias: jax.Array) -> jax.Array:
    """1 − cos(mean-pooled text embedding, Linear(4→768)(mean-pooled latent))
    — the auxiliary alignment loss at train_with_lora_per_class.py:142-147.
    `latents` is NHWC [N,h,w,4]; text states [N,77,768]."""
    text_pooled = jnp.mean(text_hidden_states.astype(jnp.float32), axis=1)
    latent_pooled = jnp.mean(latents.astype(jnp.float32), axis=(1, 2))
    projected = latent_pooled @ proj_kernel + proj_bias
    cos = jnp.sum(text_pooled * projected, -1) / (
        jnp.linalg.norm(text_pooled, axis=-1)
        * jnp.linalg.norm(projected, axis=-1) + 1e-8)
    return 1.0 - jnp.mean(cos)
