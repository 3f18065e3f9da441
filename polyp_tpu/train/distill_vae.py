"""VAE-decoder distillation: train a TinyDecoder to match the full
AutoencoderKL decoder.

The student regresses the teacher's outputs pixel-wise on scaled latents
(MSE in fp32); the teacher is frozen and evaluated inside the same jitted
step, so one step = teacher decode + student fwd/bwd + Adam — matching the
established distillation pattern of train/distill.py (teacher forwards are
part of the step cost).

Latent sources: callers stream whatever latents match their serving
distribution — VAE-encoded dataset images (cli/distill_vae.py when
`--data-root` is given), student/sampler trajectory outputs, or the
synthetic generator below (spatially-correlated Gaussians; the
random-weight fallback this image can always run). Fidelity on real
weights is a recorded parity debt, throughput is a chip fact — the same
split the UNet distillation carries (BASELINE.md).

Replaces nothing in the reference (it always pays the full decode,
train_with_lora_per_class.py:73-78); this is the TPU build's Amdahl lever
for few-step sampling.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from polyp_tpu.models.vae import SD_VAE_SCALING


class VAEDistillState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def synthetic_latents(key: jax.Array, batch: int, latent_size: int,
                      channels: int = 4) -> jax.Array:
    """Spatially-correlated pseudo-latents in the SCALED latent space
    (~unit variance): a mix of white noise and low-pass noise upsampled
    from 1/4 resolution — real SD latents are spatially correlated, and a
    pure-white-noise student never sees smooth regions."""
    k1, k2, k3 = jax.random.split(key, 3)
    white = jax.random.normal(k1, (batch, latent_size, latent_size, channels),
                              jnp.float32)
    coarse_size = max(latent_size // 4, 1)
    coarse = jax.random.normal(k2, (batch, coarse_size, coarse_size, channels),
                               jnp.float32)
    smooth = jax.image.resize(
        coarse, (batch, latent_size, latent_size, channels), "linear")
    # per-sample mixing ratio: some samples mostly smooth, some mostly noisy
    w = jax.random.uniform(k3, (batch, 1, 1, 1), minval=0.2, maxval=0.9)
    mix = w * smooth + (1.0 - w) * white
    return mix / jnp.sqrt(jnp.mean(mix ** 2, axis=(1, 2, 3),
                                   keepdims=True) + 1e-6)


def make_teacher_decode(vae, vae_params) -> Callable[[jax.Array], jax.Array]:
    """Jitted full-decoder target: scaled latents → images (the exact
    serving decode, pipeline.StableDiffusionSampler._generate_impl)."""
    vparams = vae_params if "params" in vae_params else {"params": vae_params}

    @jax.jit
    def decode(z: jax.Array) -> jax.Array:
        return vae.apply(vparams, z / SD_VAE_SCALING, method=vae.decode)

    return decode


def create_distill_state(decoder, key: jax.Array, latent_size: int,
                         learning_rate: float, total_steps: int,
                         channels: int = 4) -> VAEDistillState:
    params = decoder.init(
        key, jnp.zeros((1, latent_size, latent_size, channels),
                       jnp.float32))["params"]
    tx = optax.adam(optax.cosine_decay_schedule(learning_rate,
                                                max(total_steps, 1)))
    return VAEDistillState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params), tx=tx)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("decoder_apply",))
def distill_vae_step(state: VAEDistillState, target: jax.Array,
                     z: jax.Array, decoder_apply) -> tuple:
    def loss_fn(params):
        pred = decoder_apply({"params": params}, z)
        return jnp.mean((pred.astype(jnp.float32)
                         - target.astype(jnp.float32)) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    return state.replace(step=state.step + 1,
                         params=optax.apply_updates(state.params, updates),
                         opt_state=new_opt), loss


def decoder_rel_l2(decoder, params, teacher_decode, latents) -> float:
    """Holdout fidelity: ‖student − teacher‖₂ / ‖teacher‖₂ over a latent
    batch — the same metric the int8-decode experiment recorded
    (bench.py vae_q_rel_l2), so the two decode levers compare directly."""
    ref = np.asarray(teacher_decode(latents), np.float32)
    got = np.asarray(
        jax.jit(lambda p, z: decoder.apply({"params": p}, z))(params, latents),
        np.float32)
    return float(np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-12))


@dataclass
class VAEDistillResult:
    params: Any
    losses: list
    rel_l2: float
    meta: dict


def distill_vae_decoder(vae, vae_params, decoder,
                        latent_batches: Iterable[jax.Array],
                        learning_rate: float = 3e-4,
                        total_steps: int | None = None,
                        holdout: jax.Array | None = None,
                        key: jax.Array | None = None,
                        log: Callable[[str, float, int], None] | None = None,
                        log_every: int = 50) -> VAEDistillResult:
    """Run the distillation over `latent_batches` (an iterable of SCALED
    latent batches [B, h/8, w/8, 4]; its length bounds the run when
    `total_steps` is None). Returns trained params + holdout rel-L2."""
    key = key if key is not None else jax.random.PRNGKey(0)
    teacher = make_teacher_decode(vae, vae_params)
    state = None
    losses: list[float] = []
    n = 0
    for z in latent_batches:
        z = jnp.asarray(z, jnp.float32)
        if state is None:
            state = create_distill_state(decoder, key, z.shape[1],
                                         learning_rate,
                                         total_steps or 10_000,
                                         channels=z.shape[-1])
        state, loss = distill_vae_step(state, teacher(z), z, decoder.apply)
        losses.append(loss)
        n += 1
        if log and n % log_every == 0:
            log("distill_vae_loss", float(jax.device_get(loss)), n)
        if total_steps is not None and n >= total_steps:
            break
    if state is None:
        raise ValueError("latent_batches yielded no batches")
    losses = [float(v) for v in jax.device_get(losses)]
    if holdout is None:
        holdout = synthetic_latents(jax.random.fold_in(key, 7), 4,
                                    int(jnp.asarray(z).shape[1]),
                                    int(jnp.asarray(z).shape[-1]))
    rel = decoder_rel_l2(decoder, state.params, teacher, holdout)
    meta = {"base_channels": decoder.base_channels,
            "latent_channels": decoder.latent_channels,
            "blocks_per_stage": decoder.blocks_per_stage,
            "steps": n, "learning_rate": learning_rate,
            "final_loss": float(np.mean(losses[-20:])) if losses else None,
            "rel_l2": rel}
    return VAEDistillResult(params=state.params, losses=losses, rel_l2=rel,
                            meta=meta)
