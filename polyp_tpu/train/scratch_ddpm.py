"""Per-class pixel-space DDPM training — the scratch path.

TPU-native re-design of train_from_scratch.py:70-133: the whole batch body
(device-side augmentation → noise/timestep draw → q-sample → UNet ε̂ → MSE →
clipped AdamW update under cosine-warmup LR) is ONE jitted function; bf16
replaces fp16+GradScaler (loss scaling is unnecessary in bf16 — SURVEY §7);
optional frozen text conditioning mirrors `--conditional_generation`
(train_from_scratch.py:255-263) but actually works (see unet2d.py note).

Data-parallel by construction: pass a `Mesh` and the step runs under jit
with the batch sharded on the 'data' axis and params replicated; XLA inserts
the gradient psum over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.data.pipeline import Loader
from polyp_tpu.data.transforms import augment_diffusion_batch
from polyp_tpu.diffusion import DiffusionSchedule, epsilon_mse_loss
from polyp_tpu.utils.rng import key_for


class DDPMState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def cosine_warmup_schedule(learning_rate: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """diffusers get_cosine_schedule_with_warmup parity: linear warmup then
    cosine decay to 0 (train_from_scratch.py:274-278)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, 2), end_value=0.0)


def make_ddpm_optimizer(config: DiffusionConfig) -> optax.GradientTransformation:
    sched = cosine_warmup_schedule(config.learning_rate,
                                   config.lr_warmup_steps,
                                   config.total_train_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),  # train_from_scratch.py:106
        optax.adamw(sched, weight_decay=1e-2),
    )
    if config.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.accumulation_steps)
    return tx


def create_ddpm_state(config: DiffusionConfig, model, rng: jax.Array,
                      image_size: int | None = None,
                      context_dim: int | None = None) -> DDPMState:
    size = image_size or config.image_size
    dummy_x = jnp.zeros((1, size, size, model.in_channels), jnp.float32)
    dummy_t = jnp.zeros((1,), jnp.int32)
    args = [dummy_x, dummy_t]
    if context_dim is not None:
        args.append(jnp.zeros((1, 77, context_dim), jnp.float32))
    variables = model.init({"params": rng}, *args)
    tx = make_ddpm_optimizer(config)
    return DDPMState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                     opt_state=tx.init(variables["params"]), tx=tx,
                     apply_fn=model.apply)


@partial(jax.jit, donate_argnums=(0,))
def ddpm_train_step(state: DDPMState, schedule: DiffusionSchedule,
                    images_u8: jax.Array, key: jax.Array,
                    text_embeddings: jax.Array | None = None):
    """One fused train step: augment → q-sample → ε̂ → MSE → clipped update."""
    k_aug, k_noise, k_t = jax.random.split(key, 3)
    x0 = augment_diffusion_batch(images_u8, k_aug, train=True)
    noise = jax.random.normal(k_noise, x0.shape, jnp.float32)
    n = x0.shape[0]
    timesteps = jax.random.randint(k_t, (n,), 0, schedule.num_train_timesteps)
    noisy = schedule.add_noise(x0, noise, timesteps)

    def loss_fn(params):
        if text_embeddings is not None:
            ctx = jnp.broadcast_to(text_embeddings,
                                   (n,) + text_embeddings.shape[-2:])
            pred = state.apply_fn({"params": params}, noisy, timesteps, ctx)
        else:
            pred = state.apply_fn({"params": params}, noisy, timesteps)
        return epsilon_mse_loss(schedule, pred, x0, noise, timesteps)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    return state.replace(step=state.step + 1,
                         params=optax.apply_updates(state.params, updates),
                         opt_state=new_opt), loss


@dataclass
class DDPMTrainResult:
    loss_hist: list[float] = field(default_factory=list)


def train_scratch_ddpm(
    config: DiffusionConfig,
    state: DDPMState,
    schedule: DiffusionSchedule,
    loader: Loader,
    text_embeddings: jax.Array | None = None,
    log: Callable[[str, float, int], None] | None = None,
    epoch_callback: Callable[[int, DDPMState], None] | None = None,
    checkpointer=None,
    start_epoch: int = 0,
) -> tuple[DDPMState, DDPMTrainResult]:
    """Epoch loop (train_from_scratch.py:80-133); `epoch_callback` hosts the
    reference's final-epoch sample+save hook (:121-133). Pass an
    `EpochCheckpointer` (train/resume.py) for crash-resumable snapshots:
    when one holds a snapshot, training restores it, fast-forwards the
    loader's index RNG (Loader.skip_epochs) and continues deterministically
    (step keys are pure functions of (seed, epoch, step))."""
    result = DDPMTrainResult()
    if checkpointer is not None and start_epoch == 0:
        restored = checkpointer.restore(state)
        if restored is not None:
            state, start_epoch = restored
            aux = checkpointer.restore_aux() or {}
            result.loss_hist = list(aux.get("loss_hist", []))
            loader.skip_epochs(start_epoch)
    for epoch in range(start_epoch, config.num_epochs):
        losses = []
        for step, (images, _, _) in enumerate(loader):
            key = key_for(config.seed, "ddpm", epoch, step)
            state, loss = ddpm_train_step(state, schedule, images, key,
                                          text_embeddings)
            losses.append(loss)
        avg = float(np.mean(jax.device_get(losses)))
        result.loss_hist.append(avg)
        if log:
            log("train_loss", avg, epoch)
        if checkpointer is not None:
            if checkpointer.save(epoch, state,
                                 aux={"loss_hist": result.loss_hist}):
                from polyp_tpu.utils.faults import maybe_crash
                maybe_crash("epoch", epoch)  # no-op unless test-armed
        if epoch_callback:
            epoch_callback(epoch, state)
    return state, result
