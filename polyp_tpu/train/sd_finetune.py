"""Stable-Diffusion latent fine-tuning with LoRA / DreamBooth /
text-encoder-LoRA / visual-influence — the pretrained path.

TPU-native re-design of train_with_lora_per_class.py:106-202 and
train_from_pretrained.py:66-121: frozen base params (VAE, CLIP, UNet) stay
untouched; the *trainable bundle* is a small pytree
  {unet_lora, text_lora?, proj?, special_rows?}
and one jitted step does: device augmentation → VAE encode ×0.18215 → noise/
timesteps → (optionally LoRA'd / DreamBooth'd) text encoding → LoRA-merged
UNet ε̂ → MSE (+ visual-influence cosine aux) → grads w.r.t. the bundle only
→ clip(1.0) → AdamW(cosine-warmup). Gradient accumulation
(train_with_lora_all_classes.py:121-176) comes from optax.MultiSteps.

Loss note: the reference's per-class script composes the aux loss as
`loss += (w_img·loss + w_text·loss_text)/accum` (train_with_lora_per_class
.py:147) — double-counting the MSE term. Here the intended form
`w_img·mse + w_text·cos` is used; set weight_img=2.0 to reproduce the
reference's effective weighting.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.data.pipeline import Loader
from polyp_tpu.data.transforms import augment_diffusion_batch
from polyp_tpu.diffusion import DiffusionSchedule, epsilon_mse_loss
from polyp_tpu.diffusion.losses import visual_influence_loss
from polyp_tpu.lora import LoRAConfig, merge_lora
from polyp_tpu.models.vae import SD_VAE_SCALING, DiagonalGaussian
from polyp_tpu.train.dreambooth import embed_with_special_rows
from polyp_tpu.train.scratch_ddpm import cosine_warmup_schedule
from polyp_tpu.utils.rng import key_for


class SDComponents(struct.PyTreeNode):
    """Frozen base modules + params for the SD stack."""

    unet_params: Any
    vae_params: Any
    text_params: Any
    unet_apply: Callable = struct.field(pytree_node=False)
    vae_encode: Callable = struct.field(pytree_node=False)  # (params, x) → moments
    text_apply: Callable = struct.field(pytree_node=False)

    def with_remat(self) -> "SDComponents":
        """Rematerialize the UNet forward in the backward pass — trades
        FLOPs for activation memory so larger train batches fit one chip's
        HBM (jax.checkpoint over the whole denoiser apply)."""
        return self.replace(unet_apply=jax.checkpoint(self.unet_apply))


class SDTrainState(struct.PyTreeNode):
    step: jax.Array
    trainable: Any  # {"unet_lora": ..., "text_lora": ..., "proj": ..., "special_rows": ...}
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_sd_optimizer(config: DiffusionConfig) -> optax.GradientTransformation:
    sched = cosine_warmup_schedule(config.learning_rate,
                                   config.lr_warmup_steps,
                                   config.total_train_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),  # train_with_lora_per_class.py:158
        optax.adamw(sched, weight_decay=1e-2),
    )
    if config.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.accumulation_steps)
    return tx


def init_trainable(unet_lora: Any, text_lora: Any | None = None,
                   proj: Any | None = None,
                   special_rows: jax.Array | None = None,
                   unfrozen: Any | None = None) -> dict:
    out = {"unet_lora": unet_lora}
    if text_lora is not None:
        out["text_lora"] = text_lora
    if proj is not None:
        out["proj"] = proj
    if special_rows is not None:
        out["special_rows"] = special_rows
    if unfrozen is not None:
        out["unfrozen"] = unfrozen
    return out


def init_proj_params(rng: jax.Array, latent_channels: int = 4,
                     text_width: int = 768) -> dict:
    """Linear(4→768) visual-influence projection
    (train_with_lora_per_class.py:421)."""
    k = jax.random.normal(rng, (latent_channels, text_width), jnp.float32)
    return {"kernel": k / np.sqrt(latent_channels),
            "bias": jnp.zeros((text_width,), jnp.float32)}


def create_sd_train_state(config: DiffusionConfig, trainable: Any) -> SDTrainState:
    tx = make_sd_optimizer(config)
    return SDTrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                        opt_state=tx.init(trainable), tx=tx)


@partial(jax.jit, donate_argnums=(0,),
         static_argnames=("unet_lora_cfg", "text_lora_cfg", "weight_img",
                          "weight_text"))
def sd_lora_train_step(
    state: SDTrainState,
    frozen: SDComponents,
    schedule: DiffusionSchedule,
    images_u8: jax.Array,
    prompt_ids: jax.Array,          # [1 or N, 77]
    special_ids: jax.Array,         # [S] int32 (unused unless special_rows)
    key: jax.Array,
    unet_lora_cfg: LoRAConfig,
    text_lora_cfg: LoRAConfig | None = None,
    weight_img: float = 1.0,
    weight_text: float = 0.1,
):
    k_aug, k_lat, k_noise, k_t, k_drop = jax.random.split(key, 5)
    x0 = augment_diffusion_batch(images_u8, k_aug, train=True)
    n = x0.shape[0]

    # frozen VAE encode (no grads flow here: loss differentiates `trainable`)
    moments = frozen.vae_encode(frozen.vae_params, x0)
    latents = DiagonalGaussian(moments).sample(k_lat) * SD_VAE_SCALING

    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    timesteps = jax.random.randint(k_t, (n,), 0, schedule.num_train_timesteps)
    noisy = schedule.add_noise(latents, noise, timesteps)
    ids = jnp.broadcast_to(prompt_ids, (n, prompt_ids.shape[-1]))

    def loss_fn(trainable):
        text_params = frozen.text_params
        if "special_rows" in trainable:
            text_params = embed_with_special_rows(
                text_params, trainable["special_rows"], special_ids)
        if "text_lora" in trainable:
            text_params = merge_lora(text_params, trainable["text_lora"],
                                     text_lora_cfg,
                                     dropout_rng=jax.random.fold_in(k_drop, 1),
                                     train=True)
            hidden = frozen.text_apply(text_params, ids)
        else:
            hidden = jax.lax.stop_gradient(frozen.text_apply(text_params, ids)) \
                if "special_rows" not in trainable else \
                frozen.text_apply(text_params, ids)

        unet_base = frozen.unet_params
        if "unfrozen" in trainable:
            # --unfreeze_layers: selected base weights train alongside the
            # adapter (train_with_lora_per_class.py:318-323)
            from polyp_tpu.lora.partition import overlay_params
            unet_base = overlay_params(jax.lax.stop_gradient(unet_base),
                                       trainable["unfrozen"])
        unet_params = merge_lora(unet_base, trainable["unet_lora"],
                                 unet_lora_cfg,
                                 dropout_rng=jax.random.fold_in(k_drop, 0),
                                 train=True)
        pred = frozen.unet_apply(unet_params, noisy, timesteps, hidden)
        mse = epsilon_mse_loss(schedule, pred, latents, noise, timesteps)
        if "proj" in trainable:
            aux = visual_influence_loss(hidden, latents,
                                        trainable["proj"]["kernel"],
                                        trainable["proj"]["bias"])
            return weight_img * mse + weight_text * aux
        return mse

    loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.trainable)
    new_trainable = optax.apply_updates(state.trainable, updates)
    return state.replace(step=state.step + 1, trainable=new_trainable,
                         opt_state=new_opt), loss


@dataclass
class SDTrainResult:
    loss_hist: list[float] = field(default_factory=list)


def train_sd_lora(
    config: DiffusionConfig,
    state: SDTrainState,
    frozen: SDComponents,
    schedule: DiffusionSchedule,
    loader: Loader,
    prompt_ids: np.ndarray,
    unet_lora_cfg: LoRAConfig,
    text_lora_cfg: LoRAConfig | None = None,
    special_ids: np.ndarray | None = None,
    log: Callable[[str, float, int], None] | None = None,
    epoch_callback: Callable[[int, SDTrainState], None] | None = None,
    checkpointer=None,
    start_epoch: int = 0,
) -> tuple[SDTrainState, SDTrainResult]:
    """Epoch loop (train_with_lora_per_class.py:115-166); the final-epoch
    save-generate-log hook (:168-199) lives in `epoch_callback`. Pass an
    `EpochCheckpointer` (train/resume.py) for crash-resumable snapshots:
    when one holds a snapshot, training restores it, fast-forwards the
    loader's index RNG (Loader.skip_epochs) and continues — producing the
    exact batches/updates of an uninterrupted run (step keys are pure
    functions of (seed, epoch, step))."""
    result = SDTrainResult()
    if checkpointer is not None and start_epoch == 0:
        restored = checkpointer.restore(state)
        if restored is not None:
            state, start_epoch = restored
            aux = checkpointer.restore_aux() or {}
            result.loss_hist = list(aux.get("loss_hist", []))
            loader.skip_epochs(start_epoch)
    ids = jnp.asarray(prompt_ids)
    sids = (jnp.asarray(special_ids, jnp.int32) if special_ids is not None
            else jnp.zeros((1,), jnp.int32))
    for epoch in range(start_epoch, config.num_epochs):
        losses = []
        for step, (images, _, _) in enumerate(loader):
            key = key_for(config.seed, "sd_lora", epoch, step)
            state, loss = sd_lora_train_step(
                state, frozen, schedule, images, ids, sids, key,
                unet_lora_cfg, text_lora_cfg,
                config.weight_img, config.weight_text)
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
