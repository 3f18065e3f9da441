"""Shared SD fine-tuning workflow used by the per-class and all-classes
CLIs — one implementation instead of the reference's copy-paste duplication
between train_with_lora_per_class.py and train_with_lora_all_classes.py
(SURVEY layer-map duplication note)."""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.cli.common import DataLayout, SDStack, print_banner
from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.data import ArrayDataset, DiffusionTable, Loader
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.lora import LoRAConfig, init_lora, load_lora, merge_lora, save_lora, trainable_count, path_mask
from polyp_tpu.models.vae import SD_VAE_SCALING
from polyp_tpu.pipeline import StableDiffusionSampler, count_samples, top_up_samples, generate_to_dir
from polyp_tpu.train.dreambooth import (
    SPECIAL_TOKENS,
    dreambooth_prompt,
    dreambooth_token_init,
    resize_token_embeddings,
    resume_prompt,
)
from polyp_tpu.train.sd_finetune import (
    SDComponents,
    create_sd_train_state,
    init_proj_params,
    init_trainable,
    train_sd_lora,
)
from polyp_tpu.utils.plotting import plot_loss


@dataclass
class SDFlags:
    """The reference's feature flags (train_with_lora_per_class.py:206-217)."""

    unconditional: bool = False
    class_condition: bool = False
    train_text_encoder: bool = False
    dreambooth: bool = False
    add_visual_influence: bool = False
    unfreeze_layers: bool = False


def log_sample_images(tracker, sample_dir: Path, cls: str,
                      num_samples: int = 10) -> None:
    """Log a deterministic subset of generated samples as run artifacts
    (train_with_lora_per_class.py:51-56; random.sample there — sorted-head
    here so reruns log the same files)."""
    if not Path(sample_dir).exists():
        return
    files = sorted(p for p in Path(sample_dir).iterdir()
                   if p.suffix == ".png")[:num_samples]
    for f in files:
        tracker.log_artifact(str(f), f"samples/{cls}")


def make_components(stack: SDStack) -> SDComponents:
    return SDComponents(
        unet_params=stack.unet_params,
        vae_params=stack.vae_params,
        text_params=stack.text_params["params"],
        unet_apply=lambda p, x, t, c: stack.unet.apply({"params": p}, x, t, c),
        vae_encode=lambda p, x: stack.vae.apply(
            {"params": p} if "params" not in p else p, x,
            method=stack.vae.encode_moments),
        text_apply=lambda p, ids: stack.text.apply({"params": p}, ids),
    )


def make_sampler(stack: SDStack, unet_params, text_params,
                 config: DiffusionConfig, mesh=None,
                 decoder=None) -> StableDiffusionSampler:
    schedule = DiffusionSchedule.create(config.num_train_timesteps,
                                        "scaled_linear", 0.00085, 0.012)
    return StableDiffusionSampler(
        stack.unet, unet_params, stack.vae,
        stack.vae_params, stack.text, {"params": text_params},
        stack.tokenizer, schedule, image_size=config.image_size,
        num_steps=config.num_inference_steps,
        guidance_scale=config.guidance_scale, sampler=config.sampler,
        mesh=mesh, quantize=config.quantize,
        quant_fp_head=config.quant_fp_head,
        quant_fp_tail=config.quant_fp_tail,
        decoder=decoder)


def restore_class_params(stack: SDStack, config: DiffusionConfig,
                         folder: Path, cls: str):
    """Reload class `cls`'s trained bundle from `folder/lora_{cls}` and
    return `(merged_unet_params, text_params)` with every trained piece
    attached (unet LoRA merged, unfrozen base layers overlaid, DreamBooth
    token re-registered + row scattered, text-encoder LoRA merged) — the
    restore half of the reference's resume branch
    (train_with_lora_per_class.py:252-290). Returns None when no bundle
    exists. Shared by the sampling resume path (resume_class) and the
    SD distillation CLI (cli/distill_sd.py), which distills exactly the
    restored class model. Mutates `stack` when DreamBooth tokens are
    restored (tokenizer + text module vocab growth)."""
    lora_dir = Path(folder) / f"lora_{cls}"
    if not lora_dir.exists():
        return None
    lcfg = LoRAConfig(config.lora_rank, config.lora_alpha, config.lora_dropout,
                     config.modules_lora)
    bundle = load_lora(lora_dir)  # full trainable bundle (see train_class)
    adapter = bundle.get("unet_lora", bundle)  # old adapter-only ckpts too
    unet_base = stack.unet_params
    if "unfrozen" in bundle:
        from polyp_tpu.lora.partition import overlay_params
        unet_base = overlay_params(unet_base, bundle["unfrozen"])
    merged = merge_lora(unet_base, adapter, lcfg)
    text_params = stack.text_params["params"]
    if "special_ids" in bundle:
        # Restore the DreamBooth token: re-register it and scatter the
        # trained row at the token's id *in this process's tokenizer* — the
        # id saved at train time is not stable across processes (tokens are
        # assigned sequentially as classes train, so class ASS's token got
        # base+2 during a 3-class run but base+0 in a fresh resume).
        import jax.numpy as jnp
        from polyp_tpu.train.dreambooth import (
            embed_with_special_rows, resize_token_embeddings)
        token = SPECIAL_TOKENS[cls]
        stack.tokenizer.add_tokens([token])
        current_id = stack.tokenizer.convert_tokens_to_ids(token)
        text_params = resize_token_embeddings(text_params, current_id + 1,
                                              jax.random.PRNGKey(0))
        text_params = embed_with_special_rows(
            text_params, jnp.asarray(bundle["special_rows"]),
            jnp.asarray([current_id], jnp.int32))
        import dataclasses
        from polyp_tpu.models.clip_text import CLIPTextModel
        stack.text = CLIPTextModel(
            dataclasses.replace(stack.text.config,
                                vocab_size=text_params["token_embedding"].shape[0]),
            dtype=stack.text.dtype)
    if "text_lora" in bundle:
        # Merge independently of the DreamBooth branch — a text-encoder LoRA
        # trained without --dreambooth must still be attached on resume
        # (reference samples with the adapter attached,
        # train_with_lora_per_class.py:264-290).
        tcfg = LoRAConfig(config.lora_rank, config.lora_alpha, 0.0,
                          ("q_proj", "k_proj", "v_proj", "out_proj"))
        text_params = merge_lora(text_params, bundle["text_lora"], tcfg)
    return merged, text_params


def resume_class(stack: SDStack, config: DiffusionConfig, folder: Path,
                 cls: str, quota: int, flags: SDFlags, tracker=None,
                 mesh=None) -> bool:
    """The filesystem-state resume branch (train_with_lora_per_class.py
    :252-290): if lora_{cls} exists, reload the adapter and top up missing
    samples. Returns True when handled."""
    restored = restore_class_params(stack, config, folder, cls)
    if restored is None:
        return False
    print_banner(f"Model for {cls} class already trained")
    merged, text_params = restored
    sampler = make_sampler(stack, merged, text_params, config, mesh)
    prompt = resume_prompt(cls, flags.unconditional)
    out_dir = folder / "samples" / cls
    existing = count_samples(out_dir)
    if existing < quota:
        added = top_up_samples(sampler.for_prompt(prompt), quota, out_dir,
                               config.eval_batch_size, config.seed,
                               progress=lambda a, b: print(f"Generated {a}/{b}"))
        print(f"Generated {added} images for class {cls} successfully!")
    return True


def train_class(stack: SDStack, config: DiffusionConfig, layout: DataLayout,
                folder: Path, cls: str, class_map: dict, quota: int,
                flags: SDFlags, tracker=None, cache_dir: str | None = None,
                generate: int | None = None, mesh=None,
                ckpt_every: int = 0) -> None:
    """The train branch (train_with_lora_per_class.py:293-466):
    dataset → LoRA(+features) → train → save adapter → generate quota.

    `ckpt_every` > 0 snapshots the train state every N epochs under
    `folder/ckpt_{cls}` (train/resume.EpochCheckpointer) — the
    finer-than-per-class recovery layer: a crash 150 epochs into a
    200-epoch class resumes from the last snapshot instead of restarting
    the class (the reference's only granularity,
    train_with_lora_per_class.py:252-290)."""
    print_banner(f"Training {cls}")
    table = DiffusionTable.from_dirs(
        [layout.train_images, layout.val_images],
        [layout.train_csv, layout.val_csv],
        keep_one_class=class_map[cls])
    data = ArrayDataset.from_table(table, config.image_size, cache_dir)
    print(cls, class_map[cls], len(data))
    loader = Loader(data.images, data.labels, config.train_batch_size,
                    seed=config.seed, mesh=mesh,
                    process_shard=mesh is not None)
    cfg = config.with_schedule(max(len(loader), 1))

    lcfg = LoRAConfig(cfg.lora_rank, cfg.lora_alpha, cfg.lora_dropout,
                      cfg.modules_lora)
    rng = jax.random.PRNGKey(cfg.seed)
    adapter = init_lora(stack.unet_params, lcfg, rng)
    tr, total = trainable_count(
        stack.unet_params, path_mask(stack.unet_params, ["__none__"]))
    n_lora = sum(x.size for x in jax.tree_util.tree_leaves(adapter))
    print(f"Trainable params of unet: {n_lora} / {total + n_lora} "
          f"({100 * n_lora / (total + n_lora):.2f}%)")

    text_lora_cfg = None
    text_lora = None
    if flags.train_text_encoder:
        text_lora_cfg = LoRAConfig(cfg.lora_rank, cfg.lora_alpha, 0.0,
                                   ("q_proj", "k_proj", "v_proj", "out_proj"))
        text_lora = init_lora(stack.text_params["params"], text_lora_cfg,
                              jax.random.fold_in(rng, 1))

    proj = (init_proj_params(jax.random.fold_in(rng, 2))
            if flags.add_visual_influence else None)

    unfrozen = None
    if flags.unfreeze_layers:
        # base attention projections train alongside the adapter
        # (train_with_lora_per_class.py:318-323). COPY the leaves: the
        # extracted subtree would otherwise alias stack.unet_params
        # buffers, and the train step's donate_argnums deletes them on
        # the first update — breaking the post-training merge and every
        # later class in the loop (caught by the all-classes smoke test).
        from polyp_tpu.lora.partition import extract_by_mask
        unfrozen = jax.tree.map(
            jnp.copy,
            extract_by_mask(
                stack.unet_params,
                path_mask(stack.unet_params,
                          ["to_q", "to_k", "to_v", "to_out"])))

    special_rows = None
    special_ids = None
    text_params = stack.text_params["params"]
    if flags.dreambooth:
        import dataclasses

        from polyp_tpu.models.clip_text import CLIPTextModel

        token = SPECIAL_TOKENS[cls]
        stack.tokenizer.add_tokens([token])
        text_params = resize_token_embeddings(text_params, len(stack.tokenizer),
                                              jax.random.fold_in(rng, 3))
        stack.text_params = {"params": text_params}
        # the module's static vocab_size must track the grown table
        stack.text = CLIPTextModel(
            dataclasses.replace(stack.text.config,
                                vocab_size=len(stack.tokenizer)),
            dtype=stack.text.dtype)
        special_id = stack.tokenizer.convert_tokens_to_ids(token)
        row = dreambooth_token_init(text_params, stack.tokenizer, cls,
                                    cfg.weight_token_class,
                                    cfg.weight_token_polyp,
                                    flags.class_condition)
        special_rows = row[None]
        special_ids = np.asarray([special_id], np.int32)

    prompt = dreambooth_prompt(cls, flags.unconditional, flags.class_condition,
                               flags.dreambooth)
    print(f"Prompt: {prompt!r}")
    if tracker:
        tracker.log_param(f"prompt_{cls}", prompt)
        tracker.log_params({
            "criterion": "MSELoss", "optimizer": "AdamW",
            "batch_size": cfg.train_batch_size,
            "learning_rate": cfg.learning_rate,
            "num_epochs": cfg.num_epochs, "image_size": cfg.image_size,
            f"train_timesteps_{cls}": cfg.total_train_steps,
            f"lr_warmup_steps_{cls}": cfg.lr_warmup_steps,
            "noise_scheduler": "UniPCMultistepScheduler",
            "lora_rank": cfg.lora_rank,
            "lora_alpha": cfg.effective_lora_alpha,
            "target_modules_lora": list(cfg.modules_lora),
        })

    trainable = init_trainable(adapter, text_lora, proj, special_rows,
                               unfrozen)
    state = create_sd_train_state(cfg, trainable)
    frozen = make_components(stack)
    frozen = frozen.replace(text_params=text_params)
    if mesh is not None:
        # DP×TP: Megatron-shard the frozen UNet/CLIP kernels over 'model'
        # (replicated on a pure-data mesh), replicate the small trainable
        # bundle + optimizer moments, batch-shard inputs (Loader above);
        # jit partitions the step and XLA places the collectives on ICI.
        from polyp_tpu.parallel import replicate_to, shard_params
        frozen = frozen.replace(
            unet_params=shard_params(frozen.unet_params, mesh),
            vae_params=replicate_to(frozen.vae_params, mesh),
            text_params=shard_params(frozen.text_params, mesh))
        state = replicate_to(state, mesh)
    schedule = DiffusionSchedule.create(cfg.num_train_timesteps,
                                        "scaled_linear", 0.00085, 0.012)

    prompt_ids = np.asarray(stack.tokenizer([prompt]))
    checkpointer = None
    if ckpt_every > 0:
        from polyp_tpu.train.resume import EpochCheckpointer
        checkpointer = EpochCheckpointer(folder / f"ckpt_{cls}",
                                         every=ckpt_every)
    # >1-device mesh: the train-step trace must not dispatch Pallas
    # kernels (flash attention) — GSPMD has no partitioning rule for
    # them; see ops/dispatch.pallas_ok. No-op on 1 device / no mesh.
    from polyp_tpu.ops import dispatch
    with dispatch.mesh_trace_scope(mesh):
        state, result = train_sd_lora(
            cfg, state, frozen, schedule, loader, prompt_ids, lcfg,
            text_lora_cfg, special_ids,
            log=(lambda k, v, s: tracker.log_metric(f"{k}_{cls}", v, s))
            if tracker else None,
            checkpointer=checkpointer)

    # save the FULL trainable bundle (adapter + dreambooth rows + text lora
    # + proj) — the reference's "lora_" key filter drops the trained
    # dreambooth embedding and relies on the saved pipeline to carry it
    # (train_with_lora_per_class.py:30-35 vs :190); one bundle is cleaner.
    save_path = folder / f"lora_{cls}"
    bundle = dict(state.trainable)
    if special_ids is not None:
        bundle["special_ids"] = jnp.asarray(special_ids, jnp.int32)
    save_lora(save_path, bundle)
    unet_base = stack.unet_params
    if "unfrozen" in state.trainable:
        from polyp_tpu.lora.partition import overlay_params
        unet_base = overlay_params(unet_base, state.trainable["unfrozen"])
    merged = merge_lora(unet_base, state.trainable["unet_lora"], lcfg)
    final_text = text_params
    if "special_rows" in state.trainable:
        from polyp_tpu.train.dreambooth import embed_with_special_rows
        final_text = embed_with_special_rows(
            text_params, state.trainable["special_rows"],
            jnp.asarray(special_ids))
    if "text_lora" in state.trainable and text_lora_cfg is not None:
        # Sample with the trained text-encoder adapter attached, like the
        # reference pipeline reload does (train_with_lora_per_class.py:401-410).
        final_text = merge_lora(final_text, state.trainable["text_lora"],
                                text_lora_cfg)
    sampler = make_sampler(stack, merged, final_text, cfg, mesh)
    n_generate = quota if generate is None else generate
    if n_generate > 0:
        generate_to_dir(sampler.for_prompt(prompt), n_generate,
                        folder / "samples" / cls, cfg.eval_batch_size,
                        cfg.seed,
                        progress=lambda a, b: print(f"Generated {a}/{b} images"))
    if tracker:
        tracker.log_artifact(str(save_path), f"models/lora_{cls}")
        loss_png = plot_loss(result.loss_hist,
                             filename=str(folder / f"loss_history_{cls}.png"),
                             title="Training Loss over Epochs")
        tracker.log_artifact(loss_png)
        log_sample_images(tracker, folder / "samples" / cls, cls)
        if n_generate >= 2 and len(data) >= 2:
            # per-run fidelity signal: Fréchet distance between this class's
            # real images (the training set just used) and its generated
            # samples — uncalibrated until ImageNet weights exist
            # (eval/fid.py docstring)
            from polyp_tpu.eval import fid as fid_mod
            extractor = fid_mod.efficientnet_extractor(cfg.image_size)
            fake = fid_mod.load_image_dir(folder / "samples" / cls,
                                          cfg.image_size)
            val = fid_mod.frechet_from_arrays(data.images, fake, extractor)
            tracker.log_param("frechet_extractor", extractor.name)
            tracker.log_metric(f"frechet_{cls}", round(val, 4))
    print(f"Training for class {cls} finished and images generated\n")
