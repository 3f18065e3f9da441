"""Per-class scratch DDPM CLI — mirrors generator_model/train_from_scratch.py
(main at :173-287): per-class pixel-space DDPM training with quota-driven
final-epoch generation and optional CLIP text conditioning.

Usage:
  polyp-train-scratch --data-root ./data [--one_vs_rest]
      [--conditional_generation] [--num_epochs N] [--image_size N]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import jax.numpy as jnp

from polyp_tpu.cli.common import (
    DataLayout,
    add_common_flags,
    get_mesh_from,
    get_tracker_from,
    print_banner,
)
from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.data import ArrayDataset, DiffusionTable, Loader
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.eval.quota import (
    counts_per_class,
    default_distribution,
    get_num_images_to_generate,
)
from polyp_tpu.models import (
    CLIPTextModel,
    VIT_B32_TEXT_CONFIG,
    load_tokenizer,
)
from polyp_tpu.models.unet2d import polyp_scratch_unet, tiny_scratch_unet
from polyp_tpu.pipeline import PixelDiffusionSampler, generate_to_dir
from polyp_tpu.train.scratch_ddpm import create_ddpm_state, train_scratch_ddpm
from polyp_tpu.utils.checkpoint import save_pytree

ACRONYMS_TO_WORDS = {
    "AD": "adenomatous",
    "HP": "hyperplastic",
    "ASS": "sessile serrated",
    "REST": "hyperplastic and sessile serrated",
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--one_vs_rest", action="store_true")
    parser.add_argument("--conditional_generation", action="store_true")
    parser.add_argument("--num_epochs", type=int, default=200)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--train_batch_size", type=int, default=8)
    parser.add_argument("--num_train_timesteps", type=int, default=1000)
    parser.add_argument("--sample_steps", type=int, default=None,
                        help="inference steps (default: full T ancestral)")
    parser.add_argument("--ad_minimum", type=int, default=1000)
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument("--text-encoder-dir", type=str, default=None,
                        help="local clip-vit-base-patch32 dir (optional)")
    parser.add_argument("--tiny", action="store_true",
                        help="miniature scratch UNet (smoke/CI)")
    parser.add_argument("--ckpt-every", type=int, default=0,
                        help="snapshot train state every N epochs under "
                             "{output-dir}/ckpt_{cls}; a killed run "
                             "re-invoked with the same flags resumes from "
                             "the last snapshot deterministically "
                             "(train/resume.py; 0 = off)")
    args = parser.parse_args(argv)

    config = DiffusionConfig(
        quantize=args.quantize,
        quant_fp_head=args.quant_fp_head,
        quant_fp_tail=args.quant_fp_tail,
        image_size=args.image_size, train_batch_size=args.train_batch_size,
        num_epochs=args.num_epochs,
        num_train_timesteps=args.num_train_timesteps,
        experiment_name="diffusion_from_scratch",
        **({"output_dir": args.output_dir} if args.output_dir else {}))

    layout = DataLayout(Path(args.data_root))

    if args.one_vs_rest:
        classes = ["AD", "REST"]
        class_map = {"AD": ["AD"], "REST": ["HP", "ASS"]}
    else:
        classes = ["AD", "HP", "ASS"]
        class_map = {c: [c] for c in classes}

    dist = default_distribution(args.one_vs_rest)
    quotas = get_num_images_to_generate(counts_per_class(layout.train_csv),
                                        dist, args.ad_minimum,
                                        args.one_vs_rest)
    print(f"Images that will be generated:\n {quotas}")

    mesh = get_mesh_from(args)
    tracker = get_tracker_from(args)
    tracker.set_experiment(args.experiment_name or config.experiment_name)

    with tracker.start_run(run_name=os.path.basename(config.output_dir)):
        tracker.log_param("images_to_generate_per_class", quotas)
        tracker.log_param("percentage_image_distribution", dist)
        if args.one_vs_rest:
            tracker.log_param("technique", "AD vs REST")

        for cls in classes:
            print_banner(f"Training class {cls}")
            table = DiffusionTable.from_dirs(
                [layout.train_images, layout.val_images],
                [layout.train_csv, layout.val_csv],
                keep_one_class=class_map[cls])
            data = ArrayDataset.from_table(table, config.image_size,
                                           args.cache_dir)
            loader = Loader(data.images, data.labels, config.train_batch_size,
                            seed=config.seed, mesh=mesh,
                            process_shard=mesh is not None)
            cfg = config.with_schedule(len(loader))

            tracker.log_params({
                "transformations": table.transformations_list,
                "criterion": "MSELoss", "optimizer": "AdamW",
                "batch_size": cfg.train_batch_size,
                "learning_rate": cfg.learning_rate,
                "num_epochs": cfg.num_epochs,
                "image_size": cfg.image_size,
                f"train_timesteps_{cls}": cfg.num_train_timesteps,
            })

            text_embeddings = None
            ctx_dim = None
            if args.conditional_generation:
                ctx_dim = VIT_B32_TEXT_CONFIG.width
                tokenizer = load_tokenizer(args.text_encoder_dir)
                text = CLIPTextModel(VIT_B32_TEXT_CONFIG)
                tparams = jax.jit(text.init)(
                    {"params": jax.random.PRNGKey(0)},
                    jnp.zeros((1, 77), jnp.int32))
                prompt = (f"a high-resolution endoscopic image of "
                          f"{ACRONYMS_TO_WORDS[cls]} polyp")
                ids = jnp.asarray(tokenizer([prompt]))
                text_embeddings = text.apply(tparams, ids)
                tracker.log_param("input_prompt",
                                  "a high-resolution endoscopic image of x polyp")
                print(prompt)

            model = (tiny_scratch_unet if args.tiny else polyp_scratch_unet)(
                cross_attention_dim=ctx_dim)
            state = create_ddpm_state(cfg, model, jax.random.PRNGKey(cfg.seed),
                                      context_dim=ctx_dim)
            if mesh is not None:
                from polyp_tpu.parallel import replicate_to
                state = replicate_to(state, mesh)
            schedule = DiffusionSchedule.create(cfg.num_train_timesteps)

            def final_epoch_hook(epoch, st, _cls=cls, _cfg=cfg,
                                 _model=model, _sched=schedule,
                                 _emb=text_embeddings):
                if epoch != _cfg.num_epochs - 1:
                    return
                sampler = PixelDiffusionSampler(
                    _model, st.params, _sched, _cfg.image_size,
                    sampler="ddpm" if args.sample_steps is None else "ddim",
                    num_steps=args.sample_steps, text_embeddings=_emb,
                    mesh=mesh, quantize=_cfg.quantize,
                    quant_fp_head=_cfg.quant_fp_head,
                    quant_fp_tail=_cfg.quant_fp_tail)
                out = Path(_cfg.output_dir) / "samples" / _cls
                generate_to_dir(sampler, quotas[_cls], out,
                                _cfg.eval_batch_size, _cfg.seed,
                                progress=lambda a, b: print(f"   Saved {a}/{b}"))
                ckpt = Path(_cfg.output_dir) / "models" / f"model_{_cls}"
                save_pytree(ckpt, {"params": st.params})
                tracker.log_artifact(str(ckpt), f"diffusion_model/model_{_cls}")

            checkpointer = None
            if args.ckpt_every > 0:
                from polyp_tpu.train.resume import EpochCheckpointer
                checkpointer = EpochCheckpointer(
                    Path(cfg.output_dir) / f"ckpt_{cls}",
                    every=args.ckpt_every)

            from polyp_tpu.ops import dispatch
            with dispatch.mesh_trace_scope(mesh):  # no Pallas on >1 device
                state, result = train_scratch_ddpm(
                    cfg, state, schedule, loader, text_embeddings,
                    log=lambda k, v, s: tracker.log_metric(f"{k}_{cls}",
                                                           v, s),
                    epoch_callback=final_epoch_hook,
                    checkpointer=checkpointer)
            print(f"Training for class {cls} finished successfully\n")


if __name__ == "__main__":
    main()
