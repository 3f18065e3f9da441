"""Pretrained SD latent fine-tune CLI — mirrors
generator_model/train_from_pretrained.py: LoRA r=4 α=4 on attention
projections, 256px, fixed prompt "a realistic photo of colon polyp",
final-epoch sample grid + adapter save.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from polyp_tpu.cli.common import (
    DataLayout,
    add_common_flags,
    get_mesh_from,
    get_tracker_from,
    load_sd_stack,
    print_banner,
)
from polyp_tpu.cli.sd_common import make_components, make_sampler
from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.data import ArrayDataset, ClassificationTable, Loader
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.lora import LoRAConfig, init_lora, merge_lora, save_lora
from polyp_tpu.pipeline import generate_to_dir
from polyp_tpu.train.sd_finetune import create_sd_train_state, init_trainable, train_sd_lora


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--num_epochs", type=int, default=200)
    parser.add_argument("--image_size", type=int, default=256)  # :125 override
    parser.add_argument("--lora_rank", type=int, default=4)  # :142-149
    parser.add_argument("--eval_batch_size", type=int, default=20)
    parser.add_argument("--num_inference_steps", type=int, default=25)
    parser.add_argument("--pretrained-dir", type=str, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="miniature SD stack (smoke/CI)")
    parser.add_argument("--output-dir", type=str, default="runs/finetune_pretrained")
    args = parser.parse_args(argv)

    config = DiffusionConfig(quantize=args.quantize,
                             quant_fp_head=args.quant_fp_head,
                             quant_fp_tail=args.quant_fp_tail,
                             image_size=args.image_size,
                             num_epochs=args.num_epochs,
                             lora_rank=args.lora_rank, lora_alpha=args.lora_rank,
                             lora_dropout=0.0,
                             eval_batch_size=args.eval_batch_size,
                             num_inference_steps=args.num_inference_steps,
                             output_dir=args.output_dir,
                             experiment_name="generator_model")
    layout = DataLayout(Path(args.data_root))

    data = ArrayDataset.from_table(
        ClassificationTable.from_csv(layout.train_images, layout.train_csv),
        config.image_size, args.cache_dir)
    mesh = get_mesh_from(args)
    loader = Loader(data.images, data.labels, config.train_batch_size,
                    seed=config.seed, mesh=mesh,
                    process_shard=mesh is not None)
    cfg = config.with_schedule(len(loader))

    stack = load_sd_stack(args.pretrained_dir, tiny=args.tiny)
    lcfg = LoRAConfig(cfg.lora_rank, cfg.lora_alpha, 0.0, cfg.modules_lora)
    adapter = init_lora(stack.unet_params, lcfg, jax.random.PRNGKey(cfg.seed))
    state = create_sd_train_state(cfg, init_trainable(adapter))
    frozen = make_components(stack)
    if mesh is not None:
        from polyp_tpu.parallel import replicate_to, shard_params
        frozen = frozen.replace(
            unet_params=shard_params(frozen.unet_params, mesh),
            vae_params=replicate_to(frozen.vae_params, mesh),
            text_params=shard_params(frozen.text_params, mesh))
        state = replicate_to(state, mesh)
    schedule = DiffusionSchedule.create(cfg.num_train_timesteps,
                                        "scaled_linear", 0.00085, 0.012)

    prompt = "a realistic photo of colon polyp"  # :169
    prompt_ids = np.asarray(stack.tokenizer([prompt]))
    print(prompt)

    tracker = get_tracker_from(args)
    tracker.set_experiment(args.experiment_name or cfg.experiment_name)
    print_banner("Starting training")
    with tracker.start_run(run_name=Path(cfg.output_dir).name):
        from polyp_tpu.ops import dispatch
        with dispatch.mesh_trace_scope(mesh):  # no Pallas on >1 device
            state, result = train_sd_lora(
                cfg, state, frozen, schedule, loader, prompt_ids, lcfg,
                log=lambda k, v, s: tracker.log_metric(k, v, s))

        out = Path(cfg.output_dir)
        save_lora(out / "lora_weights", state.trainable["unet_lora"])
        merged = merge_lora(stack.unet_params, state.trainable["unet_lora"],
                            lcfg)
        sampler = make_sampler(stack, merged, stack.text_params["params"],
                               cfg, mesh)
        epoch_dir = out / "samples" / f"{cfg.num_epochs - 1:04d}"
        generate_to_dir(sampler.for_prompt(prompt), cfg.eval_batch_size,
                        epoch_dir, cfg.eval_batch_size, cfg.seed)
        tracker.log_artifact(str(out / "lora_weights"), "lora")
        print(f"  Images saved at {epoch_dir}")


if __name__ == "__main__":
    main()
