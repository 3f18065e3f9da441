"""Progressive distillation for the flagship SD LoRA path.

Distills each per-class fine-tuned SD model (a `polyp-lora-per-class` /
`polyp-lora-all-classes` output: base SD-v1-4 UNet + the class's trained
LoRA bundle) into a few-step student with the guidance FOLDED IN (Meng et
al. 2023): the teacher runs the CFG pair at 2× batch, the student consumes
the class prompt's cond embedding only — so a distilled-student sampling
step costs HALF a teacher step on top of needing 4–10× fewer of them.
Combined with the measured roofline (BASELINE.md: the bf16 sampler sits at
97% of its compute/memory ceiling), this is the sanctioned way past it:
remove work, don't schedule it harder.

No reference analogue (the reference samples 25-step UniPC,
train_with_lora_per_class.py:304-308); the scratch-path twin is
cli/distill.py.

Usage (after `polyp-lora-per-class ... --output-dir RUN`):
  polyp-distill-sd --data-root ./data --model-dir RUN
      [--pretrained-dir SD_DIR | --tiny]
      [--start_steps 40] [--end_steps 10] [--steps_per_phase 2000]
      [--student_prediction_type epsilon|v_prediction] [--generate N]

Grid rule (train/distill.py): T % (2·N) at every phase — with the SD
T=1000 valid chains include 100 → 50 → 25 and 40 → 20 → 10 → 5.

Outputs land in `--output-dir`/models/distilled_{cls} (full UNet params —
LoRA already merged) with a meta.json recording num_steps,
prediction_type, the sampling convention (ddim, spacing="trailing",
steps_offset=0) and guidance="folded"; `--generate N` samples N images
per class through the real StableDiffusionSampler with
`guidance_scale=None` (cond-only, 1× batch).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.cli.common import (
    DataLayout,
    add_common_flags,
    get_mesh_from,
    get_tracker_from,
    load_sd_stack,
    print_banner,
)
from polyp_tpu.cli.sd_common import restore_class_params
from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.data import ArrayDataset, DiffusionTable, Loader
from polyp_tpu.data.transforms import augment_diffusion_batch
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.models.vae import SD_VAE_SCALING, DiagonalGaussian
from polyp_tpu.pipeline import StableDiffusionSampler, generate_to_dir
from polyp_tpu.train.distill import distill_progressive
from polyp_tpu.train.dreambooth import resume_prompt
from polyp_tpu.utils.checkpoint import save_pytree
from polyp_tpu.utils.rng import key_for


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--model-dir", type=str, required=True,
                        help="a lora-per-class/all-classes output dir "
                             "(lora_{cls} bundles)")
    parser.add_argument("--pretrained-dir", type=str, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="miniature SD stack (smoke/CI)")
    parser.add_argument("--one_vs_rest", action="store_true")
    parser.add_argument("--unconditional", action="store_true",
                        help="the class model was trained unconditional "
                             "(affects the prompt, train/dreambooth.py "
                             "resume_prompt)")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--train_batch_size", type=int, default=8)
    parser.add_argument("--num_train_timesteps", type=int, default=1000)
    parser.add_argument("--guidance_scale", type=float, default=None,
                        help="CFG scale folded into the student (default: "
                             "the config default, 7.5)")
    parser.add_argument("--start_steps", type=int, default=40)
    parser.add_argument("--end_steps", type=int, default=10)
    parser.add_argument("--steps_per_phase", type=int, default=2000)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--reparam_steps", type=int, default=-1,
                        help="-1 auto-scales to --steps_per_phase; the "
                             "warmup is convergence-checked "
                             "(train/distill.py check_reparam_converged)")
    parser.add_argument("--student_prediction_type", type=str,
                        default="epsilon",
                        choices=["v_prediction", "epsilon"],
                        help="'epsilon' (default) is the measured "
                             "short-budget winner; 'v_prediction' for "
                             "production budgets (cli/distill.py docstring)")
    parser.add_argument("--generate", type=int, default=0)
    parser.add_argument("--output-dir", type=str, default=None)
    args = parser.parse_args(argv)

    config = DiffusionConfig(
        image_size=args.image_size, train_batch_size=args.train_batch_size,
        num_train_timesteps=args.num_train_timesteps,
        experiment_name="diffusion_sd_distilled",
        **({"guidance_scale": args.guidance_scale}
           if args.guidance_scale is not None else {}),
        **({"output_dir": args.output_dir} if args.output_dir else {}))
    layout = DataLayout(Path(args.data_root))
    classes = (["AD", "REST"] if args.one_vs_rest else ["AD", "HP", "ASS"])
    class_map = ({"AD": ["AD"], "REST": ["HP", "ASS"]} if args.one_vs_rest
                 else {c: [c] for c in classes})

    mesh = get_mesh_from(args)
    tracker = get_tracker_from(args)
    tracker.set_experiment(args.experiment_name or config.experiment_name)

    stack = load_sd_stack(args.pretrained_dir, tiny=args.tiny)
    schedule = DiffusionSchedule.create(config.num_train_timesteps,
                                        "scaled_linear", 0.00085, 0.012)

    def apply_fn(p, x, t, ctx=None):
        return stack.unet.apply({"params": p}, x, t, ctx)

    # fixed-key latent encode: the distillation dataset is the class's own
    # images in SD latent space, exactly as the fine-tune consumed them
    # (train/sd_finetune.py:135-136)
    vae_vars = ({"params": stack.vae_params}
                if "params" not in stack.vae_params else stack.vae_params)

    def encode_latents(images: jax.Array, key: jax.Array) -> jax.Array:
        moments = stack.vae.apply(vae_vars, images,
                                  method=stack.vae.encode_moments)
        return DiagonalGaussian(moments).sample(key) * SD_VAE_SCALING

    encode_latents = jax.jit(encode_latents)

    with tracker.start_run(run_name=os.path.basename(config.output_dir)):
        tracker.log_params({
            "start_steps": args.start_steps, "end_steps": args.end_steps,
            "steps_per_phase": args.steps_per_phase,
            "student_prediction_type": args.student_prediction_type,
            "guidance_scale_folded": config.guidance_scale,
            "teacher_model_dir": str(args.model_dir),
        })
        for cls in classes:
            restored = restore_class_params(stack, config,
                                            Path(args.model_dir), cls)
            if restored is None:
                raise FileNotFoundError(
                    f"{args.model_dir}/lora_{cls} not found — run "
                    "polyp-lora-per-class (or -all-classes) first")
            merged, text_params = restored
            print_banner(f"Distilling SD class {cls}: "
                         f"{args.start_steps} -> {args.end_steps} steps, "
                         f"guidance {config.guidance_scale} folded")

            prompt = resume_prompt(cls, args.unconditional)
            ids = jnp.asarray(stack.tokenizer([prompt]))
            cond = stack.text.apply({"params": text_params}, ids)
            uncond = stack.text.apply(
                {"params": text_params}, jnp.asarray(stack.tokenizer([""])))

            table = DiffusionTable.from_dirs(
                [layout.train_images, layout.val_images],
                [layout.train_csv, layout.val_csv],
                keep_one_class=class_map[cls])
            data = ArrayDataset.from_table(table, config.image_size,
                                           args.cache_dir)
            loader = Loader(data.images, data.labels,
                            config.train_batch_size, seed=config.seed,
                            mesh=mesh, process_shard=mesh is not None)

            def batches(_loader=loader):
                for i, (images, _, _) in enumerate(_loader):
                    images = augment_diffusion_batch(
                        images, key_for(config.seed, "distill-sd", i))
                    yield encode_latents(images,
                                         key_for(config.seed, "latent", i))

            from polyp_tpu.ops import dispatch
            with dispatch.mesh_trace_scope(mesh):
                result = distill_progressive(
                    apply_fn, merged, schedule, batches,
                    start_steps=args.start_steps,
                    end_steps=args.end_steps,
                    steps_per_phase=args.steps_per_phase,
                    learning_rate=args.learning_rate,
                    student_prediction_type=args.student_prediction_type,
                    reparam_steps=args.reparam_steps,
                    guidance_scale=config.guidance_scale,
                    cond=cond, uncond=uncond,
                    log=lambda k, v, s: tracker.log_metric(f"{k}_{cls}",
                                                           v, s))

            out = Path(config.output_dir) / "models" / f"distilled_{cls}"
            save_pytree(out, {"params": result.params})
            # the trained cond embedding travels with the student: serving
            # must not depend on the resume-time text stack (a DreamBooth
            # class's special token only exists in the grown vocab).
            # fp32 on disk — npy can't round-trip bfloat16
            np.save(out.parent / f"distilled_{cls}_cond.npy",
                    np.asarray(cond).astype(np.float32))
            (out.parent / f"distilled_{cls}_meta.json").write_text(
                json.dumps({"num_steps": result.num_steps,
                            "prediction_type": result.prediction_type,
                            "sampler": "ddim",
                            "sampler_kwargs": {"spacing": "trailing",
                                               "steps_offset": 0},
                            "guidance": "folded",
                            "guidance_scale": config.guidance_scale,
                            "prompt": prompt,
                            "image_size": config.image_size,
                            "num_train_timesteps":
                                config.num_train_timesteps}))
            tracker.log_artifact(str(out), f"distilled/model_{cls}")
            for ph in result.phases:
                tail = ph.losses[-20:]
                print(f"  phase {ph.num_steps} steps: final loss "
                      f"{float(np.mean(tail)):.3e}")

            if args.generate > 0:
                sampler = make_student_sampler(stack, result, text_params,
                                               config, mesh=mesh)
                sample_dir = Path(config.output_dir) / "samples" / cls
                generate_to_dir(sampler.for_prompt(prompt), args.generate,
                                sample_dir, config.eval_batch_size,
                                config.seed)
                print(f"  wrote {args.generate} {result.num_steps}-step "
                      f"samples to {sample_dir}")


def load_student_sampler(stack, output_dir: str | Path, cls: str,
                         config: DiffusionConfig,
                         mesh=None, decoder=None) -> StableDiffusionSampler:
    """Reload a polyp-distill-sd output (`models/distilled_{cls}` +
    meta.json) into a ready sampler — the serving path for distilled
    students (polyp-serve --distilled-dir). The meta's sampling convention
    (step count, prediction type, trailing grid, folded guidance)
    overrides the config's; image_size/quantize still come from `config`.
    `decoder`: optional (module, params) tiny decoder (`--vae-decoder
    tiny`) replacing the full VAE decode — the few-step Amdahl lever."""
    from types import SimpleNamespace

    from polyp_tpu.utils.checkpoint import load_pytree

    models_dir = Path(output_dir) / "models"
    meta = json.loads((models_dir / f"distilled_{cls}_meta.json").read_text())
    params = load_pytree(models_dir / f"distilled_{cls}",
                         like={"params": stack.unet_params})["params"]
    result = SimpleNamespace(params=params, num_steps=meta["num_steps"],
                             prediction_type=meta["prediction_type"])
    quantize, fp_head, fp_tail = (config.quantize, config.quant_fp_head,
                                  config.quant_fp_tail)
    if config.quant_promoted:
        # the config expanded `--quantize promoted` with the
        # full-trajectory verdict (fp_head=5); a few-step student grid
        # needs the DISTILLED verdict (pure int8, no head — the measured
        # gate pass for 4/8-step folded sampling), else _precision_split
        # would silently drop quantization when fp_head >= num_steps
        from polyp_tpu.ops.quant import resolve_quantize_arg
        quantize, fp_head, fp_tail = resolve_quantize_arg(
            "promoted", 0, 0, distilled=True)
    config = DiffusionConfig(
        image_size=config.image_size, quantize=quantize,
        quant_fp_head=fp_head,
        quant_fp_tail=fp_tail,
        num_train_timesteps=meta["num_train_timesteps"])
    sampler = make_student_sampler(stack, result,
                                   stack.text_params["params"],
                                   config, mesh=mesh, decoder=decoder)
    cond_file = models_dir / f"distilled_{cls}_cond.npy"
    if cond_file.exists():
        # the class prompt resolves to the embedding the student was
        # actually trained on (incl. DreamBooth tokens the base text
        # stack cannot encode)
        sampler.register_prompt_embedding(meta["prompt"],
                                          np.load(cond_file))
    return sampler


def make_student_sampler(stack, result, text_params,
                         config: DiffusionConfig,
                         mesh=None, decoder=None) -> StableDiffusionSampler:
    """A StableDiffusionSampler over a distilled student: trailing-grid
    DDIM at the student's step count, `guidance_scale=None` (guidance is
    folded — cond-only forwards at 1× batch). `decoder`: optional
    (module, params) tiny decoder replacing the full VAE decode."""
    student_schedule = DiffusionSchedule.create(
        config.num_train_timesteps, "scaled_linear", 0.00085, 0.012,
        prediction_type=result.prediction_type)
    return StableDiffusionSampler(
        stack.unet, result.params, stack.vae, stack.vae_params,
        stack.text, {"params": text_params}, stack.tokenizer,
        student_schedule, image_size=config.image_size,
        num_steps=result.num_steps, guidance_scale=None, sampler="ddim",
        mesh=mesh, quantize=config.quantize,
        quant_fp_head=config.quant_fp_head,
        quant_fp_tail=config.quant_fp_tail,
        sampler_kwargs={"spacing": "trailing", "steps_offset": 0},
        decoder=decoder)


if __name__ == "__main__":
    main()
