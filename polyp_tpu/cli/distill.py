"""Progressive-distillation CLI for scratch-trained per-class DDPMs.

No reference analogue — this is the TPU-first throughput path past the
measured sampling roofline (BASELINE.md round 3): each halving phase trains
the student to do in ONE deterministic DDIM step what the teacher does in
two (train/distill.py), so a model the reference samples with 1000-step
ancestral DDPM generates its augmentation quota in `--end_steps` (25 by
default) steps at near-teacher fidelity.

Usage (after `polyp-train-scratch ... --output-dir RUN`):
  polyp-distill --data-root ./data --model-dir RUN
      [--start_steps 100] [--end_steps 25] [--steps_per_phase 2000]
      [--num_train_timesteps 1000]

Grid rule: T % (2·N) must hold at every phase (nested trailing grids —
train/distill.py). T=1000 supports 100 → 50 → 25 and 20 → 10 → 5; train
with `--num_train_timesteps 1024` for power-of-two chains like 128 → 4.

Distilled checkpoints land in `--output-dir`/models/distilled_{cls} with a
meta.json recording `num_steps`, `prediction_type` and the sampling
convention (ddim, spacing="trailing", steps_offset=0); `--generate N`
additionally samples N images per class with the distilled student for a
quick visual check.

`--student_prediction_type` picks the student head. "epsilon" (default —
the measured short-budget winner, BASELINE.md round-3 A/B) keeps the
teacher's head: the warm start is exact, phases converge in hundreds of
steps, and the only cost is the ill-conditioned x̂₀ recovery at t ≈ T
(benign until end_steps is very small or ᾱ_T ≈ 0 exactly).
"v_prediction" (the paper's choice, right at production budgets) needs
its ε→v warmup loss to PLATEAU — an under-trained head switch poisons
every later phase (measured: a 16→4 distillation whose reparam stopped
at loss 0.045 sampled 20× worse than the teacher's own 4-step grid).
Guard rails: `--reparam_steps -1` auto-scales the warmup to the phase
budget, and train/distill.py `check_reparam_converged` fails loudly when
the warmup has not plateaued.
"""

from __future__ import annotations

import argparse
import json
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
from polyp_tpu.data.transforms import augment_diffusion_batch
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.models.unet2d import polyp_scratch_unet, tiny_scratch_unet
from polyp_tpu.pipeline import PixelDiffusionSampler, generate_to_dir
from polyp_tpu.train.distill import distill_progressive
from polyp_tpu.utils.checkpoint import load_pytree, save_pytree
from polyp_tpu.utils.rng import key_for


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--model-dir", type=str, required=True,
                        help="a polyp-train-scratch output dir "
                             "(models/model_{cls} checkpoints)")
    parser.add_argument("--one_vs_rest", action="store_true")
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--train_batch_size", type=int, default=8)
    parser.add_argument("--num_train_timesteps", type=int, default=1000,
                        help="must match the teacher's training T")
    parser.add_argument("--start_steps", type=int, default=100)
    parser.add_argument("--end_steps", type=int, default=25)
    parser.add_argument("--steps_per_phase", type=int, default=2000)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--reparam_steps", type=int, default=-1,
                        help="0-substep warmup for the ε→v head switch; "
                             "-1 auto-scales to --steps_per_phase (the "
                             "warmup must PLATEAU — train/distill.py "
                             "check_reparam_converged fails loudly if not)")
    parser.add_argument("--student_prediction_type", type=str,
                        default="epsilon",
                        choices=["v_prediction", "epsilon"],
                        help="student head (module docstring). 'epsilon' "
                             "(default) keeps the teacher's head: exact "
                             "warm start, converges in hundreds of steps — "
                             "the measured short-budget winner (BASELINE.md "
                             "round-3 A/B). 'v_prediction' is the paper's "
                             "choice for production budgets; its reparam "
                             "warmup auto-scales and is convergence-checked")
    parser.add_argument("--generate", type=int, default=0,
                        help="sample N images per class with the distilled "
                             "student after the final phase")
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="miniature scratch UNet (smoke/CI)")
    args = parser.parse_args(argv)

    config = DiffusionConfig(
        image_size=args.image_size, train_batch_size=args.train_batch_size,
        num_train_timesteps=args.num_train_timesteps,
        experiment_name="diffusion_distilled",
        **({"output_dir": args.output_dir} if args.output_dir else {}))
    layout = DataLayout(Path(args.data_root))
    classes = (["AD", "REST"] if args.one_vs_rest else ["AD", "HP", "ASS"])
    class_map = ({"AD": ["AD"], "REST": ["HP", "ASS"]} if args.one_vs_rest
                 else {c: [c] for c in classes})

    mesh = get_mesh_from(args)
    tracker = get_tracker_from(args)
    tracker.set_experiment(args.experiment_name or config.experiment_name)

    model = (tiny_scratch_unet if args.tiny else polyp_scratch_unet)()
    schedule = DiffusionSchedule.create(config.num_train_timesteps)
    v_schedule = DiffusionSchedule.create(config.num_train_timesteps,
                                          prediction_type="v_prediction")

    def apply_fn(p, x, t, ctx=None):
        del ctx  # scratch path: unconditional per-class models
        return model.apply({"params": p}, x, t)

    with tracker.start_run(run_name=os.path.basename(config.output_dir)):
        tracker.log_params({
            "start_steps": args.start_steps, "end_steps": args.end_steps,
            "steps_per_phase": args.steps_per_phase,
            "student_prediction_type": args.student_prediction_type,
            "teacher_model_dir": str(args.model_dir),
        })
        for cls in classes:
            print_banner(f"Distilling class {cls}: "
                         f"{args.start_steps} -> {args.end_steps} steps")
            like = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, config.image_size,
                                         config.image_size, 3)),
                              jnp.zeros((1,), jnp.int32))["params"]
            ckpt = Path(args.model_dir) / "models" / f"model_{cls}"
            teacher_params = load_pytree(ckpt, like={"params": like})["params"]

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
                    yield augment_diffusion_batch(
                        images, key_for(config.seed, "distill", i))

            from polyp_tpu.ops import dispatch
            with dispatch.mesh_trace_scope(mesh):
                result = distill_progressive(
                    apply_fn, teacher_params, schedule, batches,
                    start_steps=args.start_steps,
                    end_steps=args.end_steps,
                    steps_per_phase=args.steps_per_phase,
                    learning_rate=args.learning_rate,
                    student_prediction_type=args.student_prediction_type,
                    reparam_steps=args.reparam_steps,
                    log=lambda k, v, s: tracker.log_metric(f"{k}_{cls}",
                                                           v, s))

            out = Path(config.output_dir) / "models" / f"distilled_{cls}"
            save_pytree(out, {"params": result.params})
            (out.parent / f"distilled_{cls}_meta.json").write_text(
                json.dumps({"num_steps": result.num_steps,
                            "prediction_type": result.prediction_type,
                            "sampler": "ddim",
                            "sampler_kwargs": {"spacing": "trailing",
                                               "steps_offset": 0},
                            "num_train_timesteps":
                                config.num_train_timesteps}))
            tracker.log_artifact(str(out), f"distilled/model_{cls}")
            for ph in result.phases:
                print(f"  phase {ph.num_steps} steps: final loss "
                      f"{sum(ph.losses[-20:]) / max(len(ph.losses[-20:]), 1):.3e}")

            if args.generate > 0:
                student_schedule = (v_schedule if result.prediction_type
                                    == "v_prediction" else schedule)
                sampler = PixelDiffusionSampler(
                    model, result.params, student_schedule,
                    config.image_size,
                    sampler="ddim", num_steps=result.num_steps, mesh=mesh,
                    sampler_kwargs={"spacing": "trailing",
                                    "steps_offset": 0})
                sample_dir = Path(config.output_dir) / "samples" / cls
                generate_to_dir(sampler, args.generate, sample_dir,
                                config.eval_batch_size, config.seed)
                print(f"  wrote {args.generate} {result.num_steps}-step "
                      f"samples to {sample_dir}")


if __name__ == "__main__":
    main()
