"""Distill the tiny VAE decoder (`polyp-distill-vae`).

Trains models/tiny_decoder.TinyDecoder to match the stack's full
AutoencoderKL decoder (train/distill_vae.py), then saves it where the
sampling/serving surfaces pick it up via `--vae-decoder tiny`:

  polyp-distill-vae [--pretrained-dir SD_DIR | --tiny] \
      [--data-root ./data] [--steps 2000] [--batch 8] [--image_size 256] \
      [--output-dir ./models/tiny_decoder]

Latent diet: with `--data-root`, batches mix VAE-encoded dataset images
(the serving-relevant distribution — exactly what the fine-tune encodes,
train/sd_finetune.py:135-136) with synthetic spatially-correlated latents
(`--synthetic-frac`); without it, all-synthetic — the random-weight
fallback that still yields a chip-true throughput number and a recorded
rel-L2 (the established distillation evidence split, BASELINE.md).

No reference analogue: the reference pays the full decode per generated
image (train_with_lora_per_class.py:73-78).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from polyp_tpu.cli.common import (
    DataLayout,
    add_common_flags,
    get_tracker_from,
    load_sd_stack,
    print_banner,
)
from polyp_tpu.models.tiny_decoder import save_tiny_decoder, tiny_decoder_for_vae
from polyp_tpu.models.vae import SD_VAE_SCALING, DiagonalGaussian
from polyp_tpu.train.distill_vae import distill_vae_decoder, synthetic_latents
from polyp_tpu.utils.rng import key_for


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--pretrained-dir", type=str, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="miniature SD stack (smoke/CI)")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--base_channels", type=int, default=64)
    parser.add_argument("--learning_rate", type=float, default=3e-4)
    parser.add_argument("--synthetic_frac", type=float, default=0.5,
                        help="fraction of batches drawn from the synthetic "
                             "latent generator when --data-root also "
                             "supplies real-image latents")
    parser.add_argument("--output-dir", type=str,
                        default="./models/tiny_decoder")
    args = parser.parse_args(argv)

    stack = load_sd_stack(args.pretrained_dir, tiny=args.tiny)
    vae_vars = (stack.vae_params if "params" in stack.vae_params
                else {"params": stack.vae_params})
    latent_size = args.image_size // 8
    decoder = tiny_decoder_for_vae(stack.vae,
                                   base_channels=args.base_channels)

    real_images = None
    if args.data_root and Path(args.data_root).exists():
        from polyp_tpu.data import ArrayDataset, DiffusionTable

        layout = DataLayout(Path(args.data_root))
        table = DiffusionTable.from_dirs(
            [layout.train_images, layout.val_images],
            [layout.train_csv, layout.val_csv])
        real_images = ArrayDataset.from_table(table, args.image_size,
                                              args.cache_dir).images

    encode = jax.jit(lambda x, k: DiagonalGaussian(
        stack.vae.apply(vae_vars, x, method=stack.vae.encode_moments)
    ).sample(k) * SD_VAE_SCALING)

    def batches():
        import numpy as np

        from polyp_tpu.data.transforms import augment_diffusion_batch

        rng = np.random.default_rng(0)
        for i in range(args.steps):
            key = key_for(0, "distill-vae", i)
            if (real_images is not None
                    and rng.random() >= args.synthetic_frac):
                idx = rng.integers(0, len(real_images), args.batch)
                imgs = augment_diffusion_batch(jnp.asarray(real_images[idx]),
                                               key)
                yield encode(imgs, jax.random.fold_in(key, 1))
            else:
                yield synthetic_latents(key, args.batch, latent_size,
                                        stack.vae.latent_channels)

    holdout = synthetic_latents(key_for(0, "distill-vae-holdout"),
                                args.batch, latent_size,
                                stack.vae.latent_channels)
    if real_images is not None:
        idx = list(range(min(args.batch, len(real_images))))
        holdout = jnp.concatenate([
            holdout,
            encode(jnp.asarray(real_images[idx]),
                   key_for(0, "distill-vae-holdout", 1))])

    tracker = get_tracker_from(args)
    tracker.set_experiment(args.experiment_name or "tiny_vae_decoder")
    print_banner(f"Distilling tiny decoder: {args.steps} steps, "
                 f"C={args.base_channels}, {args.image_size}px")
    with tracker.start_run(run_name="tiny-decoder"):
        tracker.log_params({"steps": args.steps, "batch": args.batch,
                            "base_channels": args.base_channels,
                            "image_size": args.image_size,
                            "learning_rate": args.learning_rate,
                            "latent_source": ("mixed" if real_images
                                              is not None else "synthetic")})
        result = distill_vae_decoder(
            stack.vae, vae_vars, decoder, batches(),
            learning_rate=args.learning_rate, holdout=holdout,
            key=jax.random.PRNGKey(0),
            log=lambda k, v, s: tracker.log_metric(k, v, s))
        meta = dict(result.meta,
                    image_size=args.image_size,
                    latent_source=("mixed" if real_images is not None
                                   else "synthetic"))
        out = save_tiny_decoder(args.output_dir, result.params, meta)
        tracker.log_metric("rel_l2", round(result.rel_l2, 6))
        tracker.log_artifact(str(out), "tiny_decoder")
    print(f"tiny decoder saved to {out} "
          f"(holdout rel_l2 vs full decoder: {result.rel_l2:.4f})")
    return result


if __name__ == "__main__":
    main()
