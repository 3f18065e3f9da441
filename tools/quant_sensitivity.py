"""Per-layer-family W8A8 sensitivity sweep + quality gate.

Measures, for the fixed-seed SD sampling workload, the image-space damage
each quantized layer family causes alone (`quant.override(..., only=...)`),
then evaluates full quantization with the worst k families excluded
(`skip=...`) and the calibrated static mode. The go/no-go criterion for
ever making a quant mode default is GATE_REL_L2 (ops/quant.py): fixed-seed
rel L2 vs bf16 below the gate → eligible; above → stays opt-in.

Run (TPU): python tools/quant_sensitivity.py [--quick] [--batch 4]
           [--steps 25] [--image-size 256]
Prints one JSON report; BASELINE.md vendors the table.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# layer families addressable by path substring (models/unet_blocks.py)
FAMILIES = ("conv1", "conv2", "conv_shortcut", "proj_in", "proj_out",
            "to_q", "to_k", "to_v", "to_out",
            "ff_net_0_proj", "ff_net_2", "downsample", "upsample")

# go/no-go: fixed-seed image rel L2 vs bf16 must beat this for a quant mode
# to be promotable beyond opt-in (BASELINE.md quantization section)
GATE_REL_L2 = 0.05


def _sweep_context(batch: int, image_size: int, steps: int, quick: bool,
                   seed: int) -> dict:
    """Shared sweep plumbing: the SD stack on random weights, a fixed-seed
    bf16 reference image batch, and `images(mode, ...)`/`rel_l2` closures."""
    from polyp_tpu.diffusion import DiffusionSchedule, sample, with_cfg
    from polyp_tpu.models import (AutoencoderKL, sd14_unet,
                                  tiny_condition_unet, tiny_vae)
    from polyp_tpu.ops import quant

    dtype = jnp.bfloat16
    if quick:
        unet, vae, ctx_dim = tiny_condition_unet(dtype=dtype), tiny_vae(dtype=dtype), 32
    else:
        unet, vae, ctx_dim = sd14_unet(dtype=dtype), AutoencoderKL(dtype=dtype), 768
    latent = image_size // 8

    k = jax.random.PRNGKey(seed)
    uparams = jax.jit(unet.init)(
        {"params": k}, jnp.zeros((1, latent, latent, 4), dtype),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, ctx_dim), dtype))["params"]
    vparams = jax.jit(vae.init)(
        {"params": k}, jnp.zeros((1, image_size, image_size, 3), dtype), k)
    cond = jax.random.normal(k, (1, 77, ctx_dim), dtype)
    uncond = jnp.zeros((1, 77, ctx_dim), dtype)
    schedule = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)

    def make_generate(mode, scales=None, skip=(), only=None, split=None):
        from polyp_tpu.pipeline import _precision_segments

        @jax.jit
        def generate(uparams, vparams, cond, uncond, key):
            def apply_fn(z, tt, emb, m):
                with quant.override(m, scales=scales, skip=skip,
                                    only=only, t=tt):
                    return unet.apply({"params": uparams}, z, tt, emb)

            model_fn = with_cfg(lambda z, tt, emb: apply_fn(z, tt, emb, mode),
                                cond, uncond, 7.5)
            if split is not None:
                # hybrid-precision trajectory (pipeline._precision_split)
                fp_model = with_cfg(
                    lambda z, tt, emb: apply_fn(z, tt, emb, None),
                    cond, uncond, 7.5)
                model_fn = _precision_segments(model_fn, fp_model, steps,
                                               split)
            latents = sample("ddim", model_fn, schedule,
                             (batch, latent, latent, 4), key, steps)
            return vae.apply(vparams, latents.astype(dtype) / 0.18215,
                             method=vae.decode)
        return generate

    key = jax.random.PRNGKey(seed + 1)

    def images(mode, **kw):
        out = make_generate(mode, **kw)(uparams, vparams, cond, uncond, key)
        return np.asarray(out, np.float32)

    ref = images(None)

    def rel_l2(img):
        return float(np.linalg.norm(img - ref) / np.linalg.norm(ref))

    return {"unet": unet, "uparams": uparams, "vparams": vparams,
            "cond": cond, "uncond": uncond, "schedule": schedule,
            "latent": latent, "dtype": dtype, "images": images,
            "rel_l2": rel_l2}


def run_sweep(batch: int = 4, image_size: int = 256, steps: int = 25,
              quick: bool = False, seed: int = 0,
              forward_only: bool = False) -> dict:
    """`forward_only=True` scores each family by the rel-L2 of ONE UNet
    forward (mid-trajectory noisy latent) instead of a full fixed-seed
    sampling run — each config then compiles the bare forward (~minutes)
    rather than the whole 25-step scan (~tens of minutes on this host).
    Full-trajectory deltas are still measured for the aggregate configs
    (full w8a8, static, skip-worst-1)."""
    from polyp_tpu.diffusion.calibrate import calibrate_unet_scales
    from polyp_tpu.ops import quant

    ctx = _sweep_context(batch, image_size, steps, quick, seed)
    unet, uparams, schedule, latent, dtype = (
        ctx["unet"], ctx["uparams"], ctx["schedule"], ctx["latent"],
        ctx["dtype"])
    cond, uncond = ctx["cond"], ctx["uncond"]
    images, rel_l2 = ctx["images"], ctx["rel_l2"]

    report: dict = {"gate_rel_l2": GATE_REL_L2, "batch": batch,
                    "steps": steps, "image_size": image_size,
                    "quick": quick, "forward_only": forward_only}

    if forward_only:
        # per-family scoring on a single mid-trajectory forward
        x_mid = jax.random.normal(jax.random.PRNGKey(seed + 2),
                                  (batch, latent, latent, 4), dtype)
        t_mid = jnp.full((batch,), 500, jnp.int32)
        ctx_mid = jnp.broadcast_to(cond, (batch, 77, cond.shape[-1]))

        def fwd(mode, **kw):
            @jax.jit
            def f(uparams, x, t, c):
                with quant.override(mode, **kw):
                    return unet.apply({"params": uparams}, x, t, c)
            return np.asarray(f(uparams, x_mid, t_mid, ctx_mid), np.float32)

        fref = fwd(None)

        def frel(out):
            return float(np.linalg.norm(out - fref) / np.linalg.norm(fref))

        per_family = {}
        for fam in FAMILIES:
            per_family[fam] = frel(fwd("w8a8", only=(fam,)))
            print(f"# only={fam}: fwd rel_l2={per_family[fam]:.4f}",
                  flush=True)
    else:
        per_family = {}
        for fam in FAMILIES:
            per_family[fam] = rel_l2(images("w8a8", only=(fam,)))
            print(f"# only={fam}: rel_l2={per_family[fam]:.4f}", flush=True)
    report["per_family_rel_l2"] = dict(
        sorted(per_family.items(), key=lambda kv: -kv[1]))

    report["full_w8a8_rel_l2"] = rel_l2(images("w8a8"))
    print(f"# full w8a8: rel_l2={report['full_w8a8_rel_l2']:.4f}", flush=True)
    worst = list(report["per_family_rel_l2"])
    ks = (1,) if forward_only else (1, 2, 3)
    for k_excl in ks:
        skip = tuple(worst[:k_excl])
        report[f"w8a8_skip_worst{k_excl}"] = {
            "skip": skip, "rel_l2": rel_l2(images("w8a8", skip=skip))}
        print(f"# skip_worst{k_excl}: {report[f'w8a8_skip_worst{k_excl}']}",
              flush=True)

    scales = calibrate_unet_scales(unet, uparams, schedule,
                                   (2, latent, latent, 4), cond, uncond,
                                   num_steps=8)
    report["n_calibrated_layers"] = len(scales)
    report["w8a8_static_rel_l2"] = rel_l2(
        images("w8a8_static", scales=scales))
    print(f"# static: rel_l2={report['w8a8_static_rel_l2']:.4f}", flush=True)
    for k_excl in () if forward_only else (1, 2):
        skip = tuple(worst[:k_excl])
        report[f"w8a8_static_skip_worst{k_excl}"] = {
            "skip": skip,
            "rel_l2": rel_l2(images("w8a8_static", scales=scales, skip=skip))}

    for mode_key in ("full_w8a8_rel_l2", "w8a8_static_rel_l2"):
        report[mode_key.replace("_rel_l2", "_gate_pass")] = \
            report[mode_key] < GATE_REL_L2
    return report


def run_split_sweep(batch: int = 4, image_size: int = 256, steps: int = 25,
                    quick: bool = False, seed: int = 0,
                    splits: tuple[int, ...] = (1, 2, 3, 5, 8),
                    mode: str = "w8a8_static") -> dict:
    """Hybrid-precision trajectory sweep: fixed-seed image rel L2 vs bf16
    with the first N (fp_head) or last N (fp_tail) sampling steps forced
    full precision (pipeline._precision_split). The interesting output is
    the SMALLEST split that passes GATE_REL_L2 — its throughput
    (bench.py --quantize ... --quant-fp-head N) is then the best
    gate-passing number. Measured finding (toy + full scale, BASELINE.md):
    the fp HEAD is the effective direction — on a deterministic sampler
    the early evals set the trajectory, so quantizing only the middle/late
    steps keeps the output near its bf16 twin."""
    from polyp_tpu.diffusion.calibrate import calibrate_unet_scales
    from polyp_tpu.pipeline import _precision_split

    report = {"gate_rel_l2": GATE_REL_L2, "batch": batch, "steps": steps,
              "image_size": image_size, "quick": quick, "mode": mode,
              "splits": {}}
    ctx = _sweep_context(batch, image_size, steps, quick, seed)
    scales = None
    if mode == "w8a8_static":
        scales = calibrate_unet_scales(ctx["unet"], ctx["uparams"],
                                       ctx["schedule"],
                                       (2, ctx["latent"], ctx["latent"], 4),
                                       ctx["cond"], ctx["uncond"],
                                       num_steps=8)

    def measure(fp_head, fp_tail):
        eff_mode, split = _precision_split(steps, mode, fp_head, fp_tail)
        img = ctx["images"](eff_mode, scales=scales, split=split)
        return ctx["rel_l2"](img)

    r0 = measure(0, 0)
    report["splits"]["0"] = {"rel_l2": r0, "gate_pass": r0 < GATE_REL_L2}
    print(f"# pure {mode}: rel_l2={r0:.4f}", flush=True)
    for n in splits:
        rh = measure(n, 0)
        rt = measure(0, n)
        report["splits"][str(n)] = {
            "head_rel_l2": rh, "head_gate_pass": rh < GATE_REL_L2,
            "tail_rel_l2": rt, "tail_gate_pass": rt < GATE_REL_L2}
        print(f"# fp_head={n}: rel_l2={rh:.4f} "
              f"gate={'PASS' if rh < GATE_REL_L2 else 'fail'}   "
              f"fp_tail={n}: rel_l2={rt:.4f}", flush=True)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--forward-only", action="store_true",
                    help="score families on one UNet forward (compiles the "
                         "bare forward per family instead of the full "
                         "sampling scan)")
    ap.add_argument("--fp-split", type=str, default=None,
                    help="comma-separated split sizes to sweep instead of "
                         "the family sweep (hybrid-precision trajectory; "
                         "each N is measured as fp_head=N and fp_tail=N), "
                         "e.g. '1,2,3,5,8'")
    ap.add_argument("--mode", default="w8a8_static",
                    choices=["w8a8", "w8a8_static"],
                    help="quant mode for the --fp-split sweep")
    args = ap.parse_args()
    if args.fp_split is not None:
        splits = tuple(int(v) for v in args.fp_split.split(",") if v)
        print(json.dumps(run_split_sweep(
            args.batch, args.image_size, args.steps, args.quick,
            splits=splits, mode=args.mode)))
    else:
        print(json.dumps(run_sweep(args.batch, args.image_size, args.steps,
                                   args.quick,
                                   forward_only=args.forward_only)))


if __name__ == "__main__":
    main()
