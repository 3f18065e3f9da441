"""Roofline decomposition of the 256px SD sampling step (VERDICT r2 #7).

Makes "fast enough" falsifiable: measures, on the real chip,
(a) the achieved MXU rate of each SD conv shape class in bf16 and int8,
(b) flash-attention time at each level's token count,
(c) the VAE decode, and
(d) the analytic FLOP/byte totals of one CFG UNet step
    (jax lower().cost_analysis()),
then prints the implied per-step floor and the ceiling in samples/sec/chip
for bf16 and w8a8 against the measured end-to-end numbers.

Run (TPU, exclusive): python tools/roofline.py [--batch 16] [--steps 50]
Prints one JSON report; BASELINE.md vendors the table.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# v5e peaks (public spec): 197 bf16 TFLOP/s, 394 int8 TOP/s, 819 GB/s HBM
PEAK_BF16_TFLOPS = 197.0
PEAK_INT8_TOPS = 394.0
HBM_GBPS = 819.0

# SD UNet conv shape classes at 32×32 latents (CFG batch = 2×B):
# (spatial, channels) per level — level 3 shares level 2's channel width
LEVELS = [(32, 320), (16, 640), (8, 1280), (4, 1280)]


def _sync(x) -> float:
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def time_op(f, *args, iters: int = 300, reps: int = 3) -> float:
    """Best-of reps of `iters` chained executions (one sync per rep).
    The chain carries f's output into the next input (data dependence
    defeats the (executable, args) memoization — verify-skill trap #2);
    f is responsible for keeping its output magnitude/dtype stable.
    300 iterations amortize the ~29 ms axon-tunnel sync round trip to
    <0.1 ms — at 20 iterations every sub-ms op 'measures' ~1.5 ms
    (verify-skill trap #3, re-hit by this tool's first run)."""
    @jax.jit
    def chained(*a):
        def body(i, acc):
            return f(acc, *a[1:])
        return jax.lax.fori_loop(0, iters, body, a[0])

    _sync(chained(*args))
    best = 1e9
    for r in range(reps):
        if jnp.issubdtype(args[0].dtype, jnp.floating):
            a0 = args[0] + r * 1e-4
        else:
            a0 = jnp.bitwise_xor(args[0], r)
        _sync(a0)
        t0 = time.perf_counter()
        _sync(chained(a0, *args[1:]))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_conv(batch: int, spatial: int, c: int, dtype) -> dict:
    """3×3 SAME conv timing at an SD shape class; returns ms + TF/s."""
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, spatial, spatial, c),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16)
    if dtype == jnp.int8:
        x = jnp.clip(jnp.round(x * 50), -127, 127).astype(jnp.int8)
        w = jnp.clip(jnp.round(w * 50), -127, 127).astype(jnp.int8)

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                    else jnp.bfloat16))
        # keep the chain dtype- and magnitude-stable for the fori_loop
        if dtype == jnp.int8:
            return jnp.clip(y // 1024, -127, 127).astype(jnp.int8)
        return y * jnp.bfloat16(1.0 / (3.0 * c ** 0.5))

    sec = time_op(conv, x, w)
    flops = 2 * batch * spatial * spatial * 9 * c * c
    return {"ms": round(sec * 1e3, 4),
            "tflops": round(flops / sec / 1e12, 1)}


def bench_attention(batch_heads: int, tokens: int, head_dim: int = 64) -> dict:
    from polyp_tpu.ops import dot_product_attention

    q = jax.random.normal(jax.random.PRNGKey(0),
                          (batch_heads, tokens, 8, head_dim), jnp.bfloat16)

    def attn(q):
        return dot_product_attention(q, q, q)

    sec = time_op(attn, q)
    flops = 4 * batch_heads * 8 * tokens * tokens * head_dim
    return {"ms": round(sec * 1e3, 4),
            "tflops": round(flops / sec / 1e12, 1)}


def unet_step_analysis(batch: int, image_size: int,
                       cfg: bool = True) -> dict:
    """Analytic totals of ONE UNet forward via XLA cost analysis
    (cfg=True doubles the batch — the guided path; cfg=False is the
    folded-guidance 1× batch of a distilled student)."""
    from polyp_tpu.models import sd14_unet

    unet = sd14_unet(dtype=jnp.bfloat16)
    latent = image_size // 8
    cfg_batch = 2 * batch if cfg else batch
    x = jnp.zeros((cfg_batch, latent, latent, 4), jnp.bfloat16)
    t = jnp.zeros((cfg_batch,), jnp.int32)
    ctx = jnp.zeros((cfg_batch, 77, 768), jnp.bfloat16)
    params = jax.eval_shape(
        lambda k: unet.init(k, x[:1], t[:1], ctx[:1]),
        jax.random.PRNGKey(0))["params"]

    def fwd(params, x, t, ctx):
        return unet.apply({"params": params}, x, t, ctx)

    lowered = jax.jit(fwd).lower(params, x, t, ctx)
    cost = lowered.compile().cost_analysis()
    return {"flops": float(cost.get("flops", float("nan"))),
            "bytes": float(cost.get("bytes accessed", float("nan")))}


def vae_decode_analysis(batch: int, image_size: int,
                        iters: int = 20) -> dict:
    """VAE-decode cost analysis + measured device time — the few-step
    Amdahl term: at 50 steps decode is a few % of a sample; at 4 folded
    steps the same decode competes with the whole UNet scan."""
    from polyp_tpu.models import AutoencoderKL

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    latent = image_size // 8
    z = jax.random.normal(jax.random.PRNGKey(0),
                          (batch, latent, latent, 4), jnp.bfloat16)
    vparams = jax.jit(vae.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, image_size, image_size, 3), jnp.bfloat16),
        jax.random.PRNGKey(0))

    def decode(vparams, z):
        return vae.apply(vparams, z, method=vae.decode)

    lowered = jax.jit(decode).lower(vparams, z)
    cost = lowered.compile().cost_analysis()

    # chained timing: feed a data-dependent perturbation of the same z back
    # in so XLA cannot CSE the iterations, one sync per rep (time_op note)
    @jax.jit
    def chained(vparams, z):
        def body(i, carry):
            img = decode(vparams, carry)
            return z + (1e-12 * jnp.mean(img.astype(jnp.float32))
                        ).astype(z.dtype)
        return jax.lax.fori_loop(0, iters, body, z)

    _sync(chained(vparams, z))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(chained(vparams, z))
        best = min(best, time.perf_counter() - t0)
    sec = best / iters
    flops = float(cost.get("flops", float("nan")))
    return {"ms": round(sec * 1e3, 2),
            "flops": flops,
            "bytes": float(cost.get("bytes accessed", float("nan"))),
            "tflops": round(flops / sec / 1e12, 1),
            "batch": batch}


def run_fewstep(batch: int, image_size: int,
                step_counts=(4, 8, 25)) -> dict:
    """Roofline for FOLDED-guidance few-step sampling (distilled students):
    per-sample cost = steps × (1×-batch UNet step) + VAE decode. Reports
    analytic floors, the implied ceiling per step count, and the measured
    decode share."""
    report: dict = {"batch": batch, "image_size": image_size,
                    "mode": "folded_cfg_1x_batch"}
    analysis = unet_step_analysis(batch, image_size, cfg=False)
    report["unet_1x_step"] = analysis
    print(f"# unet 1x step analysis: {analysis}", flush=True)

    # measured 1×-batch conv rate proxy: reuse the CFG-batch measurements
    # at half batch (same shape classes, batch halved)
    convs = {}
    for spatial, c in LEVELS:
        key = f"{spatial}x{spatial}x{c}"
        convs[key] = bench_conv(batch, spatial, c, jnp.bfloat16)
        print(f"# conv(1x) {key}: {convs[key]}", flush=True)
    report["conv_rates_1x"] = convs
    best_bf16 = max(v["tflops"] for v in convs.values())

    vae = vae_decode_analysis(batch, image_size)
    report["vae_decode"] = vae
    print(f"# vae decode: {vae}", flush=True)

    flop_floor_ms = analysis["flops"] / (best_bf16 * 1e12) * 1e3
    mem_floor_ms = analysis["bytes"] / (HBM_GBPS * 1e9) * 1e3
    step_floor_ms = max(flop_floor_ms, mem_floor_ms)
    vae_floor_ms = max(vae["flops"] / (best_bf16 * 1e12) * 1e3,
                       vae["bytes"] / (HBM_GBPS * 1e9) * 1e3)
    report["floors_ms"] = {
        "unet_1x_step_flops": round(flop_floor_ms, 2),
        "unet_1x_step_bytes": round(mem_floor_ms, 2),
        "vae_decode_floor": round(vae_floor_ms, 2),
        "vae_decode_measured": vae["ms"],
    }
    ceilings = {}
    for n in step_counts:
        floor_total_ms = n * step_floor_ms + vae_floor_ms
        meas_total_ms = n * step_floor_ms + vae["ms"]
        ceilings[str(n)] = {
            "samples_per_sec_analytic": round(
                batch / (floor_total_ms / 1e3), 2),
            "samples_per_sec_meas_decode": round(
                batch / (meas_total_ms / 1e3), 2),
            "vae_share_at_floor": round(
                vae["ms"] / (n * step_floor_ms + vae["ms"]), 3),
        }
    report["fewstep_ceilings"] = ceilings
    return report


def run_train(sd_batch: int = 8, sd_image_size: int = 256,
              cls_batch: int = 16, cls_image_size: int = 224) -> dict:
    """Roofline for the TRAINING paths: lowers the real jitted train steps
    (train/sd_finetune.py::sd_lora_train_step at the reference's pretrained
    config, train/classifier.py::train_step at the reference's classifier
    config) through XLA cost analysis, then measures steady-state
    throughput with the bench.py chained-step harness. Floors follow the
    sampling roofline's method: all step FLOPs at the best measured conv
    rate, all bytes at HBM peak, true floor = max(compute, memory).

    Caveat the report carries: cost_analysis FLOPs include rematerialized
    compute (what the chip actually executes), and the classifier's
    depthwise convs are VPU-bound, so its MXU-rate ceiling is a known
    overestimate — the bytes floor is the binding one there."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench  # repo-root bench.py: reuses its train-step setup/timing

    report: dict = {"mode": "train"}

    # measured large-conv bf16 rate at each path's batch (no CFG doubling
    # in training)
    conv_rate_sd = max(bench_conv(sd_batch, s, c, jnp.bfloat16)["tflops"]
                       for s, c in LEVELS)
    report["best_conv_tflops_sd_batch"] = conv_rate_sd
    print(f"# best conv rate at batch {sd_batch}: {conv_rate_sd} TF/s",
          flush=True)

    # --- SD LoRA fine-tune step (the flagship training path) ---
    from polyp_tpu.configs import DiffusionConfig
    from polyp_tpu.diffusion import DiffusionSchedule
    from polyp_tpu.lora import LoRAConfig, init_lora
    from polyp_tpu.models import (SD14_TEXT_CONFIG, AutoencoderKL,
                                  CLIPTextModel, sd14_unet)
    from polyp_tpu.train.sd_finetune import (SDComponents,
                                             create_sd_train_state,
                                             init_trainable,
                                             sd_lora_train_step)

    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    unet = sd14_unet(dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)
    text = CLIPTextModel(SD14_TEXT_CONFIG, dtype=dtype)
    latent = sd_image_size // 8
    unet_params = jax.jit(unet.init)(
        {"params": k}, jnp.zeros((1, latent, latent, 4), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), dtype))["params"]
    vae_params = jax.jit(vae.init)(
        {"params": k}, jnp.zeros((1, sd_image_size, sd_image_size, 3), dtype),
        k)
    text_params = jax.jit(text.init)(
        {"params": k}, jnp.zeros((1, 77), jnp.int32))["params"]
    frozen = SDComponents(
        unet_params=unet_params,
        vae_params=vae_params,
        text_params=text_params,
        unet_apply=lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
        vae_encode=lambda p, x: vae.apply(p, x, method=vae.encode_moments),
        text_apply=lambda p, ids: text.apply({"params": p}, ids),
    )
    cfg = DiffusionConfig(image_size=sd_image_size,
                          train_batch_size=sd_batch).with_schedule(100)
    sched = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)
    lcfg = LoRAConfig(rank=8, alpha=8.0, dropout=0.0)
    state = create_sd_train_state(
        cfg, init_trainable(init_lora(unet_params, lcfg,
                                      jax.random.PRNGKey(1))))
    images = jnp.zeros((sd_batch, sd_image_size, sd_image_size, 3), jnp.uint8)
    ids = jnp.zeros((1, 77), jnp.int32)
    none_ids = jnp.zeros((1,), jnp.int32)
    cost = (sd_lora_train_step
            .lower(state, frozen, sched, images, ids, none_ids,
                   jax.random.PRNGKey(2), lcfg)
            .compile().cost_analysis())
    sd = {"batch": sd_batch, "image_size": sd_image_size,
          "flops": float(cost.get("flops", float("nan"))),
          "bytes": float(cost.get("bytes accessed", float("nan")))}
    flop_floor_ms = sd["flops"] / (conv_rate_sd * 1e12) * 1e3
    mem_floor_ms = sd["bytes"] / (HBM_GBPS * 1e9) * 1e3
    sd["floor_ms"] = {"flops_at_best_conv_rate": round(flop_floor_ms, 2),
                      "bytes_at_hbm_peak": round(mem_floor_ms, 2)}
    sd["ceiling_images_per_sec"] = round(
        sd_batch / (max(flop_floor_ms, mem_floor_ms) / 1e3), 1)
    print(f"# sd lora step analysis: {sd}", flush=True)
    del state, frozen, unet_params, vae_params, text_params  # free HBM
    meas = bench.bench_sd_lora_train(sd_batch, sd_image_size)
    sd["measured_images_per_sec"] = round(
        meas["sd_lora_train_images_per_sec"], 1)
    sd["pct_of_ceiling"] = round(100 * sd["measured_images_per_sec"]
                                 / sd["ceiling_images_per_sec"], 1)
    report["sd_lora_step"] = sd
    print(f"# sd lora step: {sd}", flush=True)

    # --- classifier step (EfficientNet-B0, reference config) ---
    from polyp_tpu.configs import ClassificationConfig
    from polyp_tpu.train.classifier import create_classifier_state, train_step
    from polyp_tpu.utils.rng import key_for

    ccfg = ClassificationConfig(image_size=cls_image_size,
                                batch_size=cls_batch)
    cstate, _ = create_classifier_state(ccfg, 3, jax.random.PRNGKey(0))
    cimgs = jnp.zeros((cls_batch, cls_image_size, cls_image_size, 3),
                      jnp.uint8)
    clbls = jnp.zeros((cls_batch,), jnp.int32)
    ccost = (train_step
             .lower(cstate, cimgs, clbls, key_for(0, "roofline", 0),
                    None, "bf16")
             .compile().cost_analysis())
    cls = {"batch": cls_batch, "image_size": cls_image_size,
           "flops": float(ccost.get("flops", float("nan"))),
           "bytes": float(ccost.get("bytes accessed", float("nan")))}
    cflop_ms = cls["flops"] / (conv_rate_sd * 1e12) * 1e3
    cmem_ms = cls["bytes"] / (HBM_GBPS * 1e9) * 1e3
    cls["floor_ms"] = {"flops_at_best_conv_rate": round(cflop_ms, 3),
                       "bytes_at_hbm_peak": round(cmem_ms, 3),
                       "note": "B0's depthwise convs are VPU-bound, not "
                               "MXU — the flops floor is a known "
                               "underestimate; bytes is the binding floor"}
    cls["ceiling_images_per_sec"] = round(
        cls_batch / (max(cflop_ms, cmem_ms) / 1e3), 1)
    del cstate
    cmeas = bench.bench_classifier_train(cls_batch, cls_image_size)
    cls["measured_images_per_sec"] = round(cmeas["train_images_per_sec"], 1)
    cls["pct_of_ceiling"] = round(100 * cls["measured_images_per_sec"]
                                  / cls["ceiling_images_per_sec"], 1)
    report["classifier_step"] = cls
    print(f"# classifier step: {cls}", flush=True)
    return report


def run_distill(batch: int = 8, image_size: int = 256) -> dict:
    """Roofline for the DISTILL phase step (teacher 2-substep CFG + student
    fwd/bwd — train/distill.make_distill_step at full SD size): analytic
    floors from XLA cost analysis vs bench.bench_distill_train's measured
    rate, plus the minutes-per-phase price the distilled serving numbers
    invite (VERDICT r4 weak #4)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import bench

    report: dict = {"mode": "distill_train", "batch": batch,
                    "image_size": image_size}
    conv_rate = max(bench_conv(batch, s, c, jnp.bfloat16)["tflops"]
                    for s, c in LEVELS)
    report["best_conv_tflops"] = conv_rate

    meas = bench.bench_distill_train(batch, image_size)
    report["measured"] = meas

    # analytic: the measured config's step lowered through cost analysis
    # (includes remat recompute — what the chip actually executes)
    import optax

    from polyp_tpu.diffusion import DiffusionSchedule
    from polyp_tpu.models import sd14_unet
    from polyp_tpu.train.distill import (DistillState, distill_grid,
                                         make_distill_step)

    dtype = jnp.bfloat16
    unet = sd14_unet(dtype=dtype)
    latent = image_size // 8
    k = jax.random.PRNGKey(0)
    params = jax.eval_shape(
        lambda kk: unet.init({"params": kk},
                             jnp.zeros((1, latent, latent, 4), dtype),
                             jnp.zeros((1,), jnp.int32),
                             jnp.zeros((1, 77, 768), dtype)), k)["params"]
    cond = jnp.zeros((1, 77, 768), dtype)
    sched = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)
    grid = distill_grid(sched, 20)
    unet_apply = jax.checkpoint(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c))

    def _ctx(x, e):
        return jnp.broadcast_to(e, (x.shape[0],) + e.shape[-2:])

    def teacher_apply(p, x, t):
        x2 = jnp.concatenate([x, x], 0)
        t2 = jnp.concatenate([t, t], 0)
        e2 = jnp.concatenate([_ctx(x, cond), _ctx(x, cond)], 0)
        u, c = jnp.split(unet_apply(p, x2, t2, e2), 2, 0)
        return u + 7.5 * (c - u)

    def student_apply(p, x, t):
        return unet_apply(p, x, t, _ctx(x, cond))

    bs = int(meas["batch"])
    if meas["optimizer"] == "adamw":
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(1e-4, weight_decay=1e-2))
    else:
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adafactor(1e-4))
    state = jax.eval_shape(
        lambda p: DistillState(step=jnp.zeros((), jnp.int32), params=p,
                               opt_state=tx.init(p), tx=tx), params)
    step = make_distill_step(student_apply, teacher_apply, sched, sched,
                             grid)
    cost = (step.lower(state, params,
                       jax.ShapeDtypeStruct((bs, latent, latent, 4),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((2,), jnp.uint32))
            .compile().cost_analysis())
    ana = {"flops": float(cost.get("flops", float("nan"))),
           "bytes": float(cost.get("bytes accessed", float("nan")))}
    flop_ms = ana["flops"] / (conv_rate * 1e12) * 1e3
    mem_ms = ana["bytes"] / (HBM_GBPS * 1e9) * 1e3
    ana["floor_ms"] = {"flops_at_best_conv_rate": round(flop_ms, 2),
                       "bytes_at_hbm_peak": round(mem_ms, 2)}
    ana["ceiling_images_per_sec"] = round(
        bs / (max(flop_ms, mem_ms) / 1e3), 2)
    ana["pct_of_ceiling"] = round(
        100 * meas["distill_train_images_per_sec"]
        / ana["ceiling_images_per_sec"], 1)
    report["analysis"] = ana
    print(f"# distill step: {report}", flush=True)
    return report


def run(batch: int, steps: int, image_size: int,
        measured: dict | None = None) -> dict:
    report: dict = {"batch": batch, "steps": steps,
                    "image_size": image_size,
                    "peaks": {"bf16_tflops": PEAK_BF16_TFLOPS,
                              "int8_tops": PEAK_INT8_TOPS,
                              "hbm_gbps": HBM_GBPS}}
    cfg_batch = 2 * batch

    convs = {}
    for spatial, c in LEVELS:
        key = f"{spatial}x{spatial}x{c}"
        convs[key] = {
            "bf16": bench_conv(cfg_batch, spatial, c, jnp.bfloat16),
            "int8": bench_conv(cfg_batch, spatial, c, jnp.int8),
        }
        print(f"# conv {key}: {convs[key]}", flush=True)
    report["conv_rates"] = convs

    attn = {}
    for spatial, _ in LEVELS[:3]:  # level-3 has no attention
        tokens = spatial * spatial
        attn[f"{tokens}tok"] = bench_attention(cfg_batch, tokens)
        print(f"# attn {tokens}: {attn[f'{tokens}tok']}", flush=True)
    report["attention"] = attn

    analysis = unet_step_analysis(batch, image_size)
    report["unet_cfg_step"] = analysis
    print(f"# unet step analysis: {analysis}", flush=True)

    # floors: all step FLOPs at the best measured large-conv rate; all step
    # bytes at HBM peak — the true floor is max(compute, memory)
    best_bf16 = max(v["bf16"]["tflops"] for v in convs.values())
    best_int8 = max(v["int8"]["tflops"] for v in convs.values())
    flop_floor_bf16_ms = analysis["flops"] / (best_bf16 * 1e12) * 1e3
    flop_floor_int8_ms = analysis["flops"] / (best_int8 * 1e12) * 1e3
    mem_floor_ms = analysis["bytes"] / (HBM_GBPS * 1e9) * 1e3
    attn_ms = sum(v["ms"] for v in attn.values())  # 1 self+1 cross ≈ 2× self?
    report["floors_ms"] = {
        "unet_flops_at_best_measured_bf16_rate": round(flop_floor_bf16_ms, 2),
        "unet_flops_at_best_measured_int8_rate": round(flop_floor_int8_ms, 2),
        "unet_bytes_at_hbm_peak": round(mem_floor_ms, 2),
        "attention_measured_per_step": round(attn_ms, 2),
    }

    def ceiling(step_floor_ms):
        # 50-step sample ceiling ignoring VAE decode (measured separately)
        return batch / (steps * step_floor_ms / 1e3)

    report["ceiling_samples_per_sec"] = {
        "bf16": round(ceiling(max(flop_floor_bf16_ms, mem_floor_ms)), 2),
        # cost_analysis bytes are for the bf16 program; int8 roughly halves
        # matmul/conv operand traffic, so its true mem floor sits well below
        # the bf16 one — report the flops-only ceiling and label it.
        "int8_flops_only": round(ceiling(flop_floor_int8_ms), 2),
    }
    if measured:
        report["measured"] = measured
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--few-step", action="store_true",
                    help="roofline for folded-guidance few-step sampling "
                         "(distilled students): 1x-batch UNet step + VAE "
                         "decode Amdahl term (run_fewstep)")
    ap.add_argument("--train", action="store_true",
                    help="roofline for the TRAINING paths: SD LoRA step "
                         "(batch 8 @256px) + classifier step (batch 16 "
                         "@224px), analytic floors vs measured (run_train)")
    ap.add_argument("--distill", action="store_true",
                    help="roofline for the DISTILL phase step: teacher "
                         "2-substep CFG + full-param student fwd/bwd at "
                         "SD size, measured vs ceiling + minutes/phase "
                         "(run_distill)")
    args = ap.parse_args()
    if args.distill:
        # the sampling default (--batch 16) is not the distill config;
        # 8 is the reference train batch (config_diffusion.py:7)
        b = 8 if args.batch == 16 else args.batch
        print(json.dumps(run_distill(b, args.image_size)))
    elif args.train:
        print(json.dumps(run_train()))
    elif args.few_step:
        print(json.dumps(run_fewstep(args.batch, args.image_size)))
    else:
        print(json.dumps(run(args.batch, args.steps, args.image_size)))


if __name__ == "__main__":
    main()
