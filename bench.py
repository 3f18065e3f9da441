"""Benchmark: 256px diffusion sampling throughput (samples/sec/chip).

The BASELINE.json headline metric: end-to-end 256px image generation through
the SD-v1-4 stack — 50-step DDIM over the 860M UNet with CFG (2× batch) +
VAE decode — on one chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

`vs_baseline` compares against the MEASURED PyTorch-CPU reference
throughput (tools/bench_reference.py: the exact 859,520,964-param SD UNet
compute graph + VAE decoder in torch fp32, 25-step CFG workload, measured
on this host and vendored in tools/reference_baseline.json). BASELINE.json
`published` is empty — the reference repo ships no perf numbers (SURVEY §6).

Flags: --steps N --batch N --image-size N --sampler ddim|unipc|dpmpp_2m
       --quick (tiny model smoke) --train (benchmark train-step img/s too)
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persist compiled executables across runs: the 860M-UNet scan takes minutes
# to compile on this 1-core host, seconds to reload from cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def _reference_baseline() -> tuple[float, int]:
    """Measured torch-CPU reference throughput and the thread count it was
    measured with (see module docstring). Falls back to the vendored
    measurement from this host (0.007655 samples/sec, 1 thread) if the JSON
    is missing."""
    import pathlib

    p = pathlib.Path(__file__).parent / "tools" / "reference_baseline.json"
    try:
        d = json.loads(p.read_text())
        return float(d["torch_cpu_samples_per_sec"]), int(d.get("threads", 1))
    except Exception:
        return 0.007655, 1


def _promoted_quant() -> dict | None:
    """The gate-passing quant config, if one exists (package data
    polyp_tpu/ops/quant_gate.json — vendored from the measured
    tools/quant_sensitivity.py sweep). The bench headline uses it when
    `gate_pass` is true; bf16 becomes the companion. Deleting the file (or
    flipping gate_pass) demotes the headline back to bf16 — the promotion
    is data, not code."""
    try:
        from polyp_tpu.ops.quant import promoted_config
        return promoted_config()
    except Exception:
        return None


REFERENCE_CPU_SAMPLES_PER_SEC, REFERENCE_CPU_THREADS = _reference_baseline()
# A realistic reference deployment is a multi-core node, not this 1-core
# bench host. 16 cores with PERFECT linear scaling is an upper bound on the
# baseline's throughput, so the ratio against it is a defensible LOWER
# bound on the speedup — both numbers travel in the JSON line.
REFERENCE_NORMALIZED_CORES = 16


def bench_sampling(batch_size: int, image_size: int, steps: int,
                   sampler_name: str, quick: bool, repeats: int = 3,
                   quantize: str | None = None,
                   quant_fp_head: int = 0, quant_fp_tail: int = 0) -> dict:
    from polyp_tpu.diffusion import DiffusionSchedule, sample, with_cfg
    from polyp_tpu.ops import quant
    from polyp_tpu.pipeline import _precision_segments, _precision_split
    from polyp_tpu.models import sd14_unet, tiny_condition_unet, tiny_vae, AutoencoderKL

    dtype = jnp.bfloat16
    if quick:
        unet = tiny_condition_unet(dtype=dtype)
        vae = tiny_vae(dtype=dtype)
        ctx_dim, latent = 32, image_size // 8
    else:
        unet = sd14_unet(dtype=dtype)
        vae = AutoencoderKL(dtype=dtype)
        ctx_dim, latent = 768, image_size // 8

    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, latent, latent, 4), dtype)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, ctx_dim), dtype)
    uparams = jax.jit(unet.init)({"params": k}, x, t, ctx)["params"]
    vparams = jax.jit(vae.init)({"params": k},
                                jnp.zeros((1, image_size, image_size, 3), dtype),
                                k)
    cond = jax.random.normal(k, (1, 77, ctx_dim), dtype)
    uncond = jnp.zeros((1, 77, ctx_dim), dtype)

    schedule = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)

    scales = None
    if quantize == "w8a8_static":
        from polyp_tpu.diffusion.calibrate import ensure_scales
        t0 = time.perf_counter()
        # fingerprint mirrors pipeline._ensure_calibrated (guidance mode +
        # prediction type included) so guided and folded calibrations of
        # the same params can never collide in the disk cache
        scales = ensure_scales(unet, uparams, schedule,
                               (2, latent, latent, 4), cond, uncond,
                               fingerprint_extras=(image_size, 1000, 7.5,
                                                   "epsilon"))
        # stderr: stdout carries ONLY the one JSON line the driver parses
        import sys
        print(f"# calibrated {len(scales)} scales in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    quantize, split = _precision_split(steps, quantize, quant_fp_head,
                                       quant_fp_tail)

    # params/embeddings MUST be jit *arguments*: closing over them embeds
    # 860M weights as HLO constants and compile time explodes.
    @jax.jit
    def generate(uparams, vparams, cond, uncond, key):
        def apply_fn(z, tt, emb, mode):
            with quant.override(mode, scales=scales, t=tt):
                return unet.apply({"params": uparams}, z, tt, emb)

        def q_raw(z, tt, emb):
            return apply_fn(z, tt, emb, quantize)

        model_fn = with_cfg(q_raw, cond, uncond, 7.5)
        if split is not None:
            # hybrid-precision trajectory (pipeline._precision_split)
            fp_model = with_cfg(lambda z, tt, emb: apply_fn(z, tt, emb, None),
                                cond, uncond, 7.5)
            model_fn = _precision_segments(model_fn, fp_model, steps, split)
        latents = sample(sampler_name, model_fn, schedule,
                         (batch_size, latent, latent, 4), key, steps)
        return vae.apply(vparams, latents.astype(dtype) / 0.18215,
                         method=vae.decode)

    def run_sync(key) -> float:
        # Host-fetch a full reduction: block_until_ready alone has been
        # observed returning early under the experimental axon tunnel;
        # device_get of a scalar that depends on every output element
        # cannot complete before the computation does.
        out = generate(uparams, vparams, cond, uncond, key)
        return float(jax.device_get(jnp.mean(out.astype(jnp.float32))))

    # compile + warmup
    t0 = time.perf_counter()
    checksum = run_sync(jax.random.PRNGKey(1))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(checksum), "non-finite sample output"

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run_sync(jax.random.PRNGKey(2 + i))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "samples_per_sec": batch_size / best,
        "sec_per_batch": best,
        "compile_sec": compile_s,
        "batch_size": batch_size,
    }


def bench_distilled(batch_size: int, image_size: int, steps: int,
                    quick: bool = False, repeats: int = 3,
                    quantize: str | None = None,
                    quantize_vae: bool = False,
                    tiny_decoder: bool = False,
                    tiny_decoder_dir: str | None = None) -> dict:
    """Folded-guidance few-step sampling — the distilled-student serving
    path (train/distill.py + cli/distill_sd.py): cond-only UNet at 1× batch
    (no CFG doubling), N-step trailing DDIM, VAE decode per image.

    Throughput needs no trained weights: a distilled student has IDENTICAL
    FLOPs to the random-init model (same architecture, fewer sampler steps,
    half the CFG batch). Quality is the trained model's burden
    (BASELINE.md parity debts); throughput is measured here.

    Also decomposes the run into UNet-scan vs VAE-decode device time (the
    few-step Amdahl term: at 50 steps decode is ~5% of the sample, at 4
    steps the same decode is ~10× the share)."""
    from polyp_tpu.diffusion import DiffusionSchedule, sample, with_cfg
    from polyp_tpu.ops import quant
    from polyp_tpu.models import (AutoencoderKL, sd14_unet,
                                  tiny_condition_unet, tiny_vae)

    dtype = jnp.bfloat16
    if quick:
        unet = tiny_condition_unet(dtype=dtype)
        vae = tiny_vae(dtype=dtype)
        ctx_dim, latent = 32, image_size // 8
    else:
        unet = sd14_unet(dtype=dtype)
        vae = AutoencoderKL(dtype=dtype)
        ctx_dim, latent = 768, image_size // 8

    k = jax.random.PRNGKey(0)
    uparams = jax.jit(unet.init)(
        {"params": k}, jnp.zeros((1, latent, latent, 4), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, ctx_dim), dtype),
    )["params"]
    vparams = jax.jit(vae.init)(
        {"params": k}, jnp.zeros((1, image_size, image_size, 3), dtype), k)
    cond = jax.random.normal(k, (1, 77, ctx_dim), dtype)
    schedule = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)

    scales = None
    if quantize == "w8a8_static":
        from polyp_tpu.diffusion.calibrate import ensure_scales
        # Calibrate on the FOLDED trajectory this bench measures and the
        # student serving path runs (cond-only 1× batch, guidance None —
        # pipeline._ensure_calibrated's exact configuration), with the
        # guidance mode in the fingerprint so the cache cannot hand back
        # bench_sampling's guided-CFG tables for the same random params
        # (test_calibration_folded_guidance_and_v_head proves the two
        # trajectories calibrate to different tables).
        scales = ensure_scales(unet, uparams, schedule,
                               (2, latent, latent, 4), cond, None,
                               num_steps=min(8, steps),
                               guidance_scale=None,
                               fingerprint_extras=(image_size, 1000, None,
                                                   "epsilon"))

    def denoise(uparams, cond, key):
        def raw(z, tt, emb):
            with quant.override(quantize, scales=scales, t=tt):
                return unet.apply({"params": uparams}, z, tt, emb)

        model_fn = with_cfg(raw, cond, None, None)  # folded: cond-only, 1×
        return sample("ddim", model_fn, schedule,
                      (batch_size, latent, latent, 4), key, steps,
                      spacing="trailing", steps_offset=0)

    vae_mode = "w8a8" if quantize_vae else None

    tiny_mod = tiny_params = None
    if tiny_decoder:
        # distilled tiny decoder (models/tiny_decoder.py): ~30× fewer
        # decode FLOPs. Throughput is weight-independent (random init and
        # a trained student run the identical program); fidelity is the
        # trained artifact's burden (polyp-distill-vae rel_l2, vendored
        # when --tiny-decoder-dir points at one).
        from polyp_tpu.models.tiny_decoder import (load_tiny_decoder,
                                                   tiny_decoder_for_vae)
        if tiny_decoder_dir:
            tiny_mod, tiny_params, tiny_meta = load_tiny_decoder(
                tiny_decoder_dir)
        else:
            tiny_meta = None
            tiny_mod = tiny_decoder_for_vae(vae, dtype=dtype)
            tiny_params = jax.jit(tiny_mod.init)(
                {"params": k},
                jnp.zeros((1, latent, latent, 4), jnp.float32))["params"]

    def _decode(vparams, z, mode):
        # the VAE decode is the few-step Amdahl term (module docstring);
        # mode="w8a8" routes its ResnetBlock2D convs through QConv with
        # dynamic per-tensor activation scales (no timestep dependence, so
        # no calibration needed); mode="tiny" is the distilled decoder
        if mode == "tiny":
            return tiny_mod.apply({"params": tiny_params}, z.astype(dtype))
        with quant.override(mode):
            return vae.apply(vparams, z.astype(dtype) / 0.18215,
                             method=vae.decode)

    if tiny_decoder:
        vae_mode = "tiny"

    @jax.jit
    def generate(uparams, vparams, cond, key):
        latents = denoise(uparams, cond, key)
        return _decode(vparams, latents, vae_mode)

    unet_only = jax.jit(denoise)
    decode_only = jax.jit(lambda vparams, z: _decode(vparams, z, vae_mode))

    def timed(fn, *args, n=repeats) -> float:
        out = fn(*args)  # compile + warmup
        float(jax.device_get(jnp.mean(out.astype(jnp.float32))))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jax.device_get(jnp.mean(out.astype(jnp.float32))))
            best = min(best, time.perf_counter() - t0)
        return best

    key = jax.random.PRNGKey(3)
    e2e = timed(generate, uparams, vparams, cond, key)
    unet_s = timed(unet_only, uparams, cond, key)
    z = jax.random.normal(key, (batch_size, latent, latent, 4), dtype)
    vae_s = timed(decode_only, vparams, z * 0.18215)
    out = {
        "samples_per_sec": batch_size / e2e,
        "sec_per_batch": e2e,
        "unet_scan_sec": unet_s,
        "vae_decode_sec": vae_s,
        "vae_share": vae_s / (unet_s + vae_s),
        "batch_size": batch_size,
        "steps": steps,
    }
    if tiny_decoder:
        out["decoder"] = "tiny"
        if tiny_meta is not None and "rel_l2" in tiny_meta:
            out["tiny_rel_l2"] = tiny_meta["rel_l2"]
    if quantize_vae:
        # fidelity of the int8 decoder on the same latents, vs bf16 decode
        ref = np.asarray(jax.jit(lambda vp, zz: _decode(vp, zz, None))(
            vparams, z * 0.18215), np.float32)
        got = np.asarray(decode_only(vparams, z * 0.18215), np.float32)
        out["vae_q_rel_l2"] = float(np.linalg.norm(got - ref)
                                    / np.linalg.norm(ref))
    if quantize is not None:
        # fidelity of the quantized few-step UNet trajectory: fixed-key
        # images vs the bf16 trajectory (same bf16 decode on both sides)
        def make_gen(q):  # q is trace-time (quant.override is contextual)
            @jax.jit
            def gen(uparams, vparams, cond, key):
                def raw(zz, tt, emb):
                    with quant.override(q, scales=scales, t=tt):
                        return unet.apply({"params": uparams}, zz, tt, emb)
                latents = sample("ddim", with_cfg(raw, cond, None, None),
                                 schedule, (batch_size, latent, latent, 4),
                                 key, steps,
                                 spacing="trailing", steps_offset=0)
                return _decode(vparams, latents, None)
            return gen

        ref = np.asarray(make_gen(None)(uparams, vparams, cond, key),
                         np.float32)
        got = np.asarray(make_gen(quantize)(uparams, vparams, cond, key),
                         np.float32)
        out["quant_rel_l2"] = float(np.linalg.norm(got - ref)
                                    / np.linalg.norm(ref))
    return out


def bench_classifier_train(batch_size: int = 16, image_size: int = 224,
                           repeats: int = 3, chain: int = 10) -> dict:
    """Steady-state training throughput: `chain` back-to-back optimizer
    steps dispatched without host syncs (as the real epoch loop runs them),
    timed with ONE data-dependent scalar fetch at the end — per-step
    block_until_ready both under-measures (axon early return, see run_sync)
    and over-measures (adds ~29 ms tunnel round-trip per step that the
    training loop never pays)."""
    from polyp_tpu.configs import ClassificationConfig
    from polyp_tpu.train.classifier import create_classifier_state, train_step
    from polyp_tpu.utils.rng import key_for

    cfg = ClassificationConfig(image_size=image_size, batch_size=batch_size)
    state, _ = create_classifier_state(cfg, 3, jax.random.PRNGKey(0))
    images = jnp.zeros((batch_size, image_size, image_size, 3), jnp.uint8)
    labels = jnp.zeros((batch_size,), jnp.int32)

    def run_chain(state, tag: str) -> float:
        losses = []
        for i in range(chain):
            state, loss, _ = train_step(state, images, labels,
                                        key_for(0, tag, i), None, "bf16")
            losses.append(loss)
        # scalar fetch depending on every step (losses + final params)
        total = float(jax.device_get(sum(losses)))
        assert np.isfinite(total), "non-finite training loss"
        return total

    run_chain(state, "warmup")  # compile + warmup
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        run_chain(state, f"rep{r}")
        times.append((time.perf_counter() - t0) / chain)
    return {"train_images_per_sec": batch_size / min(times)}


def bench_sd_lora_train(batch_size: int = 8, image_size: int = 256,
                        repeats: int = 3, chain: int = 5) -> dict:
    """Flagship training-path throughput: the full SD-v1-4 LoRA fine-tune
    step (frozen VAE encode + frozen CLIP text encode + 860M-UNet fwd/bwd
    with rank-8 adapters on q/k/v/out + optimizer update) at the
    reference's pretrained-path config (256px, batch 8 —
    reference train_with_lora_per_class.py:295-332). Chained-step timing
    with one data-dependent scalar fetch, as bench_classifier_train."""
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
    latent = image_size // 8
    unet_params = jax.jit(unet.init)(
        {"params": k}, jnp.zeros((1, latent, latent, 4), dtype),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768), dtype))["params"]
    vae_params = jax.jit(vae.init)(
        {"params": k}, jnp.zeros((1, image_size, image_size, 3), dtype), k)
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
    cfg = DiffusionConfig(image_size=image_size,
                          train_batch_size=batch_size).with_schedule(100)
    sched = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)
    lcfg = LoRAConfig(rank=8, alpha=8.0, dropout=0.0)
    adapter = init_lora(unet_params, lcfg, jax.random.PRNGKey(1))
    state = create_sd_train_state(cfg, init_trainable(adapter))
    images = jnp.zeros((batch_size, image_size, image_size, 3), jnp.uint8)
    ids = jnp.zeros((1, 77), jnp.int32)
    none_ids = jnp.zeros((1,), jnp.int32)

    def run_chain(state, base: int) -> tuple:
        losses = []
        for i in range(chain):
            state, loss = sd_lora_train_step(
                state, frozen, sched, images, ids, none_ids,
                jax.random.PRNGKey(base + i), lcfg)
            losses.append(loss)
        total = float(jax.device_get(sum(losses)))
        assert np.isfinite(total), "non-finite SD LoRA training loss"
        return state

    t0 = time.perf_counter()
    state = run_chain(state, 100)  # compile + warmup
    compile_s = time.perf_counter() - t0
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        state = run_chain(state, 1000 * (r + 1))
        times.append((time.perf_counter() - t0) / chain)
    return {"sd_lora_train_images_per_sec": batch_size / min(times),
            "compile_sec": compile_s}


def bench_distill_train(batch_size: int = 8, image_size: int = 256,
                        repeats: int = 2, chain: int = 3,
                        optimizer: str = "adamw",
                        student_steps: int = 20) -> dict:
    """Distill-phase training throughput at FULL SD size (VERDICT r4 weak
    #4: the cost of producing a few-step student was unpriced): one step =
    teacher 2-substep CFG targets (2 forwards at 2x batch, guidance
    folding) + student fwd/bwd + optimizer update — exactly
    train/distill.make_distill_step as polyp-distill-sd drives it for the
    40->20 phase.

    Memory note: distillation trains ALL 860M UNet params (not adapters),
    so resident state = student params + teacher params + grads + moments.
    With AdamW's two fp32 moments that is ~17 GB — over one v5e's 16 GB —
    so the harness tries the requested optimizer and falls back
    adamw -> adafactor (factored second moment, the standard big-model
    choice) -> half batch, reporting what actually fit. The student apply
    is rematerialized (jax.checkpoint) either way."""
    import optax

    from polyp_tpu.diffusion import DiffusionSchedule
    from polyp_tpu.models import sd14_unet
    from polyp_tpu.train.distill import (DistillState, distill_grid,
                                         make_distill_step)

    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    unet = sd14_unet(dtype=dtype)
    latent = image_size // 8
    params = jax.jit(unet.init)(
        {"params": k}, jnp.zeros((1, latent, latent, 4), dtype),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768), dtype))["params"]
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 768), dtype)
    uncond = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), dtype)
    guidance_scale = 7.5
    sched = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)
    grid = distill_grid(sched, student_steps)

    unet_apply = jax.checkpoint(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c))

    def _ctx(x, e):
        return jnp.broadcast_to(e, (x.shape[0],) + e.shape[-2:])

    def teacher_apply(p, x, t):
        x2 = jnp.concatenate([x, x], 0)
        t2 = jnp.concatenate([t, t], 0)
        e2 = jnp.concatenate([_ctx(x, uncond), _ctx(x, cond)], 0)
        out_u, out_c = jnp.split(unet_apply(p, x2, t2, e2), 2, 0)
        return out_u + guidance_scale * (out_c - out_u)

    def student_apply(p, x, t):
        return unet_apply(p, x, t, _ctx(x, cond))

    def attempt(opt_name: str, bs: int) -> dict:
        if opt_name == "adamw":
            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adamw(1e-4, weight_decay=1e-2))
        else:
            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adafactor(1e-4))
        # copy the student start: the step donates state.params and the
        # teacher argument aliases the same buffers (warm start)
        state = DistillState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree_util.tree_map(jnp.array, params),
            opt_state=tx.init(params), tx=tx)
        step = make_distill_step(student_apply, teacher_apply, sched,
                                 sched, grid)
        x0 = jax.random.normal(jax.random.PRNGKey(3),
                               (bs, latent, latent, 4), jnp.float32)

        def run_chain(state, base: int):
            losses = []
            for i in range(chain):
                state, loss = step(state, params, x0,
                                   jax.random.PRNGKey(base + i))
                losses.append(loss)
            total = float(jax.device_get(sum(losses)))
            assert np.isfinite(total), "non-finite distill loss"
            return state

        t0 = time.perf_counter()
        state = run_chain(state, 100)
        compile_s = time.perf_counter() - t0
        times = []
        for r in range(repeats):
            t0 = time.perf_counter()
            state = run_chain(state, 1000 * (r + 1))
            times.append((time.perf_counter() - t0) / chain)
        sec = min(times)
        return {"distill_train_images_per_sec": bs / sec,
                "sec_per_step": sec, "batch": bs, "optimizer": opt_name,
                "compile_sec": compile_s,
                # the product decision the number prices: a 2000-step
                # halving phase (cli/distill_sd.py default) at this rate
                "minutes_per_2000step_phase": round(2000 * sec / 60, 1)}

    attempts = []
    for opt_name, bs in [(optimizer, batch_size),
                         ("adafactor", batch_size),
                         ("adafactor", max(batch_size // 2, 1)),
                         ("adafactor", max(batch_size // 4, 1))]:
        if (opt_name, bs) in [(a["optimizer"], a["batch"])
                              for a in attempts]:
            continue
        try:
            out = attempt(opt_name, bs)
            out["fallbacks"] = [f"{a['optimizer']}@{a['batch']}: OOM"
                                for a in attempts]
            return out
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) and \
                    "Out of memory" not in str(e):
                raise
            attempts.append({"optimizer": opt_name, "batch": bs})
            jax.clear_caches()
    raise RuntimeError(f"distill step OOM at every config: {attempts}")


def _arm_watchdog(seconds: int):
    """The tunneled TPU backend can wedge silently (backend init or a
    remote-compile HTTP call hangs at zero CPU, indefinitely). A hung bench
    records nothing; this daemon thread instead prints a parseable JSON
    line and exits once `seconds` pass without main() finishing. The
    deadline covers EVERY phase (headline + companion w8a8 + --train
    flags — any of them can hit the wedge); if the headline was already
    measured when a later phase hangs, that partial result is printed with
    a `watchdog_error` field rather than thrown away. Generous default:
    a cold 860M-UNet compile takes ~250 s on this host.

    Returns (disarm_event, partial): set() the event when done; update
    `partial["out"]` with the best output-so-far dict as phases finish."""
    import os
    import threading

    done = threading.Event()
    partial: dict = {"out": None}

    def fire():
        if not done.wait(seconds):
            err = (f"phase exceeded the {seconds}s watchdog — TPU backend "
                   "unresponsive (tunnel wedge); rerun")
            out = partial["out"]
            if out is not None:
                print(json.dumps({**out, "watchdog_error": err}), flush=True)
            else:
                print(json.dumps({"metric": "bench watchdog", "value": None,
                                  "unit": "error", "error": err}), flush=True)
            os._exit(2)

    threading.Thread(target=fire, daemon=True).start()
    return done, partial


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--sampler", default="ddim")
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--train-diffusion", action="store_true")
    parser.add_argument("--quantize", default=None,
                        choices=["w8a8", "w8a8_static", "promoted"],
                        help="W8A8 UNet sampling (ops/quant.py); default "
                             "off. 'promoted' = the vendored gate-passing "
                             "config (quant_gate.json) — distilled-aware, "
                             "like every other CLI surface")
    parser.add_argument("--quant-fp-head", type=int, default=0,
                        help="with --quantize: FIRST N sampling steps full "
                             "precision (hybrid-precision trajectory; a "
                             "small bf16 head reproduces the bf16 images "
                             "almost exactly at ~int8 throughput)")
    parser.add_argument("--quant-fp-tail", type=int, default=0,
                        help="with --quantize: final N sampling steps full "
                             "precision (hybrid-precision trajectory)")
    parser.add_argument("--distilled", type=int, default=0, metavar="STEPS",
                        help="standalone distilled-student bench: "
                             "folded-guidance (cond-only, 1x batch) "
                             "STEPS-step trailing DDIM + VAE decode "
                             "(bench_distilled; composes with --quantize)")
    parser.add_argument("--quantize-vae", action="store_true",
                        help="with --distilled: w8a8 the VAE decoder too "
                             "(the few-step Amdahl term; reports int8 "
                             "decode fidelity as vae_q_rel_l2)")
    parser.add_argument("--tiny-decoder", action="store_true",
                        help="with --distilled: decode through the "
                             "distilled TinyDecoder (~30x fewer decode "
                             "FLOPs — models/tiny_decoder.py); throughput "
                             "is weight-independent, fidelity rides from "
                             "--tiny-decoder-dir's trained meta")
    parser.add_argument("--tiny-decoder-dir", default=None,
                        help="polyp-distill-vae output dir (trained tiny "
                             "decoder); default: random init, throughput "
                             "identical")
    parser.add_argument("--watchdog", type=int, default=3600,
                        help="fail loudly if the run has not finished "
                             "within N seconds total (0 disables)")
    args = parser.parse_args()

    if args.quantize == "promoted":
        # expand the alias like every other CLI surface — distilled-aware:
        # --distilled resolves to the few-step verdict (pure int8), the
        # full-trajectory path to the fp-head hybrid (raises if demoted)
        from polyp_tpu.ops.quant import resolve_quantize_arg
        args.quantize, args.quant_fp_head, args.quant_fp_tail = (
            resolve_quantize_arg("promoted", args.quant_fp_head,
                                 args.quant_fp_tail,
                                 distilled=bool(args.distilled)))

    if args.watchdog:
        watchdog, partial = _arm_watchdog(args.watchdog)
    else:
        watchdog, partial = None, {"out": None}

    if args.distilled:
        # refuse silently-ignored flag combinations loudly: the few-step
        # folded bench has no hybrid-precision split (the distilled gate
        # verdict is pure int8 — quant_gate.json promoted_distilled), and
        # the train benches live on the default run
        if args.quant_fp_head or args.quant_fp_tail:
            raise SystemExit("--distilled does not support --quant-fp-head/"
                             "--quant-fp-tail (few-step folded sampling has "
                             "no hybrid-precision split; the measured "
                             "distilled verdict is pure w8a8_static)")
        if args.train or args.train_diffusion:
            raise SystemExit("--distilled is a standalone bench; run "
                             "--train/--train-diffusion without it")
        if args.tiny_decoder and args.quantize_vae:
            raise SystemExit("--tiny-decoder and --quantize-vae are "
                             "alternative decode levers; pick one")
        d = bench_distilled(args.batch, args.image_size, args.distilled,
                            args.quick, quantize=args.quantize,
                            quantize_vae=args.quantize_vae,
                            tiny_decoder=args.tiny_decoder,
                            tiny_decoder_dir=args.tiny_decoder_dir)
        out = {
            "metric": f"{args.image_size}px distilled samples/sec/chip "
                      f"({args.distilled}-step folded-CFG DDIM"
                      + (f", {args.quantize}" if args.quantize else "")
                      + (", w8a8-vae" if args.quantize_vae else "")
                      + (", tiny-decoder" if args.tiny_decoder else "")
                      + ")",
            "value": round(d["samples_per_sec"], 4),
            "unit": "samples/sec/chip",
            "vs_baseline": round(d["samples_per_sec"]
                                 / REFERENCE_CPU_SAMPLES_PER_SEC, 2),
            "baseline_threads": REFERENCE_CPU_THREADS,
            "distilled_steps": d["steps"],
            "unet_scan_sec": round(d["unet_scan_sec"], 4),
            "vae_decode_sec": round(d["vae_decode_sec"], 4),
            "vae_share": round(d["vae_share"], 4),
        }
        if "vae_q_rel_l2" in d:
            out["vae_q_rel_l2"] = round(d["vae_q_rel_l2"], 4)
        if "quant_rel_l2" in d:
            out["quant_rel_l2"] = round(d["quant_rel_l2"], 4)
        if "tiny_rel_l2" in d:
            out["tiny_rel_l2"] = round(d["tiny_rel_l2"], 4)
        if watchdog is not None:
            watchdog.set()
        print(json.dumps(out))
        return

    def _line(value: float, metric: str) -> dict:
        return {
            "metric": metric,
            "value": round(value, 4),
            "unit": "samples/sec/chip",
            "vs_baseline": round(value / REFERENCE_CPU_SAMPLES_PER_SEC, 2),
            "baseline_threads": REFERENCE_CPU_THREADS,
            # lower bound: baseline scaled with perfect linearity to a
            # REFERENCE_NORMALIZED_CORES-core host (see constant above)
            f"vs_baseline_{REFERENCE_NORMALIZED_CORES}core_bound": round(
                value / (REFERENCE_CPU_SAMPLES_PER_SEC
                         * REFERENCE_NORMALIZED_CORES
                         / REFERENCE_CPU_THREADS), 2),
        }

    promo = (_promoted_quant()
             if args.quantize is None and not args.quick else None)
    if promo is not None:
        # headline = the gate-passing promoted quant config
        # (polyp_tpu/ops/quant_gate.json: fixed-seed image rel L2 vs bf16 beat
        # GATE_REL_L2 on the sensitivity sweep — see BASELINE.md round 4);
        # bf16 at the requested batch rides as the companion number. The
        # verdict's measured batch applies only when the user kept the
        # default — an explicit --batch is never silently overridden.
        default_batch = parser.get_default("batch")
        promo_batch = (int(promo.get("batch", args.batch))
                       if args.batch == default_batch else args.batch)
        q = bench_sampling(promo_batch,
                           args.image_size, args.steps, args.sampler,
                           args.quick, quantize=promo["mode"],
                           quant_fp_head=int(promo.get("quant_fp_head", 0)),
                           quant_fp_tail=int(promo.get("quant_fp_tail", 0)))
        ptail = (f"+fp_head{promo['quant_fp_head']}"
                 if promo.get("quant_fp_head") else "")
        out = _line(q["samples_per_sec"],
                    f"{args.image_size}px diffusion samples/sec/chip "
                    f"({args.steps}-step {args.sampler.upper()}, "
                    f"{promo['mode']}{ptail} — gate-passing, "
                    f"rel_l2 {promo.get('rel_l2_25step')})")
        out["quant_batch"] = q["batch_size"]
        partial["out"] = dict(out)
        try:
            b = bench_sampling(args.batch, args.image_size, args.steps,
                               args.sampler, args.quick)
            out["bf16_value"] = round(b["samples_per_sec"], 4)
            out["bf16_batch"] = b["batch_size"]
        except Exception as e:  # never sink the headline metric
            out["bf16_error"] = f"{type(e).__name__}: {e}"[:200]
        partial["out"] = dict(out)
    else:
        result = bench_sampling(args.batch, args.image_size, args.steps,
                                args.sampler, args.quick,
                                quantize=args.quantize,
                                quant_fp_head=args.quant_fp_head,
                                quant_fp_tail=args.quant_fp_tail)
        tail = ""
        if args.quantize and args.quant_fp_head:
            tail += f"+fp_head{args.quant_fp_head}"
        if args.quantize and args.quant_fp_tail:
            tail += f"+fp_tail{args.quant_fp_tail}"
        out = _line(result["samples_per_sec"],
                    f"{args.image_size}px diffusion samples/sec/chip "
                    f"({args.steps}-step {args.sampler.upper()}"
                    + (f", {args.quantize}{tail}" if args.quantize else "")
                    + ")")
        partial["out"] = dict(out)  # headline measured — a wedge keeps it
        if args.quantize is None and not args.quick:
            # no gate-passing quant config: bf16 is the parsed headline,
            # best opt-in quant config (batch 16, round-2 sweep) rides as
            # the companion.
            try:
                q = bench_sampling(max(args.batch, 16), args.image_size,
                                   args.steps, args.sampler, args.quick,
                                   quantize="w8a8_static")
                out["w8a8_static_value"] = round(q["samples_per_sec"], 4)
                out["w8a8_batch"] = q["batch_size"]
            except Exception as e:  # never sink the headline metric
                out["w8a8_static_error"] = f"{type(e).__name__}: {e}"[:200]
            partial["out"] = dict(out)
    if args.quantize is None and not args.quick:
        # distilled-student companion: the post-roofline throughput lever
        # (folded-CFG few-step DDIM — train/distill.py). Measured batch
        # sweet spots (BASELINE.md round-4 sweep): 8-step peaks at batch 16
        # (54.8 > 47.6 at batch 8), 4-step at batch 32 (86.2 > 80.3 at 16)
        # — fewer steps per launch leave more room before the intra-op
        # bound, so the optimum grows as steps shrink. When a gate-passing
        # distilled quant verdict exists (quant_gate.json
        # promoted_distilled — pure w8a8_static, rel L2 0.027/0.034, the
        # short trajectory doesn't accumulate int8 drift), the companions
        # run it and carry the fidelity numbers on the line.
        try:
            dq = None
            try:
                from polyp_tpu.ops.quant import promoted_config
                dq = promoted_config(distilled=True)
            except Exception:
                pass
            mode = dq["mode"] if dq else None
            d8 = bench_distilled(16, args.image_size, 8, args.quick,
                                 quantize=mode)
            out["distilled_value"] = round(d8["samples_per_sec"], 4)
            out["distilled_steps"] = 8
            out["distilled_batch"] = d8["batch_size"]
            out["distilled_vae_share"] = round(d8["vae_share"], 4)
            if mode:
                out["distilled_quantize"] = mode
                out["distilled_quant_rel_l2"] = round(d8["quant_rel_l2"], 4)
            d4 = bench_distilled(32, args.image_size, 4, args.quick,
                                 quantize=mode)
            out["distilled_4step_value"] = round(d4["samples_per_sec"], 4)
            out["distilled_4step_batch"] = d4["batch_size"]
            out["distilled_4step_vae_share"] = round(d4["vae_share"], 4)
            if mode:
                out["distilled_4step_quant_rel_l2"] = round(
                    d4["quant_rel_l2"], 4)
        except Exception as e:
            out["distilled_error"] = f"{type(e).__name__}: {e}"[:200]
        partial["out"] = dict(out)
        # tiny-decoder companions: the round-5 attack on the VAE-decode
        # Amdahl wall (42-47% of a few-step sample) — same operating
        # points with the full decode swapped for the distilled
        # TinyDecoder (models/tiny_decoder.py). Throughput is
        # weight-independent; the trained artifact's rel_l2 is recorded by
        # polyp-distill-vae (BASELINE.md round 5).
        try:
            import os as _os
            tdir = ("./models/tiny_decoder"
                    if _os.path.isdir("./models/tiny_decoder/params")
                    else None)
            dt8 = bench_distilled(16, args.image_size, 8, args.quick,
                                  quantize=mode, tiny_decoder=True,
                                  tiny_decoder_dir=tdir)
            out["distilled_tinydec_value"] = round(
                dt8["samples_per_sec"], 4)
            out["distilled_tinydec_vae_share"] = round(
                dt8["vae_share"], 4)
            dt4 = bench_distilled(32, args.image_size, 4, args.quick,
                                  quantize=mode, tiny_decoder=True,
                                  tiny_decoder_dir=tdir)
            out["distilled_4step_tinydec_value"] = round(
                dt4["samples_per_sec"], 4)
            out["distilled_4step_tinydec_vae_share"] = round(
                dt4["vae_share"], 4)
            if "tiny_rel_l2" in dt4:
                out["tinydec_rel_l2"] = round(dt4["tiny_rel_l2"], 4)
        except Exception as e:
            out["tinydec_error"] = f"{type(e).__name__}: {e}"[:200]
        partial["out"] = dict(out)
    if args.train:
        out["classifier_train_images_per_sec"] = round(
            bench_classifier_train()["train_images_per_sec"], 2)
        partial["out"] = dict(out)
    if args.train_diffusion:
        out["sd_lora_train_images_per_sec"] = round(
            bench_sd_lora_train()["sd_lora_train_images_per_sec"], 2)
    if watchdog is not None:
        watchdog.set()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
