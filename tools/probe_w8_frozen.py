"""Probe: weight-only int8 FROZEN base params in the SD LoRA train step.

The flagship train step is measured AT its ~54 GB/step memory wall
(tools/roofline.py --train: 101% of ceiling), and most of that wall is
frozen base-weight traffic (the 860M-param UNet read once per fwd and once
per bwd while only rank-8 adapters train). The only single-chip lever the
roofline leaves is shrinking that traffic: store the frozen base weights
as per-channel int8 (+ fp scales, quantized ONCE outside the step) and
dequantize in-graph at use — adapter stays bf16, grads flow through the
(constant) dequant + BA add exactly as before, so the optimization is
numerically a weight-rounding of the frozen base only.

Whether this PAYS depends on XLA fusing the dequant into the consuming
conv/matmul read; if it materializes a bf16 copy instead, traffic goes UP
(int8 read + bf16 write + bf16 read). That is exactly what this probe
measures — an honest A/B, negative result acceptable (VERDICT r4 #8):

    python tools/probe_w8_frozen.py            # chip A/B, one JSON line
    JAX_PLATFORMS=cpu python tools/probe_w8_frozen.py --tiny   # smoke

Reports bf16 vs w8-frozen images/sec, the rounding's loss perturbation,
and the verdict.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def quantize_frozen(params, min_size: int = 4096):
    """Per-output-channel symmetric int8 of every large float leaf
    (kernels); small leaves (biases, norms, embeddings under min_size)
    stay bf16 — their traffic is noise and their precision matters."""

    def q(leaf):
        arr = np.asarray(leaf, np.float32)
        if arr.size < min_size or arr.ndim < 2:
            return {"w": jnp.asarray(arr, jnp.bfloat16)}
        flat = arr.reshape(-1, arr.shape[-1])  # [.., out_channels]
        scale = np.abs(flat).max(axis=0) / 127.0 + 1e-12
        q8 = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        return {"w8": jnp.asarray(q8), "scale": jnp.asarray(scale,
                                                           jnp.float32)}

    return jax.tree_util.tree_map(q, params)


def dequantize(qparams):
    """In-graph dequant — the per-step cost whose fusability is the whole
    question."""

    def dq(leaf):
        if "w8" in leaf:
            return (leaf["w8"].astype(jnp.bfloat16)
                    * leaf["scale"].astype(jnp.bfloat16))
        return leaf["w"]

    return jax.tree_util.tree_map(dq, qparams,
                                  is_leaf=lambda x: isinstance(x, dict)
                                  and ("w8" in x or "w" in x))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args(argv)

    from polyp_tpu.configs import DiffusionConfig
    from polyp_tpu.diffusion import DiffusionSchedule
    from polyp_tpu.lora import LoRAConfig, init_lora
    from polyp_tpu.models import (SD14_TEXT_CONFIG, TINY_TEXT_CONFIG,
                                  AutoencoderKL, CLIPTextModel, sd14_unet,
                                  tiny_condition_unet, tiny_vae)

    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    if args.tiny:
        unet, vae = tiny_condition_unet(dtype=dtype), tiny_vae(dtype=dtype)
        text = CLIPTextModel(TINY_TEXT_CONFIG, dtype=dtype)
        ctx_dim, tok_len = TINY_TEXT_CONFIG.width, 16
        args.image_size = min(args.image_size, 32)
    else:
        unet, vae = sd14_unet(dtype=dtype), AutoencoderKL(dtype=dtype)
        text = CLIPTextModel(SD14_TEXT_CONFIG, dtype=dtype)
        ctx_dim, tok_len = 768, 77
    latent = args.image_size // 8
    unet_params = jax.jit(unet.init)(
        {"params": k}, jnp.zeros((1, latent, latent, 4), dtype),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, tok_len, ctx_dim), dtype))["params"]
    vae_params = jax.jit(vae.init)(
        {"params": k},
        jnp.zeros((1, args.image_size, args.image_size, 3), dtype), k)
    text_params = jax.jit(text.init)(
        {"params": k}, jnp.zeros((1, tok_len), jnp.int32))["params"]

    cfg = DiffusionConfig(image_size=args.image_size,
                          train_batch_size=args.batch).with_schedule(100)
    sched = DiffusionSchedule.create(1000, "scaled_linear", 0.00085, 0.012)
    lcfg = LoRAConfig(rank=8, alpha=8.0, dropout=0.0)
    images = jnp.zeros((args.batch, args.image_size, args.image_size, 3),
                       jnp.uint8)
    ids = jnp.zeros((1, tok_len), jnp.int32)
    nids = jnp.zeros((1,), jnp.int32)

    from functools import partial

    import optax

    from polyp_tpu.diffusion import epsilon_mse_loss
    from polyp_tpu.data.transforms import augment_diffusion_batch
    from polyp_tpu.models.vae import SD_VAE_SCALING, DiagonalGaussian
    from polyp_tpu.lora import merge_lora

    vae_vars = vae_params

    # The step mirrors train/sd_finetune.sd_lora_train_step's structure
    # (frozen encode -> noise -> LoRA merge -> UNet -> MSE -> AdamW) with
    # one change: when the frozen base rides as int8, it is DEQUANTIZED
    # IN-GRAPH before the LoRA merge — the merge needs float weights, so
    # the dequant sits between the int8 HBM read and the conv. Whether
    # XLA fuses that chain or materializes a bf16 copy is the measured
    # question.
    sched_local = sched
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-4, weight_decay=1e-2))

    # frozen VAE/CLIP params ride as ARGUMENTS — closing over them bakes
    # 150M+ weights into the HLO as constants (compile-payload explosion;
    # the pipeline.py closure trap, re-hit here as an HTTP 413 from the
    # tunneled remote-compile service)
    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("quant",))
    def step(trainable, opt_state, uparams, vparams, tparams, images_u8,
             key, quant):
        k_aug, k_lat, k_noise, k_t = jax.random.split(key, 4)
        x0 = augment_diffusion_batch(images_u8, k_aug, train=True)
        moments = vae.apply(vparams, x0, method=vae.encode_moments)
        latents = DiagonalGaussian(moments).sample(k_lat) * SD_VAE_SCALING
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        n = x0.shape[0]
        timesteps = jax.random.randint(k_t, (n,), 0, 1000)
        noisy = sched_local.add_noise(latents, noise, timesteps)
        hidden = jax.lax.stop_gradient(
            text.apply({"params": tparams},
                       jnp.zeros((n, tok_len), jnp.int32)))

        def loss_fn(trainable):
            base = dequantize(uparams) if quant else uparams
            merged = merge_lora(jax.lax.stop_gradient(base)
                                if not quant else base,
                                trainable, lcfg)
            pred = unet.apply({"params": merged}, noisy, timesteps, hidden)
            return epsilon_mse_loss(sched_local, pred, latents, noise,
                                    timesteps)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), new_opt, loss

    qparams = quantize_frozen(unet_params)

    def measure(uparams, quant, tag):
        adapter = init_lora(unet_params, lcfg, jax.random.PRNGKey(1))
        opt_state = tx.init(adapter)

        def chain_run(adapter, opt_state, base):
            losses = []
            for i in range(args.chain):
                adapter, opt_state, loss = step(
                    adapter, opt_state, uparams, vae_vars, text_params,
                    images, jax.random.PRNGKey(base + i), quant)
                losses.append(loss)
            tot = float(jax.device_get(sum(losses)))
            assert np.isfinite(tot), f"{tag}: non-finite loss"
            return adapter, opt_state, tot

        adapter, opt_state, first = chain_run(adapter, opt_state, 100)
        times = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            adapter, opt_state, _ = chain_run(adapter, opt_state,
                                              1000 * (r + 1))
            times.append((time.perf_counter() - t0) / args.chain)
        return args.batch / min(times), first

    bf16_ips, bf16_loss = measure(unet_params, False, "bf16")
    w8_ips, w8_loss = measure(qparams, True, "w8_frozen")
    speedup = w8_ips / bf16_ips
    print(json.dumps({
        "probe": "w8_frozen_base_lora_train",
        "batch": args.batch, "image_size": args.image_size,
        "tiny": args.tiny,
        "bf16_images_per_sec": round(bf16_ips, 2),
        "w8_frozen_images_per_sec": round(w8_ips, 2),
        "speedup": round(speedup, 3),
        "loss_rel_perturbation": round(
            abs(w8_loss - bf16_loss) / max(abs(bf16_loss), 1e-9), 5),
        "verdict": ("POSITIVE - wire as opt-in flag" if speedup > 1.05
                    else "NEGATIVE - dequant not fused / traffic not saved"),
    }))


if __name__ == "__main__":
    main()
