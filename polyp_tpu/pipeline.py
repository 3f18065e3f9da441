"""Generation pipelines: quota-driven batched sampling with deterministic
seeds, PNG persistence, and idempotent top-up resume.

Replaces the reference's pipeline objects and their Python sampling loops:
* DDPMPipeline quota loop (train_from_scratch.py:39-66) — pixel space;
* StableDiffusionPipeline 25-step CFG loop (train_with_lora_per_class.py:59-88)
  — latent space with VAE decode;
* the filesystem-state resume that tops up only missing samples
  (train_with_lora_per_class.py:264-290).

Determinism contract: batch `i` uses PRNGKey(seed + i)
(`torch.Generator('cpu').manual_seed(config.seed + batch_id)` parity), so a
top-up resumes at batch `existing // eval_batch` and regenerates
byte-identical batches. (The reference's own top-up restarts batch ids at 0
and saves over files 1..k — an overwrite bug; this implementation appends
the missing tail instead, keeping the seed↔file mapping stable.)
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from polyp_tpu.data.native import encode_png_or_pil
from polyp_tpu.diffusion import DiffusionSchedule, sample, with_cfg
from polyp_tpu.ops import quant
from polyp_tpu.models.vae import SD_VAE_SCALING
from polyp_tpu.utils.rng import batch_seed_key

# fn(batch_size, key) -> float images in [-1, 1], NHWC
BatchSampler = Callable[[int, jax.Array], jax.Array]


def _mesh_trace_scope(mesh):
    """Trace-time scope for a sampler jitted over `mesh`: >1 device means
    GSPMD partitions the program, so Pallas kernel dispatch is disabled
    (ops/dispatch.pallas_ok — no partitioning rule exists for the kernels
    and no multi-chip hardware exists here to validate one). Single-device
    and mesh-less samplers keep every kernel."""
    from polyp_tpu.ops import dispatch
    return dispatch.mesh_trace_scope(mesh)


def _padded_batch(batch_size: int, mesh) -> int:
    """Round a (possibly ragged quota-tail) batch up to a multiple of the
    mesh's 'data' axis so the sharded sampler keeps even per-device shards;
    callers slice the result back to `batch_size`."""
    if mesh is None or "data" not in mesh.axis_names:
        return batch_size
    d = mesh.shape["data"]
    return -(-batch_size // d) * d


def _precision_split(num_steps: int, quantize: str | None,
                     fp_head: int = 0, fp_tail: int = 0
                     ) -> tuple[str | None, tuple[int, int] | None]:
    """Resolve the hybrid-precision trajectory knobs.

    `fp_head` / `fp_tail` = number of FIRST / FINAL inference steps forced
    full precision while the rest run quantized. On a deterministic
    sampler the EARLY evals set the whole trajectory — int8 error there
    diverges the sample from its bf16 twin — while late-step error only
    perturbs local detail; a small bf16 head therefore makes the quantized
    run reproduce the full-precision output almost exactly at ~the full
    int8 throughput (measured sweep: tools/quant_sensitivity.py
    --fp-split; BASELINE.md). The tail knob is kept for the symmetric
    experiment and for detail-sensitive workloads.

    Returns (effective_quantize_mode, split): split = (fp_head, fp_tail)
    step counts for `_precision_segments`, or None for no splitting (pure
    mode)."""
    if quantize is None or (fp_head <= 0 and fp_tail <= 0):
        return quantize, None
    if fp_head + fp_tail >= num_steps:
        return None, None  # every step full precision — drop the mode
    return quantize, (max(fp_head, 0), max(fp_tail, 0))


def _precision_segments(q_fn, fp_fn, num_steps: int,
                        split: tuple[int, int]):
    """Build the sampler segment list for a precision split: fp head,
    quantized middle, fp tail. Samplers run segments as consecutive scans
    with continued step indices — bit-identical math to one scan, and each
    segment's loop-invariant work (the in-graph int8 weight quantization)
    hoists out of its own scan, which lax.cond inside one scan body
    defeats (diffusion/samplers._as_segments)."""
    head, tail = split
    return [(head, fp_fn), (num_steps - head - tail, q_fn), (tail, fp_fn)]


def to_uint8(images: jax.Array) -> np.ndarray:
    """[-1,1] float NHWC → uint8 (diffusers numpy_to_pil postprocess parity)."""
    arr = np.asarray(jnp.clip(images / 2 + 0.5, 0.0, 1.0))
    return (arr * 255).round().astype(np.uint8)


class PixelDiffusionSampler:
    """DDPMPipeline equivalent over a pixel-space UNet."""

    def __init__(self, model, params, schedule: DiffusionSchedule,
                 image_size: int, sampler: str = "ddpm",
                 num_steps: int | None = None,
                 text_embeddings: jax.Array | None = None,
                 mesh=None, quantize: str | None = None,
                 quant_fp_head: int = 0, quant_fp_tail: int = 0,
                 sampler_kwargs: dict | None = None):
        self.model = model
        # extra sampler arguments (e.g. spacing="trailing", steps_offset=0
        # for progressively-distilled students — train/distill.py)
        self.sampler_kwargs = dict(sampler_kwargs or {})
        self.quantize, self._split = _precision_split(
            num_steps or schedule.num_train_timesteps, quantize,
            quant_fp_head, quant_fp_tail)
        quantize = self.quantize
        self.params = params
        self.schedule = schedule
        self.image_size = image_size
        self.sampler = sampler
        self.num_steps = num_steps or schedule.num_train_timesteps
        self.text_embeddings = text_embeddings
        self.mesh = mesh
        self._quant_scales = None
        if quantize == "w8a8_static":
            # one-time activation-scale calibration (diffusion/calibrate.py),
            # disk-cached per checkpoint fingerprint
            from polyp_tpu.diffusion.calibrate import ensure_scales
            self._quant_scales = ensure_scales(
                model, params, schedule,
                (2, image_size, image_size, model.out_channels),
                cond=text_embeddings,
                fingerprint_extras=(image_size,
                                    schedule.num_train_timesteps),
                mesh=mesh)

        # jitted with params as ARGUMENTS (closing over them would embed the
        # weights as HLO constants and blow up compile time); batch_size is
        # static so quota-tail batches compile once per distinct size.
        out_shardings = None
        if mesh is not None:
            # sampling fan-out over the mesh: images batch-sharded on 'data',
            # params replicated — each chip denoises its slice of the quota.
            from polyp_tpu.parallel import data_sharding, replicate_to
            self.params = replicate_to(self.params, mesh)
            if text_embeddings is not None:
                self.text_embeddings = replicate_to(text_embeddings, mesh)
            out_shardings = data_sharding(mesh, 4)
        self._generate = jax.jit(self._generate_impl,
                                 static_argnames=("batch_size",),
                                 out_shardings=out_shardings)

    def _generate_impl(self, params, text_embeddings, key, batch_size: int):
        shape = (batch_size, self.image_size, self.image_size,
                 self.model.out_channels)

        if text_embeddings is not None:
            ctx = jnp.broadcast_to(text_embeddings,
                                   (batch_size,) + text_embeddings.shape[-2:])

            def apply_fn(x, t, mode):
                with quant.override(mode, scales=self._quant_scales, t=t):
                    return self.model.apply({"params": params}, x, t, ctx)
        else:
            def apply_fn(x, t, mode):
                with quant.override(mode, scales=self._quant_scales, t=t):
                    return self.model.apply({"params": params}, x, t)

        def q_fn(x, t):
            return apply_fn(x, t, self.quantize)

        if self._split is None:
            model_fn = q_fn
        else:
            # hybrid-precision trajectory (_precision_split): quantized
            # UNet for the mid-trajectory steps, full precision for the
            # fp_head/fp_tail ends, as sampler scan segments.
            model_fn = _precision_segments(
                q_fn, lambda x, t: apply_fn(x, t, None),
                self.num_steps, self._split)

        with _mesh_trace_scope(self.mesh):
            return sample(self.sampler, model_fn, self.schedule, shape, key,
                          self.num_steps, **self.sampler_kwargs)

    def __call__(self, batch_size: int, key: jax.Array) -> jax.Array:
        bs = _padded_batch(batch_size, self.mesh)
        out = self._generate(self.params, self.text_embeddings, key,
                             batch_size=bs)
        return out[:batch_size]


class StableDiffusionSampler:
    """StableDiffusionPipeline equivalent: prompt → CLIP → CFG UNet sampling
    → VAE decode. `safety_checker=None` parity is implicit — there is none."""

    def __init__(self, unet, unet_params, vae, vae_params, text_model,
                 text_params, tokenizer, schedule: DiffusionSchedule,
                 image_size: int = 256, num_steps: int = 25,
                 guidance_scale: float = 7.5, sampler: str = "unipc",
                 mesh=None, quantize: str | None = None,
                 quant_fp_head: int = 0, quant_fp_tail: int = 0,
                 sampler_kwargs: dict | None = None,
                 decoder: tuple | None = None):
        self.unet = unet
        # optional distilled tiny decoder (module, params): replaces the
        # full AutoencoderKL decode — the few-step Amdahl lever
        # (models/tiny_decoder.py; ~30× fewer decode FLOPs). It consumes
        # SCALED latents directly (no /0.18215, no post_quant_conv).
        self.tiny_decoder = decoder[0] if decoder is not None else None
        self._tiny_decoder_params = decoder[1] if decoder is not None else None
        # extra sampler arguments (e.g. spacing="trailing", steps_offset=0
        # for progressively-distilled students — train/distill.py)
        self.sampler_kwargs = dict(sampler_kwargs or {})
        self.quantize, self._split = _precision_split(
            num_steps, quantize, quant_fp_head, quant_fp_tail)
        self._quant_scales: dict | None = None
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.mesh = mesh
        if mesh is not None:
            # quota generation fans out over the mesh: latents/images sharded
            # on 'data'; UNet params TP-sharded when a 'model' axis exists
            # (Megatron rules in parallel/sharding.py), else replicated.
            from polyp_tpu.parallel import replicate_to, shard_params
            self.unet_params = shard_params(unet_params, mesh)
            self.vae_params = replicate_to(vae_params, mesh)
            if self._tiny_decoder_params is not None:
                self._tiny_decoder_params = replicate_to(
                    self._tiny_decoder_params, mesh)
        self.text_model = text_model
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.schedule = schedule
        self.image_size = image_size
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        self.sampler = sampler
        self._encode_cache: dict[str, jax.Array] = {}
        self._batched_generate = None  # lazy jit for generate_batch

    @property
    def decode_params(self):
        """What rides the jit's decode-params slot: the tiny decoder's
        params when one is attached, else the full VAE's."""
        return (self._tiny_decoder_params
                if self.tiny_decoder is not None else self.vae_params)

    def encode_prompt(self, prompt: str) -> jax.Array:
        if prompt not in self._encode_cache:
            ids = jnp.asarray(self.tokenizer([prompt]))
            self._encode_cache[prompt] = self.text_model.apply(
                self.text_params, ids)
        return self._encode_cache[prompt]

    def register_prompt_embedding(self, prompt: str, emb: jax.Array) -> None:
        """Pin `prompt` to a precomputed [1, 77, D] cond embedding — e.g. a
        distilled student's training-time embedding whose DreamBooth token
        the base text stack cannot encode (cli/distill_sd.py)."""
        self._encode_cache[prompt] = jnp.asarray(emb)

    def _generate_impl(self, unet_params, vae_params, cond, uncond, key,
                       batch_size: int, init=None):
        latent_size = self.image_size // 8

        def apply_fn(x, t, emb, mode):
            # quantization scoped to the UNet only (trace-time context):
            # the VAE decode below stays full-precision.
            with quant.override(mode, scales=self._quant_scales, t=t):
                return self.unet.apply({"params": unet_params}, x, t, emb)

        def q_raw(x, t, emb):
            return apply_fn(x, t, emb, self.quantize)

        q_model = with_cfg(q_raw, cond, uncond, self.guidance_scale)
        if self._split is None:
            model_fn = q_model
        else:
            # hybrid-precision trajectory (see _precision_split): bf16 for
            # the fp_head/fp_tail end steps, int8 for the middle, as
            # sampler scan segments.
            fp_model = with_cfg(lambda x, t, emb: apply_fn(x, t, emb, None),
                                cond, uncond, self.guidance_scale)
            model_fn = _precision_segments(q_model, fp_model,
                                           self.num_steps, self._split)
        shape = (batch_size, latent_size, latent_size, 4)
        with _mesh_trace_scope(self.mesh):
            latents = sample(self.sampler, model_fn, self.schedule, shape,
                             key, self.num_steps, init=init,
                             **self.sampler_kwargs)
            if self.tiny_decoder is not None:
                # vae_params carries the tiny decoder's params here (see
                # decode_params) — it consumes scaled latents directly
                return self.tiny_decoder.apply({"params": vae_params},
                                               latents)
            return self.vae.apply(vae_params, latents / SD_VAE_SCALING,
                                  method=self.vae.decode)

    def _ensure_calibrated(self, cond: jax.Array, uncond: jax.Array) -> None:
        """One-time activation-scale calibration on this stack's own
        denoising trajectory (diffusion/calibrate.py); reused for every
        subsequent prompt — scales are activation-magnitude bounds, not
        prompt-specific content — and disk-cached per checkpoint
        fingerprint (the calibration compile costs minutes).
        self.unet_params are already mesh-sharded here; ensure_scales
        gates Pallas dispatch off for the multi-device trace."""
        if self.quantize != "w8a8_static" or self._quant_scales is not None:
            return
        from polyp_tpu.diffusion.calibrate import ensure_scales
        latent = self.image_size // 8
        self._quant_scales = ensure_scales(
            self.unet, self.unet_params, self.schedule,
            (2, latent, latent, 4), cond[:1], uncond[:1],
            num_steps=min(8, self.num_steps),
            guidance_scale=self.guidance_scale,
            fingerprint_extras=(self.image_size,
                                self.schedule.num_train_timesteps,
                                self.guidance_scale,
                                self.schedule.prediction_type),
            mesh=self.mesh)

    def _out_shardings(self):
        if self.mesh is None:
            return None
        from polyp_tpu.parallel import data_sharding
        return data_sharding(self.mesh, 4)

    def for_prompt(self, prompt: str) -> BatchSampler:
        cond = self.encode_prompt(prompt)
        uncond = self.encode_prompt("")
        self._ensure_calibrated(cond, uncond)
        # params as jit args (see PixelDiffusionSampler note)
        generate = jax.jit(self._generate_impl,
                           static_argnames=("batch_size",),
                           out_shardings=self._out_shardings())

        def sampler_fn(batch_size: int, key: jax.Array) -> jax.Array:
            bs = _padded_batch(batch_size, self.mesh)
            out = generate(self.unet_params, self.decode_params, cond, uncond,
                           key, batch_size=bs)
            return out[:batch_size]

        return sampler_fn

    def _generate_batched_impl(self, unet_params, vae_params, cond, uncond,
                               keys, batch_size: int):
        """Coalesced-batch inner fn: per-sample initial latents drawn from
        per-sample keys, so sample j's trajectory is a function of
        (prompt_j, key_j) alone under the deterministic samplers — the
        serving layer's coalescing contract (serve.py)."""
        latent_size = self.image_size // 8
        init = jax.vmap(
            lambda k: jax.random.normal(
                k, (latent_size, latent_size, 4), jnp.float32))(keys)
        # keys[0] seeds the (unused-by-deterministic-samplers) scan key
        # chain; the stochastic ddpm sampler would draw SHARED per-step
        # noise from it, so coalesced per-request determinism holds only
        # for ddim(η=0)/dpmpp_2m/unipc — serve.py documents this.
        return self._generate_impl(unet_params, vae_params, cond, uncond,
                                   keys[0], batch_size, init=init)

    def generate_batch(self, prompts, keys,
                       pad_to: int | None = None) -> jax.Array:
        """ONE device launch for len(prompts) samples, each with its own
        prompt and its own PRNG key (per-sample initial latents via the
        samplers' `init` hook). The cross-request micro-batching primitive
        behind serve.py's request coalescing: a sample's output is
        independent of what it is batched with, and padding to a fixed
        `pad_to` (e.g. the server's max_batch) makes every launch reuse one
        compiled executable regardless of how many requests coalesced.

        `keys`: stacked PRNG keys, one per prompt (shape [B, ...]).
        Returns float images in [-1, 1], NHWC, length len(prompts)."""
        n = len(prompts)
        if n == 0:
            raise ValueError("generate_batch needs at least one prompt")
        keys = jnp.stack([jnp.asarray(k) for k in keys]) \
            if isinstance(keys, (list, tuple)) else jnp.asarray(keys)
        if keys.shape[0] != n:
            raise ValueError(f"{n} prompts but {keys.shape[0]} keys")
        cond = jnp.concatenate([self.encode_prompt(p) for p in prompts],
                               axis=0)
        uncond = self.encode_prompt("")
        self._ensure_calibrated(cond, uncond)
        pad = _padded_batch(max(pad_to or n, n), self.mesh)
        if pad > n:
            # pad rows repeat the last sample (cond AND key) — sliced away
            # below; identical rows keep the executable's shapes fixed.
            reps = pad - n
            cond = jnp.concatenate(
                [cond, jnp.broadcast_to(cond[-1:], (reps,) + cond.shape[1:])])
            keys = jnp.concatenate(
                [keys, jnp.broadcast_to(keys[-1:], (reps,) + keys.shape[1:])])
        if self._batched_generate is None:
            self._batched_generate = jax.jit(
                self._generate_batched_impl,
                static_argnames=("batch_size",),
                out_shardings=self._out_shardings())
        out = self._batched_generate(self.unet_params, self.decode_params,
                                     cond, uncond, keys, batch_size=pad)
        return out[:n]


def generate_to_dir(sampler_fn: BatchSampler, num_images: int,
                    out_dir: str | Path, eval_batch_size: int = 20,
                    seed: int = 0, start_index: int = 0,
                    start_batch: int = 0,
                    progress: Callable[[int, int], None] | None = None) -> int:
    """Quota loop: batched generation with PRNGKey(seed+batch_id), 1-based
    PNG filenames (train_with_lora_per_class.py:69-88). Returns images
    written."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    total = 0
    batch_id = start_batch
    # One-batch software pipeline: dispatch batch i+1 (async under JAX)
    # BEFORE host-fetching/encoding batch i, so PNG encode+write overlaps the
    # next batch's on-device denoising instead of serializing with it.
    pending: tuple | None = None
    while total < num_images or pending is not None:
        nxt = None
        if total < num_images:
            bs = min(eval_batch_size, num_images - total)
            images = sampler_fn(bs, batch_seed_key(seed, batch_id))
            nxt = (images, bs, total)
            total += bs
            batch_id += 1
        if pending is not None:
            images, bs_p, offset = pending
            for i, img in enumerate(to_uint8(images)):  # blocks on device
                # Native libpng encode (PIL fallback). At few-step distilled
                # rates (~86 samples/s on chip) PIL's encode outruns the
                # one-batch pipeline's overlap budget; zlib level 4 keeps
                # persistent sample dirs near PIL's size at ~3x the speed.
                (out_dir / f"{start_index + offset + i + 1}.png").write_bytes(
                    encode_png_or_pil(img, level=4))
            if progress:
                progress(offset + bs_p, num_images)
        pending = nxt
    return total


def count_samples(out_dir: str | Path) -> int:
    """File-count probe for resume (train_with_lora_per_class.py:265-266)."""
    p = Path(out_dir)
    if not p.exists():
        return 0
    return sum(1 for f in p.iterdir() if f.is_file())


def top_up_samples(sampler_fn: BatchSampler, quota: int, out_dir: str | Path,
                   eval_batch_size: int = 20, seed: int = 0,
                   progress: Callable[[int, int], None] | None = None) -> int:
    """Idempotent top-up: generate only the missing tail, resuming the
    deterministic batch sequence so regenerated batches are identical. The
    partial last batch (if any) is regenerated in full to keep the
    seed↔image mapping exact."""
    existing = count_samples(out_dir)
    if existing >= quota:
        return 0
    resume_batch = existing // eval_batch_size
    resume_index = resume_batch * eval_batch_size
    return generate_to_dir(sampler_fn, quota - resume_index, out_dir,
                           eval_batch_size, seed,
                           start_index=resume_index,
                           start_batch=resume_batch, progress=progress)
