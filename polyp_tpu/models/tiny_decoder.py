"""Tiny latent decoder — the distilled attack on the VAE-decode Amdahl wall.

At the distilled few-step operating points the full AutoencoderKL decoder
is 42–47% of every sample (BASELINE.md round-4 few-step roofline): the
UNet scan shrank 8.5–13× while the decode — ~1.2 TFLOP of
(128,256,512,512)-channel convs mirroring
`AutoencoderKL.decode` (reference use:
train_with_lora_per_class.py:73-78, one decode per generated image) —
stayed constant. This module is the standard countermove (a TAESD-style
distilled decoder, Bohan 2023): a ~0.9M-param residual conv net at a
uniform 64 channels that maps SCALED latents (the sampler's output,
z = raw·0.18215) straight to [-1,1] images with ~40 GFLOP — ~30× fewer
FLOPs than the teacher — trained to match the full decoder's outputs
(train/distill_vae.py).

Architecture (original design, MXU-shaped: every conv is 3×3 at a fixed
64-channel width so XLA tiles one conv shape class per resolution):

    tanh(z/3)·3  — bounds latent outliers, the one TAESD trick kept
    conv 4→C                      @ h/8
    2 × ResBlock(C)               @ h/8
    3 × [nearest ×2 → conv C→C → 2 × ResBlock(C)]   @ h/4, h/2, h
    conv C→3                      @ h

ResBlock = x + conv(relu(conv(relu(x)))) — no normalization: the input
is tanh-bounded and the net is shallow, so GroupNorm would only add
bandwidth (the resource this module exists to save).
"""

from __future__ import annotations

import json
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ResBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(nn.relu(x))
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(nn.relu(h))
        return x + h


class TinyDecoder(nn.Module):
    """Scaled latents [B, h/8, w/8, 4] → images [B, h, w, 3] in ~[-1, 1]."""

    base_channels: int = 64
    latent_channels: int = 4
    out_channels: int = 3
    blocks_per_stage: int = 2
    num_upsamples: int = 3  # ×8, the SD VAE factor
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.base_channels
        # bound latent outliers (scaled SD latents are ~unit variance but
        # heavy-tailed); smooth saturation keeps the mapping trainable
        h = (jnp.tanh(z.astype(jnp.float32) / 3.0) * 3.0).astype(self.dtype)
        h = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(h)
        for j in range(self.blocks_per_stage):
            h = _ResBlock(c, self.dtype, name=f"in_block_{j}")(h)
        for i in range(self.num_upsamples):
            b, hh, ww, ch = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, ch), "nearest")
            h = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"up_{i}_conv")(h)
            for j in range(self.blocks_per_stage):
                h = _ResBlock(c, self.dtype, name=f"up_{i}_block_{j}")(h)
        # fp32 output head (matches AutoencoderKL.Decoder's fp32 conv_out)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32, name="conv_out")(h)


def tiny_decoder_for_vae(vae, base_channels: int = 64,
                         dtype: jnp.dtype = jnp.bfloat16) -> TinyDecoder:
    """A TinyDecoder matched to `vae`'s latent geometry (latent channels and
    ×8 spatial factor; the tiny test VAE shares both)."""
    return TinyDecoder(base_channels=base_channels,
                       latent_channels=vae.latent_channels, dtype=dtype)


def save_tiny_decoder(out_dir: str | Path, params, meta: dict) -> Path:
    """Persist a trained tiny decoder: `{dir}/params` (orbax pytree) +
    `{dir}/meta.json` (architecture + the measured rel-L2 vs its teacher)."""
    from polyp_tpu.utils.checkpoint import save_pytree

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    save_pytree(out_dir / "params", {"params": jax.device_get(params)})
    (out_dir / "meta.json").write_text(json.dumps(meta, indent=2))
    return out_dir


def load_tiny_decoder(out_dir: str | Path,
                      dtype: jnp.dtype = jnp.bfloat16):
    """Reload a save_tiny_decoder output → (module, params, meta)."""
    from polyp_tpu.utils.checkpoint import load_pytree

    out_dir = Path(out_dir)
    meta = json.loads((out_dir / "meta.json").read_text())
    module = TinyDecoder(base_channels=meta["base_channels"],
                         latent_channels=meta.get("latent_channels", 4),
                         blocks_per_stage=meta.get("blocks_per_stage", 2),
                         dtype=dtype)
    like = jax.eval_shape(
        lambda k: module.init(k, jnp.zeros(
            (1, 4, 4, module.latent_channels), jnp.float32)),
        jax.random.PRNGKey(0))
    params = load_pytree(out_dir / "params", like=like)["params"]
    return module, params, meta
