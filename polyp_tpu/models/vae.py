"""AutoencoderKL — the SD latent-space VAE.

TPU-native re-implementation of
`AutoencoderKL.from_pretrained("CompVis/stable-diffusion-v1-4", "vae")`
(train_with_lora_per_class.py:304): 3→4-channel KL autoencoder with
(128,256,512,512) blocks, single-head mid attention, GN ε=1e-6, and the
0.18215 latent scaling applied at the training call site
(train_with_lora_per_class.py:121).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from polyp_tpu.models.unet_blocks import (
    GroupNorm,
    ResnetBlock2D,
    SpatialSelfAttention,
    Downsample2D,
    Upsample2D,
)

SD_VAE_SCALING = 0.18215


class DiagonalGaussian:
    """Posterior q(z|x) from concatenated (mean, logvar) channels."""

    def __init__(self, params: jax.Array):
        mean, logvar = jnp.split(params, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(self.mean ** 2 + jnp.exp(self.logvar)
                             - 1.0 - self.logvar, axis=(1, 2, 3))


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = list(self.block_out_channels)
        h = nn.Conv(ch[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, use_time_emb=False, eps=1e-6,
                                  dtype=self.dtype, name=f"down_{i}_res_{j}")(h)
            if i < len(ch) - 1:
                # diffusers VAE Encoder downsampling pads (0,1,0,1)+VALID,
                # not the UNet's symmetric padding (see Downsample2D)
                h = Downsample2D(c, asymmetric=True, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
        h = ResnetBlock2D(ch[-1], use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_res_0")(h)
        h = SpatialSelfAttention(num_heads=1, eps=1e-6, qkv_bias=True,
                                 dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(ch[-1], use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_res_1")(h)
        h = GroupNorm(32, 1e-6, act="silu", name="conv_norm_out")(h)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32, name="conv_out")(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        ch = list(reversed(self.block_out_channels))  # (512,512,256,128)
        h = nn.Conv(ch[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock2D(ch[0], use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_res_0")(h)
        h = SpatialSelfAttention(num_heads=1, eps=1e-6, qkv_bias=True,
                                 dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(ch[0], use_time_emb=False, eps=1e-6,
                          dtype=self.dtype, name="mid_res_1")(h)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, use_time_emb=False, eps=1e-6,
                                  dtype=self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(ch) - 1:
                h = Upsample2D(c, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(32, 1e-6, act="silu", name="conv_norm_out")(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, 2,
                               self.latent_channels, self.dtype)
        self.decoder = Decoder(self.block_out_channels, 3, 3, self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=jnp.float32, name="post_quant_conv")

    def encode_moments(self, x: jax.Array) -> jax.Array:
        """Raw (mean‖logvar) channels — a plain array, safe to pass across
        jit boundaries (DiagonalGaussian is not a pytree)."""
        return self.quant_conv(self.encoder(x))

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        return DiagonalGaussian(self.encode_moments(x))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        posterior = self.encode(x)
        return self.decode(posterior.sample(key))


def tiny_vae(dtype: jnp.dtype = jnp.float32) -> AutoencoderKL:
    """Miniature VAE for tests/smoke runs (same 8× downsampling factor)."""
    return AutoencoderKL(block_out_channels=(16, 16, 32, 32), dtype=dtype)
