"""SimpleUNet — the minimal educational diffusion UNet (C20 parity).

The reference's deleted legacy stack (recoverable only from bytecode,
SURVEY §2 C20: generator_model/__pycache__/unet.cpython-38.pyc) contained a
hand-rolled `SimpleUNet`: 3 down / 2 bottleneck / 3 up conv blocks, each
with a per-block time-MLP, Tanh output. This is its TPU-native equivalent —
small enough to train in minutes, useful as a pedagogical baseline and for
fast sampler experiments; the production model is models/unet2d.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from polyp_tpu.models.unet_blocks import sinusoidal_time_embedding


class SimpleBlock(nn.Module):
    """Conv-BN-ish block with additive time embedding (legacy `Block`)."""

    features: int
    up: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(h)
        t = nn.Dense(self.features, dtype=self.dtype, name="time_mlp")(
            nn.relu(temb))
        h = h + t[:, None, None, :]
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        h = nn.relu(h)
        if self.up:
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "nearest")
            h = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, name="upconv")(h)
        else:
            h = nn.Conv(self.features, (3, 3), strides=2, padding="SAME",
                        dtype=self.dtype, name="downconv")(h)
        return h


class SimpleUNet(nn.Module):
    """3 down / 2 bottleneck / 3 up blocks, skip connections, Tanh output."""

    out_channels: int = 3
    features: Sequence[int] = (64, 128, 256)
    time_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array) -> jax.Array:
        temb = sinusoidal_time_embedding(timesteps, self.time_dim)
        temb = nn.Dense(self.time_dim, dtype=self.dtype,
                        name="time_proj")(temb.astype(self.dtype))

        h = nn.Conv(self.features[0], (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        skips = []
        for i, f in enumerate(self.features):
            skips.append(h)
            h = SimpleBlock(f, dtype=self.dtype, name=f"down_{i}")(h, temb)

        h = nn.Conv(self.features[-1], (3, 3), padding="SAME",
                    dtype=self.dtype, name="mid_conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features[-1], (3, 3), padding="SAME",
                    dtype=self.dtype, name="mid_conv2")(h)
        h = nn.relu(h)

        for i, f in enumerate(reversed(self.features)):
            h = SimpleBlock(f, up=True, dtype=self.dtype, name=f"up_{i}")(h, temb)
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)

        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=jnp.float32, name="conv_out")(h)
        return jnp.tanh(h)
