"""Scratch-trainable pixel-space diffusion UNet.

TPU-native equivalent of the reference's from-scratch generator — diffusers
`UNet2DModel(sample_size=224, layers_per_block=2,
block_out_channels=(128,128,256,256,512,512), AttnDownBlock2D at down
position 5, AttnUpBlock2D at up position 2)` (PolypGeneratorModel.py:25-48).

Conditioning note: the reference's `--conditional_generation` path passes
`encoder_hidden_states` into `UNet2DModel` (train_from_scratch.py:97), an
argument that model does not accept — a latent crash in the reference. Here
text conditioning is a first-class option: setting `cross_attention_dim`
adds cross-attention alongside the self-attention blocks, giving the
capability the reference intended.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from polyp_tpu.models.unet_blocks import (
    Attention,
    GroupNorm,
    ResnetBlock2D,
    SpatialSelfAttention,
    TimestepEmbedding,
    Downsample2D,
    Upsample2D,
)

# The reference scratch config (PolypGeneratorModel.py:25-48)
POLYP_SCRATCH_CONFIG = dict(
    block_out_channels=(128, 128, 256, 256, 512, 512),
    down_block_types=("DownBlock2D", "DownBlock2D", "DownBlock2D",
                      "DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D",
                    "UpBlock2D", "UpBlock2D", "UpBlock2D"),
    layers_per_block=2,
)


class _MaybeCrossAttention(nn.Module):
    """Self-attention (+ optional cross-attention when conditioned)."""

    cross_attention_dim: int | None
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, context):
        x = SpatialSelfAttention(dtype=self.dtype, name="attn")(x)
        if self.cross_attention_dim is not None and context is not None:
            n, h, w, c = x.shape
            heads = max(1, c // 64)
            y = GroupNorm(32, 1e-5, name="cross_norm")(x).reshape(n, h * w, c)
            y = Attention(heads, c // heads, dtype=self.dtype,
                          name="cross_attn")(y, context)
            x = x + y.reshape(n, h, w, c)
        return x


class UNet2D(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 128, 256, 256, 512, 512)
    down_block_types: Sequence[str] = POLYP_SCRATCH_CONFIG["down_block_types"]
    up_block_types: Sequence[str] = POLYP_SCRATCH_CONFIG["up_block_types"]
    layers_per_block: int = 2
    cross_attention_dim: int | None = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        ch = list(self.block_out_channels)
        temb = TimestepEmbedding(ch[0], ch[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(timesteps)
        ctx = (encoder_hidden_states.astype(self.dtype)
               if encoder_hidden_states is not None else None)

        h = nn.Conv(ch[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        skips = [h]

        # Down path
        for i, (c_out, btype) in enumerate(zip(ch, self.down_block_types)):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c_out, dropout=self.dropout, dtype=self.dtype,
                                  name=f"down_{i}_res_{j}")(h, temb, deterministic)
                if btype == "AttnDownBlock2D":
                    h = _MaybeCrossAttention(self.cross_attention_dim, self.dtype,
                                             name=f"down_{i}_attn_{j}")(h, ctx)
                skips.append(h)
            if i < len(ch) - 1:
                h = Downsample2D(c_out, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
                skips.append(h)

        # Mid
        h = ResnetBlock2D(ch[-1], dropout=self.dropout, dtype=self.dtype,
                          name="mid_res_0")(h, temb, deterministic)
        h = _MaybeCrossAttention(self.cross_attention_dim, self.dtype,
                                 name="mid_attn")(h, ctx)
        h = ResnetBlock2D(ch[-1], dropout=self.dropout, dtype=self.dtype,
                          name="mid_res_1")(h, temb, deterministic)

        # Up path
        rev_ch = list(reversed(ch))
        for i, (c_out, btype) in enumerate(zip(rev_ch, self.up_block_types)):
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(c_out, dropout=self.dropout, dtype=self.dtype,
                                  name=f"up_{i}_res_{j}")(h, temb, deterministic)
                if btype == "AttnUpBlock2D":
                    h = _MaybeCrossAttention(self.cross_attention_dim, self.dtype,
                                             name=f"up_{i}_attn_{j}")(h, ctx)
            if i < len(rev_ch) - 1:
                # Match the next skip's spatial size (diffusers
                # forward_upsample_size) — required at non-2^k image sizes.
                h = Upsample2D(c_out, dtype=self.dtype,
                               name=f"up_{i}_upsample")(
                                   h, out_size=skips[-1].shape[1:3])

        h = GroupNorm(32, 1e-5, act="silu", name="conv_norm_out")(h)
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                      dtype=jnp.float32, name="conv_out")(h)
        return out


def tiny_scratch_unet(cross_attention_dim: int | None = None,
                      dtype: jnp.dtype = jnp.float32) -> UNet2D:
    """Miniature scratch UNet for tests/smoke runs (same block taxonomy as
    the reference architecture, 2 levels instead of 6)."""
    return UNet2D(in_channels=3, out_channels=3, block_out_channels=(16, 32),
                  down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                  up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                  layers_per_block=1, cross_attention_dim=cross_attention_dim,
                  dtype=dtype)


def polyp_scratch_unet(image_channels: int = 3,
                       cross_attention_dim: int | None = None,
                       dtype: jnp.dtype = jnp.bfloat16) -> UNet2D:
    """The reference scratch architecture, bf16 compute by default."""
    return UNet2D(in_channels=image_channels, out_channels=image_channels,
                  cross_attention_dim=cross_attention_dim, dtype=dtype,
                  **{k: v for k, v in POLYP_SCRATCH_CONFIG.items()
                     if k != "layers_per_block"},
                  layers_per_block=POLYP_SCRATCH_CONFIG["layers_per_block"])
