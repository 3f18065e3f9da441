"""Text-conditional latent UNet — the SD-v1-4 denoiser architecture.

TPU-native re-implementation of the 860M-parameter
`UNet2DConditionModel.from_pretrained("CompVis/stable-diffusion-v1-4")`
(PolypGeneratorModel.py:21, train_with_lora_per_class.py:307): 4-channel
latents, block_out_channels (320,640,1280,1280), three CrossAttnDownBlock2D
+ DownBlock2D down, cross-attn mid, UpBlock2D + three CrossAttnUpBlock2D up,
8 attention heads, cross_attention_dim 768. Weight import from diffusers
checkpoints is in models/importers.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from polyp_tpu.models.unet_blocks import (
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Downsample2D,
    Upsample2D,
)

SD14_CONFIG = dict(
    in_channels=4,
    out_channels=4,
    block_out_channels=(320, 640, 1280, 1280),
    layers_per_block=2,
    cross_attention_dim=768,
    attention_num_heads=8,
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
)


class UNet2DCondition(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_num_heads: int = 8
    down_block_types: Sequence[str] = SD14_CONFIG["down_block_types"]
    up_block_types: Sequence[str] = SD14_CONFIG["up_block_types"]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        ch = list(self.block_out_channels)
        heads = self.attention_num_heads
        temb = TimestepEmbedding(ch[0], ch[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(timesteps)
        ctx = encoder_hidden_states.astype(self.dtype)

        def transformer(c, name):
            return Transformer2D(heads, c // heads, depth=1,
                                 cross_attention_dim=self.cross_attention_dim,
                                 dtype=self.dtype, name=name)

        h = nn.Conv(ch[0], (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        skips = [h]

        for i, (c_out, btype) in enumerate(zip(ch, self.down_block_types)):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c_out, dtype=self.dtype,
                                  name=f"down_{i}_res_{j}")(h, temb, deterministic)
                if btype == "CrossAttnDownBlock2D":
                    h = transformer(c_out, f"down_{i}_attn_{j}")(h, ctx)
                skips.append(h)
            if i < len(ch) - 1:
                h = Downsample2D(c_out, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
                skips.append(h)

        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_res_0")(h, temb, deterministic)
        h = transformer(ch[-1], "mid_attn")(h, ctx)
        h = ResnetBlock2D(ch[-1], dtype=self.dtype,
                          name="mid_res_1")(h, temb, deterministic)

        rev_ch = list(reversed(ch))
        for i, (c_out, btype) in enumerate(zip(rev_ch, self.up_block_types)):
            for j in range(self.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock2D(c_out, dtype=self.dtype,
                                  name=f"up_{i}_res_{j}")(h, temb, deterministic)
                if btype == "CrossAttnUpBlock2D":
                    h = transformer(c_out, f"up_{i}_attn_{j}")(h, ctx)
            if i < len(rev_ch) - 1:
                # Upsample to the next skip's spatial size (diffusers
                # forward_upsample_size) so odd sizes (e.g. 224px → 7→4 down)
                # reconcile on the way up.
                h = Upsample2D(c_out, dtype=self.dtype,
                               name=f"up_{i}_upsample")(
                                   h, out_size=skips[-1].shape[1:3])

        h = GroupNorm(32, 1e-5, act="silu", name="conv_norm_out")(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       dtype=jnp.float32, name="conv_out")(h)


def sd14_unet(dtype: jnp.dtype = jnp.bfloat16) -> UNet2DCondition:
    cfg = dict(SD14_CONFIG)
    return UNet2DCondition(dtype=dtype, **cfg)


def tiny_condition_unet(dtype: jnp.dtype = jnp.float32) -> UNet2DCondition:
    """Miniature conditional UNet for tests and smoke runs."""
    return UNet2DCondition(
        in_channels=4, out_channels=4, block_out_channels=(32, 64),
        layers_per_block=1, cross_attention_dim=32, attention_num_heads=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"), dtype=dtype)
