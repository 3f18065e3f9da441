"""CLIP text encoder (transformer) in Flax.

TPU-native equivalent of the frozen prompt encoders the reference loads —
`CLIPTextModel.from_pretrained("CompVis/stable-diffusion-v1-4",
"text_encoder")` (ViT-L/14 text tower: width 768, 12 layers, 12 heads;
train_with_lora_per_class.py:306) and `openai/clip-vit-base-patch32`
(width 512, 8 heads; train_from_scratch.py:256-258). Causal attention,
quick-GELU MLPs, learned position embeddings, final LayerNorm.

The embedding table is a named parameter (`token_embedding`) so DreamBooth's
resize-and-mask machinery (polyp_tpu.train.dreambooth) can do pytree surgery
on it — the JAX analogue of `resize_token_embeddings` + the gradient hook at
train_with_lora_per_class.py:361-398.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from polyp_tpu.ops import dot_product_attention


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_length: int = 77
    mlp_ratio: int = 4


SD14_TEXT_CONFIG = CLIPTextConfig()  # ViT-L/14 text tower
VIT_B32_TEXT_CONFIG = CLIPTextConfig(width=512, heads=8)
TINY_TEXT_CONFIG = CLIPTextConfig(vocab_size=512, width=32, layers=2, heads=2,
                                  max_length=16)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, t, c = x.shape
        head_dim = c // self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(n, t, self.heads, head_dim)
        k = k.reshape(n, t, self.heads, head_dim)
        v = v.reshape(n, t, self.heads, head_dim)
        out = dot_product_attention(q, k, v, is_causal=True)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(
            out.reshape(n, t, c))


class CLIPLayer(nn.Module):
    heads: int
    mlp_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = x + CLIPAttention(self.heads, self.dtype, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x))
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(c * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = SD14_TEXT_CONFIG
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.config
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.width), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.width), jnp.float32)
        t = input_ids.shape[1]
        x = tok[input_ids].astype(self.dtype) + pos[:t].astype(self.dtype)
        for i in range(cfg.layers):
            x = CLIPLayer(cfg.heads, cfg.mlp_ratio, self.dtype,
                          name=f"layer_{i}")(x)
        # eps 1e-5 = transformers layer_norm_eps (flax default 1e-6 costs
        # ~1e-2 output error at CLIP's small embedding variances)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="final_layer_norm")(x)
