"""Attention dispatch: one entry point for every attention in the framework.

All UNet/VAE/CLIP attention calls route through `dot_product_attention`, so
swapping in the Pallas flash kernel (ops/flash_attention.py) is a one-line
policy change rather than a model edit. Default path is XLA's fused
attention, which is already MXU-tiled; the Pallas kernel wins at larger
latent grids (see SURVEY §7 "hard parts").
"""

from __future__ import annotations

import os
from typing import Literal

import jax

_BACKEND = os.environ.get("POLYP_ATTENTION_BACKEND", "auto")


def set_attention_backend(name: Literal["auto", "xla", "pallas"]) -> None:
    global _BACKEND
    _BACKEND = name


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          mask: jax.Array | None = None,
                          is_causal: bool = False) -> jax.Array:
    """Scaled dot-product attention over [N, T, H, D] tensors (BTHD layout,
    matching jax.nn.dot_product_attention)."""
    backend = _BACKEND
    if backend in ("auto", "pallas"):
        from polyp_tpu.ops import flash_attention as fa
        if fa.supported(q, k, v, mask, is_causal) and (
                backend == "pallas" or fa.profitable(q, k, v)):
            return fa.flash_attention(q, k, v, is_causal=is_causal)
    return jax.nn.dot_product_attention(q, k, v, mask=mask, is_causal=is_causal)
